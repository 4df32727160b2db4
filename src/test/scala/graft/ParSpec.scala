package graft

import org.apache.spark.sql.DataFrame

/** `Par.fanOut` decision tests: the stats-based small/large call must
  * match the old (correct but expensive) `.rdd.getNumPartitions` probe on
  * every bench table, single-file gzip inputs must still fan out even
  * when their byte size estimates "large", and unknown-size frames must
  * never overflow into a spurious repartition.
  */
class ParSpec extends SparkTestBase {

  private def withMaxPartitionBytes[T](bytes: Long)(f: => T): T = {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try f finally spark.conf.set(key, old)
  }

  private def oldDecisionRepartitions(df: DataFrame): Boolean =
    df.rdd.getNumPartitions * 2 < spark.sparkContext.defaultParallelism

  private def newDecisionRepartitions(df: DataFrame): Boolean =
    !(Par.fanOut(df) eq df)

  test("stats-based decision matches the getNumPartitions probe on every bench table") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
      assert(newDecisionRepartitions(df) === oldDecisionRepartitions(df),
        s"decision parity broke on $t (default maxPartitionBytes)")
    }
    // and with a tiny split size, where splittable parquet planes out wide
    withMaxPartitionBytes(1024) {
      for (t <- Seq("lineitem", "documents")) {
        val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        assert(newDecisionRepartitions(df) === oldDecisionRepartitions(df),
          s"decision parity broke on $t (1 KiB maxPartitionBytes)")
      }
    }
  }

  test("single gzip jsonl file fans out even when bytes estimate large") {
    val dir = java.nio.file.Files.createTempDirectory("par-gz").toString
    val df0 = spark.range(2000).selectExpr("cast(id as string) as text")
    df0.coalesce(1).write.mode("overwrite").option("compression", "gzip").json(dir)
    val df = spark.read.json(dir)
    // shrink the split size so sizeInBytes/maxPartitionBytes says "many
    // splits" — the byte heuristic alone would skip the repartition, but
    // a gzip file is one split however many bytes it holds
    withMaxPartitionBytes(64) {
      assert(df.rdd.getNumPartitions === 1, "fixture must be a single gzip split")
      assert(newDecisionRepartitions(df),
        "unsplittable single-file input must fan out")
    }
  }

  test("unknown-size frame with tiny maxPartitionBytes stays a no-op (no overflow)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // LogicalRDD leaf ⇒ sizeInBytes = defaultSizeInBytes (Long.Max):
    // treat-as-large must survive division by a 1-byte split size
    val rdd = spark.sparkContext.parallelize(Seq(Row("x")), 2)
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("text", StringType))))
    withMaxPartitionBytes(1) {
      assert(!newDecisionRepartitions(df), "unknown size must be treated as large")
    }
  }
}
