package graft
import org.apache.spark.sql.{SparkSession, functions => F}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.UrlOps
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    time("warm")(docs.count())
    val query = when(col("doc_id") % 3 === 0, "?utm_source=feed&b=2&a=1")
      .when(col("doc_id") % 3 === 1, "?a=1&gclid=CjX12&b=2&fbclid=IwAB3").otherwise("")
    val messy = docs.withColumn("url",
      concat(when(col("doc_id") % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
        when(col("doc_id") % 3 === 0, "www.").otherwise(""),
        lit("h"), (col("doc_id") % 10).cast("string"), lit(".example.com"),
        when(col("doc_id") % 5 === 0, ":443").otherwise(""),
        lit("/p/"), (col("doc_id") % 250).cast("string"),
        when(col("doc_id") % 2 === 0, "/").otherwise(""), query,
        when(col("doc_id") % 7 === 0, "#sec2?x=9").otherwise("")))
      .repartition(32)
    // stored-column case: url materialized first (as at 100 TB)
    val stored = messy.select("doc_id", "url").localCheckpoint()
    // scale it up 40x to get a per-row cost signal: 200k rows
    val big = stored.crossJoin(spark.range(40)).select(col("url")).repartition(32).localCheckpoint()
    time("big count")(big.count())
    time("canonical on stored 200k")(big
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .agg(F.sum(length(col("c")))).head().getLong(0))
    spark.stop()
  }
}
