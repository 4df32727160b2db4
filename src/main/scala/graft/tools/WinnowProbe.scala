import org.apache.spark.sql.{SparkSession, functions => F}
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    import graft.operators.TextQuality
    time("warm count")(docs.count())
    time("counts op")(
      TextQuality.winnowFingerprintCounts(docs, "doc_id", "text", 3, 4).count())
    time("overlap pairs full")(
      TextQuality.winnowOverlapPairs(docs, "doc_id", "text", 3, 4, 2).count())
    time("overlap pairs again")(
      TextQuality.winnowOverlapPairs(docs, "doc_id", "text", 3, 4, 2).count())
    spark.stop()
  }
}
