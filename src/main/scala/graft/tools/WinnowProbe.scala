package graft
import org.apache.spark.sql.{SparkSession, functions => F}

/** Perf probe for the winnowing pipeline at sf0.1. NB: guard against
  * column pruning when timing — `df.count()` on a projection prunes the
  * fingerprint computation entirely and times an empty scan; aggregate
  * over `size(fps)` (or explode) to force evaluation.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    import graft.operators.TextQuality
    import org.apache.spark.sql.functions._
    time("warm count")(docs.count())
    time("fingerprints (forced)")(
      TextQuality.winnowFingerprintCounts(docs, "doc_id", "text", 3, 4)
        .agg(F.sum("n_fingerprints")).head().getLong(0))
    time("overlap pairs full")(
      TextQuality.winnowOverlapPairs(docs, "doc_id", "text", 3, 4, 2).count())
    time("overlap pairs again")(
      TextQuality.winnowOverlapPairs(docs, "doc_id", "text", 3, 4, 2).count())
    spark.stop()
  }
}
