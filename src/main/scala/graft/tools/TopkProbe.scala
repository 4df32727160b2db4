package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.NgramOps

/** A/B probe for the topk formulations at short n (NOTES opportunity:
  * does hashing 3-grams beat shuffling their strings?):
  *   runMain graft.tools.TopkProbe [sfDir] [n] [reps]
  * Strings path = one explode + string groupBy + TakeOrdered; hashed
  * path = hash groupBy + winner join-back (two gram passes).
  */
object TopkProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[topk-probe] $tag%-10s " + ts.map(t => f"$t%6.2f").mkString(" ") +
        f"  min=${ts.min}%6.2f")
    }
    time("strings") { NgramOps.topK(docs, "text", n, 50, uax29 = false) }
    time("hashed") { NgramOps.topKHashed(docs, "text", n, 50, uax29 = false) }
    // r14: hash-first counts + exact string recovery
    // (collision/boundary fallback to the strings plan)
    time("hashExact") { NgramOps.topKHashFirst(docs, "text", n, 50, uax29 = false) }
    spark.stop()
  }
}
