package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.Similarity
import graft.queries.Tables

/** kCenterSelect large-k wall-clock probe (r12 verdict #5: k=256 at sf0.1
  * in ≤10 s — the one-job-per-point formulation took ~0.3 s/round ⇒ ~75 s).
  * runMain graft.tools.KcProbe <sfDir> <k>
  */
object KcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir, "embeddings")
    emb.count() // warm
    // job counter: the r14 loaded-host sample spread was per-job
    // scheduling floor × batch count, so the record must show the JOB
    // count alongside the wall
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    (1 to 3).foreach { rep =>
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = Similarity.kCenterSelect(emb, "vec_id", "embedding", k).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[kc] rep $rep k=$k selected=$n wall=$wall%6.2f s jobs=${jobs.get() - j0}")
    }
    spark.stop()
  }
}
