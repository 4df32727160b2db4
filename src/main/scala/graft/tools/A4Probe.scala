package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.NgramOps
import graft.queries.Tables

/** Stage attribution for a4_sketch_contract's remaining cost (r13): times
  * each materialized piece separately. runMain graft.tools.A4Probe <sfDir> <reps>
  */
object A4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[a4] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to reps).foreach { i =>
      println(s"--- rep $i ---")
      val d = Tables(spark, sfDir, "documents")
      val exact = t("exact ckpt") {
        graft.Par.fanOut(d)
          .select(explode(graft.functions.TextFunctions.ngrams(
            split(col("text"), " "), 2)).as("ngram"))
          .groupBy("ngram").agg(count(lit(1)).as("exact_cnt"))
          .localCheckpoint()
      }
      t("cms from counts") {
        NgramOps.topKApproxFromCounts(exact, "ngram", "exact_cnt",
          k = 20, width = 1 << 15).collect()
      }
      t("uniq1 ckpt") {
        graft.Par.fanOut(d)
          .select(explode(graft.functions.TextFunctions.ngrams(
            NgramOps.tokens(col("text"), uax29 = false), 1)).as("ngram"))
          .distinct().localCheckpoint()
      }
      val bench = d.where(col("doc_id") % 20 === 0)
      t("benchHashes ckpt") {
        bench.select(md5(col("text")).as("__bh")).distinct().localCheckpoint()
      }
      t("keptApprox ckpt") {
        graft.operators.Dedup.decontaminateApprox(
          d, md5(col("text")), bench, md5(col("text")),
          expectedItems = 1000L, fpp = 0.001)
          .select(col("doc_id"), md5(col("text")).as("__h")).localCheckpoint()
      }
      t("keptExact ckpt") {
        graft.operators.Dedup.decontaminate(
          d, md5(col("text")), bench, md5(col("text")))
          .select("doc_id").localCheckpoint()
      }
      t("full query") {
        graft.SparkEntry.queries("a4_sketch_contract")(spark, sfDir).count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
