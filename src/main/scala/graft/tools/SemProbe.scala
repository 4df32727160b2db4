package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{Dedup, Similarity}
import graft.queries.Tables

/** Stage attribution for the d_semantic_dedup regression (r12 verdict #2):
  * times ivfAssign materialization, near-dup pair generation, and the CC
  * representative-keep separately, repeated, so the slow stage is named
  * rather than guessed. runMain graft.tools.SemProbe <sfDir> <reps>
  */
object SemProbe {
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
      println(f"[sem] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    (1 to reps).foreach { i =>
      println(s"--- rep $i ---")
      val emb = Tables(spark, sfDir, "embeddings").where(col("vec_id") % 2 === 0)
      val assigned = t("ivfAssign+ckpt") {
        Similarity.ivfAssign(emb, "vec_id", "embedding", 50).localCheckpoint(true)
      }
      val pairs = t("pairs") {
        Similarity.semanticNearDuplicates(emb, "vec_id", "embedding",
          0.35, 50).localCheckpoint(true)
      }
      t("cc+keep") {
        Dedup.keepClusterRepresentative(emb, "vec_id", pairs)
          .select("vec_id").count()
      }
      t("full") {
        Similarity.semanticDedup(emb, "vec_id", "embedding", 0.35, 50)
          .select("vec_id").count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
