package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall of SemDeDup's IVF-bucketed pair generation against the exhaustive
  * cosine pair set — the blocking trade quantified (companion to
  * [[RecallProbe]]'s IVF query-recall measurement).
  *
  *   sbt "runMain graft.tools.SemRecall [sfDir] [threshold] [step]"
  */
object SemRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.35)
    val step = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.cosineNearDuplicates(emb, "vec_id", "embedding", threshold))
    Seq(1, 2, 4).foreach { t =>
      val got = pairs(Similarity.semanticNearDuplicates(emb, "vec_id", "embedding",
        threshold, step, tables = t))
      val recall = if (truth.isEmpty) 1.0 else (truth intersect got).size.toDouble / truth.size
      println(f"SEMRECALL threshold=$threshold step=$step tables=$t truth=${truth.size} bucketed=${got.size} recall=$recall%.4f")
    }
    spark.stop()
  }
}
