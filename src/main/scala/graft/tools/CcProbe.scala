package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head: driver union-find vs distributed min-propagation on the
  * SAME materialized near-dup pair set (isolates CC cost from the LSH
  * pipeline feeding it). runMain graft.tools.CcProbe <sfDir> <reps>
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.operators.MinHash.nearDuplicates(docs, "doc_id", "text",
      threshold = 0.5, 5, 8, 4, graft.operators.MinHash.md5Strategy)
      .localCheckpoint(true)
    println(s"pairs: ${pairs.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); val n = f; val t = (System.nanoTime() - t0) / 1e9
        (t, n)
      }
      println(f"$tag%-12s ${ts.map(_._1).map(t => f"$t%.3f").mkString(" ")} min=${ts.map(_._1).min}%.3f rows=${ts.head._2}")
    }
    time("local") {
      graft.operators.Dedup.connectedComponents(pairs).orderBy("id").count()
    }
    time("distributed") {
      graft.operators.Dedup.connectedComponents(pairs, maxLocalEdges = 0L)
        .orderBy("id").count()
    }
    spark.stop()
  }
}
