package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions._

/** Stage-isolation probe for removeRepeatedSentences' two shapes:
  * times (a) the gather pipeline with no checkpoint (r14 shape), (b) the
  * checkpoint-then-gather pipeline (r13 shape), and (c) the rebuild scan
  * alone, so a regression attributes to ONE stage instead of the whole
  * query. runMain graft.tools.SentProbe [sfDir] [reps]
  */
object SentProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text",
        regexp_replace(col("text"), "([^ ]+( [^ ]+){6}) ", "$1. "))
    docs.count()
    def sents = graft.functions.TextFunctions.sentenceSplit(col("text"))
    def clean(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body
        val t = (System.nanoTime() - t0) / 1e9
        // cleanup AFTER the elapsed capture (the Bench.timeOne contract):
        // charging block release to the interval inflates exactly the
        // checkpointed variant this probe exists to compare against
        clean()
        t
      }
      println(f"$label%-28s ${ts.map(t => f"$t%6.2f").mkString(" ")}  min=${ts.min}%6.2f")
    }
    time("gather_r14_noCkpt") {
      graft.operators.Dedup.gatherSortedLongs(
        graft.operators.Dedup.repeatedSentenceHashes(docs, "doc_id", "text", 1L), 1 << 22)
    }
    time("gather_r13_ckpt") {
      val ex = graft.Par.fanOut(docs)
        .select(col("doc_id").as("__id"),
          posexplode(sents).as(Seq("__idx", "__s")))
        .select(col("__id"), col("__idx"), xxhash64(col("__s")).as("__h"))
        .localCheckpoint(eager = false)
      val repeated = ex.groupBy("__h")
        .agg(count_distinct(col("__id")).as("__df"))
        .where(col("__df") > 1L).select("__h")
      graft.operators.Dedup.gatherSortedLongs(repeated, 1 << 22)
      org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(ex)
    }
    time("rebuild_only") {
      // fixed tiny hash set: isolates the rebuild projection cost
      val bc = spark.sparkContext.broadcast(Array(1L, 2L, 3L))
      def probe(x: org.apache.spark.sql.Column) =
        org.apache.spark.sql.graft.Bridge.column(
          graft.functions.expressions.LongSetContains(
            org.apache.spark.sql.graft.Bridge.expression(xxhash64(x)), bc))
      val kept = filter(sents, s => !probe(s))
      docs.select(col("doc_id"),
        concat_ws(" ", kept).as("text_clean"),
        coalesce(size(sents), lit(0)).cast("long").as("n_sentences"),
        coalesce(size(kept), lit(0)).cast("long").as("n_sentences_kept"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
