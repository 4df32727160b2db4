package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query shuffle/input byte accounting from real task metrics — the
  * "measure, don't guess" companion to [[ExplainAudit]]'s structural checks.
  * A query whose shuffle bytes rival its input bytes is restructuring the
  * corpus; at 100 TB that is the first number to fix.
  *
  *   sbt "runMain graft.tools.ShuffleAudit [sfDir] [query ...]"
  */
object ShuffleAudit {

  private final class Acc extends SparkListener {
    val inputBytes = new LongAdder
    val shuffleRead = new LongAdder
    val shuffleWrite = new LongAdder
    val spill = new LongAdder
    val tasks = new LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        inputBytes.add(m.inputMetrics.bytesRead)
        shuffleRead.add(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
        spill.add(m.diskBytesSpilled)
        tasks.increment()
      }
    }
    def reset(): Unit = Seq(inputBytes, shuffleRead, shuffleWrite, spill, tasks)
      .foreach(_.reset())
  }

  private def mb(x: Long): String = f"${x / 1048576.0}%9.2f"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("a6_topk_3gram", "a7_botk_2gram", "a8_unique_ngrams",
        "d_minhash_neardup", "d_cc_clusters", "j2_keep_first",
        "j4_overlap_pairs", "q3_join", "p4_psl_full", "ann_topk_cosine",
        "w_tumble_hour", "e3_per_phrase", "d_dup_spans", "d_span_removal",
        "d_semantic_dedup", "t_unigram_lm", "a14_ngram_contamination",
        "t_gopher_filter")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    println(f"${"query"}%-22s ${"input MB"}%9s ${"shufW MB"}%9s ${"shufR MB"}%9s ${"spill MB"}%9s ${"tasks"}%6s  ratio")
    names.foreach { n =>
      acc.reset()
      SparkEntry.queries(n)(spark, sfDir).count()
      // listener events drain asynchronously after the action returns
      org.apache.spark.graft.ListenerDrain.drain(spark.sparkContext)
      val in = acc.inputBytes.sum(); val w = acc.shuffleWrite.sum()
      val ratio = if (in > 0) f"${w.toDouble / in}%.3f" else "-"
      println(f"$n%-22s ${mb(in)} ${mb(w)} ${mb(acc.shuffleRead.sum())} ${mb(acc.spill.sum())} ${acc.tasks.sum()}%6d  $ratio")
    }
    spark.stop()
  }
}
