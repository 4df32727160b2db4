package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.search.Searcher

/** A/B the two scan-tier per-phrase plans at growing battery sizes: the
  * per-phrase predicate-column shape (one token-seq scan per phrase per
  * row, a P-column aggregate) vs the set-oriented MultiPhrasesFound
  * kernel (one document walk against a first-token index, P-independent
  * plan). Batteries are 5-token corpus prefixes — every phrase really
  * occurs, the adversarial case for the kernel (candidate verifications
  * fire constantly).
  *
  * Above `PerColumnCap` phrases the per-column arm is skipped (it is
  * O(P) per row AND per plan — 32 s at P=4096; half an hour at 64k) and
  * the row records the kernel alone: flat kernel times across 4k→64k ARE
  * the P-independence evidence. Every row reports post-GC heap and the
  * battery's broadcast payload size, the two quantities that DO grow
  * with P (O(P·len) token bytes).
  *
  *   runMain graft.tools.WideBatteryProbe /root/testdata/sf0.1 128 512 2048
  */
object WideBatteryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val sizes = args.drop(1).map(_.toInt)
    val spark = Sessions.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count() // warm
    val toks = split(col("text"), " ")
    val all = d.where(size(toks) >= 5)
      .select(concat_ws(" ", slice(toks, 1, 5)).as("p"))
      .distinct().collect().map(_.getString(0)).sorted
    require(all.nonEmpty, s"$sfDir/documents.parquet yields no 5-token " +
      "prefixes — the battery builder below would loop forever")
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n >= 0); (System.nanoTime() - t0) / 1e9
    }
    // per-column shape, inlined (countPerPhrase routes >gate to the
    // kernel, so the legacy arm is reproduced here verbatim)
    def perColumn(phrases: Seq[String]): Long = {
      val preds = d.select(phrases.zipWithIndex.map { case (p, i) =>
        Searcher.phrasePredicate(col("text"), p, 0, uax29 = false)
          .cast("long").as(s"__p$i")
      }: _*)
      val aggs = phrases.indices.map(i =>
        coalesce(sum(col(s"__p$i")), lit(0L)).as(s"__p$i"))
      val row = preds.agg(aggs.head, aggs.tail: _*).collect().head
      phrases.indices.map(row.getLong).sum
    }
    def kernel(phrases: Seq[String]): Long =
      Searcher.countPerPhraseWide(d, "text", phrases, uax29 = false)
        .agg(sum("n_docs")).collect().head.getLong(0)
    val perColumnCap = 4096
    def heapMb(): Long = {
      System.gc()
      java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / (1024 * 1024)
    }
    sizes.foreach { p =>
      val battery = (Iterator.continually(all).flatten.take(p)).toSeq
        .zipWithIndex.map { case (s, i) => if (i < all.length) s else s"$s z$i" }
      val payloadMb = battery.iterator.map(_.length.toLong).sum / (1024.0 * 1024)
      // min of 3 per arm, arms interleaved so a host window hits both
      var tc = Double.MaxValue; var tk = Double.MaxValue
      var sc = -1L; var sk = 0L
      val runPerColumn = p <= perColumnCap
      for (_ <- 1 to 3) {
        if (runPerColumn) tc = math.min(tc, time { sc = perColumn(battery); sc })
        tk = math.min(tk, time { sk = kernel(battery); sk })
      }
      require(!runPerColumn || sc == sk,
        s"MISMATCH at P=$p: perColumn=$sc kernel=$sk")
      val colCell =
        if (runPerColumn) f"perColumn=$tc%6.2f s  ratio=${tc / tk}%5.2f"
        else "perColumn=  skip s  ratio=    -"
      println(f"P=$p%5d  $colCell  kernel=$tk%6.2f s  " +
        f"heap=${heapMb()}%4d MB  battery=$payloadMb%6.2f MB  (checksum $sk)")
    }
    spark.stop()
  }
}
