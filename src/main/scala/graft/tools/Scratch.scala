package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.Corpus

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", false)
      .config("spark.ui.enabled", false)
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Corpus.readJsonl(spark,
        Seq("/root/reference/test_fixtures/c4-sample.00000-of-00001.json.gz"))
      .crossJoin(spark.range(32).select(col("id").as("copy")))
      .select(col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println("docs " + docs.count())

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("tokenize uax29 warm") {
      docs.select(sum(size(TextFunctions.tokenize(col("text"))))).collect()
    }
    time("tokenize uax29") {
      docs.select(sum(size(TextFunctions.tokenize(col("text"))))).collect()
    }
    time("split-space") {
      docs.select(sum(size(split(col("text"), " ")))).collect()
    }
    time("tokenize+ngrams3 size") {
      docs.select(sum(size(TextFunctions.ngrams(
        TextFunctions.tokenize(col("text")), 3)))).collect()
    }
    time("full topk explode+group") {
      graft.operators.NgramOps.topK(docs, "text", 3, 20).collect()
    }
    spark.stop()
  }
}
