package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Analyses, Dedup, MinHash, NgramOps, TextQuality}
import graft.sources.Corpus

/** End-to-end pretraining-data curation pipeline over a real corpus — the
  * composed "switch from the reference" story: ingest → exact dedup →
  * quality + language filter → fuzzy (MinHash/LSH) dedup → corpus stats →
  * sharded JSONL.gz out. Every stage is a DataFrame transform from this
  * library; at 100 TB the same code runs with more shards and executors.
  *
  *   sbt "runMain graft.tools.PipelineDemo [inPath] [outDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val in = args.headOption.getOrElse(
      "/root/reference/test_fixtures/c4-sample.00000-of-00001.json.gz")
    val out = args.drop(1).headOption.getOrElse("/tmp/graft_pipeline_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.Sessions.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def stage(name: String, n: Long): Unit = println(f"PIPELINE $name%-28s $n%8d docs")

    // 1. ingest with the canonical schema + a stable doc id
    val raw = Corpus.withFileLineId(Corpus.readJsonl(spark, Seq(in)), "doc_id")
      .where(col("text").isNotNull)
    stage("ingested", raw.count())

    // 2. exact dedup: keep the first doc per content hash
    val exact = Dedup.keepFirst(raw, md5(col("text")), Seq(col("doc_id")))
    stage("after exact dedup", exact.count())

    // 3. quality + language gate (heuristic scoring, no model calls)
    val scored = TextQuality.qualityScore(
      TextQuality.qualityFeatures(exact, "doc_id", "text"))
      .select(col("doc_id").as("q_id"), col("quality"))
    val lang = exact.withColumn("lang", Analyses.langIdHeuristic(col("text")))
    val kept = lang.join(scored, lang("doc_id") === scored("q_id"))
      .where(col("quality") >= 0.3 && col("lang") === "en")
      .drop("q_id", "quality", "lang")
    stage("after quality+lang gate", kept.count())

    // 4. fuzzy dedup: cluster near-duplicate pairs (connected components)
    // and keep one representative per cluster — pairwise drop-the-higher-id
    // over-deletes on chains A~B~C where A~C don't pair directly
    val nearDups = MinHash.nearDuplicates(kept, "doc_id", "text",
      threshold = 0.8, w = 5, k = 16, bands = 8, uax29 = true)
    val deduped = Dedup.keepClusterRepresentative(kept, "doc_id", nearDups)
    stage("after fuzzy dedup", deduped.count())

    // 5. substring dedup: rewrite docs dropping 50-token spans whose
    // content already occurred earlier in the corpus
    val spanned = Dedup.removeDuplicateSpans(deduped, "doc_id", "text",
        k = 50, uax29 = true)
      .where(col("n_tokens_kept") > 0)
    stage("after span rewrite", spanned.count())
    val rewritten = deduped.drop("text")
      .join(spanned.select(col("doc_id"), col("text_dedup").as("text")), "doc_id")

    // 6. decontaminate against a tiny in-line "benchmark" (first 5 docs
    // replayed as eval data — demonstrates the anti-join shape), then the
    // fuzzy pass: the same docs with a token prepended slip past exact
    // hashing but not the cross-corpus MinHash match
    val bench = rewritten.orderBy("doc_id").limit(5).select("text")
    val decon = Dedup.decontaminate(rewritten, md5(col("text")),
      bench, md5(col("text")))
    stage("after decontamination", decon.count())
    val benchFuzz = decon.orderBy("doc_id").limit(5)
      .select(col("doc_id").as("bid"),
        concat(lit("leaked: "), col("text")).as("btext"))
    val deconFuzzy = Dedup.decontaminateFuzzy(decon, benchFuzz, "doc_id", "bid",
      "text", "btext", threshold = 0.5, uax29 = true)
    stage("after fuzzy decontam", deconFuzzy.count())

    // 7. corpus stats + the report card on the survivors
    val stats = NgramOps.stats(deconFuzzy, "text").collect().head
    println(s"PIPELINE stats $stats")
    graft.Pipeline.corpusReport(deconFuzzy, "text").collect()
      .foreach(r => println(f"PIPELINE report ${r.getString(0)}%-24s ${r.getDouble(1)}%.3f"))
    val decon2 = deconFuzzy

    // 8. sharded JSONL.gz out
    Corpus.writeJsonl(Corpus.shard(decon2.select("doc_id", "text", "url"), 4),
      out, force = true)
    println(s"PIPELINE wrote $out")
    spark.stop()
  }
}
