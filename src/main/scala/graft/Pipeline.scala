package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Analyses, Dedup, Similarity, TextQuality}

/** Curated facade for the pretraining-data pipeline surface that extends
  * the reference toolkit ([[Wimbd]] covers the reference's own three
  * surfaces 1:1). Methods are thin delegations to the operator objects,
  * which carry the scale notes; this object exists so the end-to-end
  * corpus-preparation flow reads as one API:
  *
  * {{{
  * val clean = Pipeline.gopherGate(docs, "doc_id", "text")        // quality
  * val noDup = Pipeline.dedupNearMinhash(clean, "doc_id", "text") // near-dup
  * val noEval = Pipeline.decontaminate(noDup, bench)              // leakage
  * val mixed  = Pipeline.mix(noEval, weights, tokenBudget)        // mixture
  * }}}
  */
object Pipeline {

  // ---- quality gates ----

  /** Gopher §A1.1 gate: returns only the documents passing every rule. */
  def gopherGate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      TextQuality.gopherFilter(docs, idCol, textCol)
        .where(col("keep")).select(col(idCol).as("__keep_id")),
      docs(idCol) === col("__keep_id"), "left_semi")

  /** Unigram-LM scoring under a model trained on `lmCorpus` (or the corpus
    * itself) — threshold `avg_logp` downstream like a KenLM perplexity.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              lmCorpus: Option[DataFrame] = None): DataFrame =
    TextQuality.unigramLogProb(docs, idCol, textCol,
      lmCorpus.map(TextQuality.unigramCounts(_, textCol)))

  // ---- deduplication ladder (cheapest first) ----

  /** Exact full-text dedup, keep-first in (order) scan order. */
  def dedupExact(docs: DataFrame, textCol: String, order: Seq[Column]): DataFrame =
    Dedup.keepFirst(docs, md5(col(textCol)), order)

  /** MinHash+LSH near-dup dedup: cluster candidates verified by exact
    * Jaccard, keep the minimum-id representative per cluster.
    */
  def dedupNearMinhash(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.8): DataFrame =
    Dedup.keepClusterRepresentative(docs, idCol,
      operators.MinHash.nearDuplicates(docs, idCol, textCol, threshold))

  /** SemDeDup over an embedding column; raise `tables` for recall on
    * structure-poor embeddings (see tools.SemRecall).
    */
  def dedupSemantic(docs: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, centroidStep: Int,
                    tables: Int = 1): DataFrame =
    Similarity.semanticDedup(docs, idCol, vecCol, threshold, centroidStep, tables)

  /** Substring-level dedup: rewrite documents dropping every duplicated
    * k-token span occurrence after the first.
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 50): DataFrame =
    Dedup.removeDuplicateSpans(docs, idCol, textCol, k)

  // ---- decontamination ----

  /** Exact anti-join decontamination against a benchmark corpus. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
                    textCol: String = "text"): DataFrame =
    Dedup.decontaminate(docs, md5(col(textCol)), benchmark, md5(col(textCol)))

  /** Bloom-filter decontamination for beyond-broadcast blocklists. */
  def decontaminateApprox(docs: DataFrame, benchmark: DataFrame,
                          expectedItems: Long, fpp: Double = 0.01,
                          textCol: String = "text"): DataFrame =
    Dedup.decontaminateApprox(docs, md5(col(textCol)),
      benchmark, md5(col(textCol)), expectedItems, fpp)

  /** Span-level contamination report of eval docs against training data. */
  def contaminationReport(train: DataFrame, test: DataFrame, idCol: String,
                          textCol: String = "text", n: Int = 8): DataFrame =
    Dedup.ngramContamination(train, textCol, test, idCol, textCol, n)

  // ---- mixing ----

  /** Deterministic mixture: plan per-source fractions for a token budget
    * and sample them (rerun-reproducible).
    */
  def mix(docs: DataFrame, idCol: String, sourceCol: String, textCol: String,
          weights: Map[String, Double], tokenBudget: Long): DataFrame =
    Analyses.mixtureSample(docs, col(idCol), col(sourceCol), textCol,
      weights, tokenBudget)
}
