package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.QualityClassifier.Model

/** P8 model path: the reference scores documents — or each sentence —
  * with a trained linear profanity classifier
  * (wimbd/profanity/map_count.py:28-38, alt-profanity-check), with the
  * word-list taxonomy as the other rung. This is that model rung built
  * from the engine's own pieces: taxonomy matches provide WEAK LABELS,
  * logistic regression learns to weight per-list hit densities (plus
  * length), and scoring is `sigmoid(w·x + b)` in pure column algebra —
  * the [[QualityClassifier]] split, so the corpus never sees an ML
  * runtime, only a codegen'd scan projection.
  *
  * Sentence mode mirrors the reference's per-sentence loop:
  * [[graft.functions.TextFunctions.sentenceSplit]] + the same features
  * per sentence + max-pooling per document — a long document whose single
  * sentence is profane is flagged even though doc-level hit density
  * dilutes to noise (ProfanityModelSpec pins exactly that).
  */
object ProfanityModel {

  /** Model feature order: one density per taxonomy label, then length. */
  def featureCols(lists: Map[String, Seq[String]]): Seq[String] =
    lists.keys.toSeq.sorted.map(l => s"density_$l") :+ "log_tokens"

  private def regexOf(words: Seq[String]): String =
    words.map(java.util.regex.Pattern.quote).mkString("\\b(", "|", ")\\b")

  /** Per-unit signals: taxonomy hit density per label + log token count. */
  def features(unit: Column, lists: Map[String, Seq[String]]): Seq[(String, Column)] = {
    val n = size(split(unit, " "))
    val denom = greatest(n, lit(1)).cast("double")
    lists.toSeq.sortBy(_._1).map { case (label, words) =>
      s"density_$label" ->
        (regexp_count(unit, lit(regexOf(words))).cast("double") / denom)
    } :+ ("log_tokens" -> log1p(n.cast("double")))
  }

  /** (id, features...) frame over an arbitrary unit column (doc text or an
    * exploded sentence). The per-label regex cascade is heavy per-row CPU
    * (|labels| regexes/doc), so fan a small single-file scan across cores
    * first — a no-op on real multi-split corpora.
    */
  def featureFrame(df: DataFrame, idCol: String, unit: Column,
                   lists: Map[String, Seq[String]]): DataFrame =
    graft.Par.fanOut(df)
      .select(col(idCol) +: features(unit, lists).map { case (n, c) => c.as(n) }: _*)

  /** Fit LR on taxonomy weak labels (label = any list hit). The fit frame
    * is sample-sized by construction: corpora beyond `maxFitRows` are
    * deterministically hash-sampled down first (md5-prefix Bernoulli), so
    * the coalesce and every L-BFGS pass are bounded regardless of corpus
    * size.
    */
  def fitOnTaxonomy(df: DataFrame, idCol: String, textCol: String,
                    lists: Map[String, Seq[String]],
                    regParam: Double = 0.1, maxIter: Int = 25,
                    maxFitRows: Long = 1L << 20, fitPartitions: Int = 4): Model = {
    // footer-metadata read on a bare table — no job charged to the fit
    val n = graft.sources.Corpus.fastRowCount(df)
    val base = if (n > maxFitRows)
      Analyses.hashStratifiedSample(df, col(idCol), lit("all"), Map.empty,
        maxFitRows.toDouble / n)
    else df
    val dens = featureFrame(base, idCol, col(textCol), lists)
    val densCols = lists.keys.toSeq.sorted.map(l => col(s"density_$l"))
    // localCheckpoint so L-BFGS passes don't recompute the regex cascade
    val labeled = dens.withColumn("__weak",
        when(densCols.reduce(_ + _) > lit(0.0), lit(1.0)).otherwise(lit(0.0)))
      .coalesce(fitPartitions).localCheckpoint(eager = true)
    val m = QualityClassifier.fit(labeled, "__weak", featureCols(lists),
      regParam = regParam, maxIter = maxIter)
    org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(labeled)
    m
  }

  /** Doc-granularity scores: (id, profanity_score). */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
                lists: Map[String, Seq[String]], model: Model): DataFrame =
    featureFrame(df, idCol, col(textCol), lists)
      .withColumn("profanity_score", round(QualityClassifier.scoreColumn(model), 6))
      .select(idCol, "profanity_score")

  /** Sentence mode: score every sentence, max-pool per document —
    * (id, max_sentence_score, n_sentences). One scan; only the sentence
    * string explodes, and the agg keys on the id.
    */
  def scoreSentences(df: DataFrame, idCol: String, textCol: String,
                     lists: Map[String, Seq[String]], model: Model): DataFrame = {
    val sents = df.select(col(idCol),
      explode(TextFunctions.sentenceSplit(col(textCol))).as("__sentence"))
    featureFrame(sents, idCol, col("__sentence"), lists)
      .withColumn("__score", QualityClassifier.scoreColumn(model))
      .groupBy(idCol)
      .agg(round(max("__score"), 6).as("max_sentence_score"),
        count(lit(1)).as("n_sentences"))
  }
}
