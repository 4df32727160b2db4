package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fasttext-style quality classifier — the model-based filtering rung the
  * big pipelines run above the rule gates (GPT-3 trains LR against WebText
  * as the positive class; LLaMA/RedPajama filter CCNet output the same
  * way): learn a linear model over the engine's own quality signals from
  * weak labels, then score the whole corpus.
  *
  * Spark-first split: FIT uses MLlib (driver-coordinated L-BFGS over the
  * labeled frame — the labeled set is sample-sized, not corpus-sized);
  * SCORE does NOT ship the MLlib pipeline — the fitted weights come back
  * as plain doubles and scoring is `sigmoid(w·x + b)` in pure column
  * algebra, a codegen'd scan-stage projection with no UDF, no vector
  * assembly, no per-row ML runtime. At 100 TB the corpus only ever sees
  * the cheap path.
  */
object QualityClassifier {

  /** Fitted linear model over named signal columns. */
  final case class Model(featureNames: Seq[String], weights: Array[Double],
                         intercept: Double) {
    require(featureNames.length == weights.length)
  }

  /** The signal frame both fit and score consume: [[TextQuality]] quality
    * features plus length — all plain double columns keyed by `idCol`.
    * ONE scan projection: log_chars rides in the qualityFeatures select
    * (the previous self-join on the id shuffled the whole corpus twice on
    * the 100 TB scoring path for columns one projection expresses).
    */
  def features(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextQuality.qualityFeatures(df, idCol, textCol,
      extra = Seq(log1p(length(col(textCol))).as("log_chars")))

  /** Column list [[features]] produces (order matters for the model). */
  val FeatureCols: Seq[String] =
    Seq("n_tokens", "mean_token_len", "stopword_ratio", "short_token_ratio",
      "uniq_ratio", "log_chars")

  /** Fit on a labeled signal frame (`labelCol` ∈ {0, 1}; build it from a
    * curated positive corpus unioned with raw negatives, or any boolean
    * gate). Returns plain weights — the MLlib machinery stays here.
    */
  def fit(labeled: DataFrame, labelCol: String,
          featureCols: Seq[String] = FeatureCols,
          regParam: Double = 0.0, maxIter: Int = 100): Model = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__features")
      .transform(labeled.withColumn("__label", col(labelCol).cast("double")))
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setRegParam(regParam).setMaxIter(maxIter)
    val m = lr.fit(assembled)
    Model(featureCols, m.coefficients.toArray, m.intercept)
  }

  /** `sigmoid(w·x + b)` as a Column over the signal columns — codegen'd,
    * broadcast-free, streaming-safe.
    */
  def scoreColumn(model: Model): Column = {
    val z = model.featureNames.zip(model.weights)
      .foldLeft(lit(model.intercept)) { case (acc, (f, w)) =>
        acc + col(f) * lit(w)
      }
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Score a corpus: (id, quality_score) plus the signals. */
  def score(df: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame =
    features(df, idCol, textCol)
      .withColumn("quality_score", round(scoreColumn(model), 6))

  /** End-to-end convenience: weak labels from the Gopher gate (rule-based
    * bootstrap — the usual trick when no curated positive set exists),
    * fit, and score everything.
    */
  def fitOnGopherLabels(df: DataFrame, idCol: String, textCol: String,
                        maxIter: Int = 25, fitPartitions: Int = 4,
                        maxFitRows: Long = 1L << 20): Model = {
    // the fit frame is sample-sized by CONSTRUCTION, not by caller
    // contract: corpora beyond maxFitRows are deterministically
    // hash-sampled down first (md5-prefix Bernoulli — reproducible), so
    // coalesce(fitPartitions) and the per-step treeAggregate never see a
    // corpus-sized frame no matter what the caller passes. On a bare table
    // the count is a real footer-metadata read (zero jobs) — the r5
    // df.count() here charged a full job to every fit and showed up as a
    // steady ~0.4 s regression on t_quality_clf.
    val n = graft.sources.Corpus.fastRowCount(df)
    val base = if (n > maxFitRows)
      Analyses.hashStratifiedSample(df, col(idCol), lit("all"), Map.empty,
        maxFitRows.toDouble / n)
    else df
    // signals + gopher verdict fused into one scan pipeline: the feature
    // columns ride through gopherFilter's projection as passthrough, so
    // the labeled frame is projections over a single read — the previous
    // features-JOIN-labels shape shuffled the fit corpus twice for columns
    // one pass expresses.
    val featured = TextQuality.qualityFeatures(base, idCol, textCol,
      extra = Seq(log1p(length(col(textCol))).as("log_chars"), col(textCol)))
    val labeled0 = TextQuality.gopherFilter(featured, idCol, textCol,
      passthrough = FeatureCols)
    // localCheckpoint: every L-BFGS iteration re-reads the labeled frame —
    // don't recompute the gopher gate + feature projections per step.
    // coalesce first: every L-BFGS step is one treeAggregate job over the
    // frame — at corpus parallelism that is maxIter × defaultParallelism
    // near-empty tasks of pure scheduling overhead (measured: the fit
    // dominated the query). Size fitPartitions to the fit set
    // (≈1 per few hundred k rows).
    val labeled = labeled0
      .select(col(idCol) +: FeatureCols.map(col) :+
        col("keep").cast("double").as("__weak_label"): _*)
      .coalesce(fitPartitions)
      .localCheckpoint(eager = true)
    // weak labels don't merit tight convergence: cap the iteration count
    // (each L-BFGS step is a distributed pass)
    val m = fit(labeled, "__weak_label", maxIter = maxIter)
    org.apache.spark.sql.graft.Bridge.releaseLocalCheckpoint(labeled)
    m
  }
}
