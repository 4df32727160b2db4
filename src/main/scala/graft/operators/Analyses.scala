package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Python mapper algebra (SURVEY §2.2) minus URL ops: PII, profanity
  * taxonomy, lexicon sentiment, language, lengths, dates, sampling. Each is
  * scan → narrow projection → group-by; nothing touches the driver.
  */
object Analyses {

  // P7 regexes (reference wimbd/pii/map_count.py:123-127).
  val EmailRe = "[.\\s@,?!;:)(]*([^\\s@]+@[^\\s@,?!;:)(]+?)[.\\s@,?!;:)(]?[\\s\\n\\r]"
  val PhoneRe = "\\s+\\(?(\\d{3})\\)?[-\\. ]*(\\d{3})[-. ]?(\\d{4})"
  val IpRe = "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"

  /** P7: occurrences per PII type. `patterns` defaults to simplified,
    * SQL-portable shapes; pass the reference regexes above for parity runs.
    * (Context-window post-filters of the reference are in [[piiContextual]].)
    */
  def piiCounts(df: DataFrame, textCol: String,
                patterns: Map[String, String] = PiiPatterns): DataFrame = {
    // one corpus pass for all PII types (see NgramOps.searchRegex)
    val ordered = patterns.toSeq.sortBy(_._1)
    val aggs = ordered.zipWithIndex.map { case ((_, re), i) =>
      coalesce(sum(regexp_count(col(textCol), lit(re))), lit(0L)).cast("long").as(s"m$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(ordered.zipWithIndex.map { case ((t, _), i) =>
        struct(lit(t).as("pii_type"), col(s"m$i").as("occurrences"))
      }: _*)).as("pm"))
      .select(col("pm.pii_type").as("pii_type"), col("pm.occurrences").as("occurrences"))
  }

  /** P7 with the reference's junk-doc guard (len > 500000 or repeated-punct
    * templates; reference wimbd/pii/map_count.py:136-144).
    */
  def piiCountsGuarded(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val junk = length(t) > 500000 ||
      t.rlike("([\\.\\-#_\\*~=\\+]{2,}\\s*){20,}")
    piiCounts(df.where(!coalesce(junk, lit(false))), textCol)
  }

  /** PII REDACTION transform — the pipeline-native sibling of P7's
    * counting: replace every PII match with a typed sentinel (`<|email|>`
    * etc.) and keep per-type match counts as the audit trail. One
    * codegen'd projection: the counts read the original text, the
    * replacement cascade applies in sorted-type order (sentinels contain
    * no digits/@, so later patterns can't match inside earlier
    * replacements). Patterns default to the same SQL-portable shapes as
    * [[piiCounts]] so the DuckDB oracle replays the cascade verbatim.
    */
  /** The SQL-portable PII shapes shared by [[piiCounts]] and [[piiRedact]]. */
  val PiiPatterns: Map[String, String] = Map(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\d{3}[-. ]\\d{3}[-. ]\\d{4}",
    "ip" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  def piiRedact(df: DataFrame, idCol: String, textCol: String,
                patterns: Map[String, String] = PiiPatterns): DataFrame = {
    val ordered = patterns.toSeq.sortBy(_._1)
    val counts = ordered.map { case (t, re) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$t")
    }
    val redacted = ordered.foldLeft(col(textCol)) { case (c, (t, re)) =>
      regexp_replace(c, re, s"<|$t|>")
    }
    df.select(col(idCol) +: counts :+ redacted.as("text_redacted"): _*)
  }

  /** P8 taxonomy path: multi-label word-list matching (reference
    * wimbd/profanity/map_count.py:41-67) — one `rlike` per label over a
    * broadcast-inlined word list, exploded so a doc can carry several labels.
    */
  def taxonomyLabels(df: DataFrame, textCol: String,
                     lists: Map[String, Seq[String]]): DataFrame = {
    val labels = lists.toSeq.sortBy(_._1).map { case (label, words) =>
      val re = words.map(java.util.regex.Pattern.quote).mkString("\\b(", "|", ")\\b")
      when(col(textCol).rlike(re), lit(label))
    }
    df.select(explode(filter(array(labels: _*), _.isNotNull)).as("label"))
      .groupBy("label").agg(count(lit(1)).as("n_docs"))
  }

  /** P9 shape: doc-granularity valence sentiment per group (reference
    * wimbd/sentiment_coocurrence/map_count.py:17-40 uses TextBlob; the
    * engine ships the lexicon INSIDE a [[graft.functions.expressions
    * .ValencePolarity]] scan projection — no explode, no join, the only
    * shuffle is the final per-group partial agg). Polarity per doc is the
    * TextBlob contract: mean modified valence over assessed tokens
    * (intensifier + negation handling), 0.0 when no token is assessed.
    */
  def lexiconSentiment(df: DataFrame, textCol: String, groupCol: String,
                       lexicon: Map[String, Double],
                       boosters: Map[String, Double] = Valence.boosters,
                       negators: Seq[String] = Valence.negators): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val pol = graft.functions.TextFunctions
      .valencePolarity(toks, lexicon, boosters, negators).getItem(1)
    df.select(col(groupCol), pol.as("polarity"))
      .groupBy(groupCol)
      .agg(round(avg("polarity"), 6).as("avg_polarity"), count(lit(1)).as("n_docs"))
  }

  /** P9, reference shape (wimbd/sentiment_coocurrence/map_count.py:17-40):
    * sentencize, score polarity PER SENTENCE, and accumulate by
    * term-membership — for each query term, how many pos/neg/neu sentences
    * mention it. Doc-granularity [[lexiconSentiment]] stays as the cheap
    * aggregate; this is the co-occurrence card the reference actually
    * produces (TextBlob polarity becomes a lexicon mean; punkt becomes
    * [[graft.functions.TextFunctions.sentenceSplit]]).
    *
    * Scale shape: one scan; sentences explode ~10× rows but only the
    * sentence string is carried, terms are an inlined literal array, and
    * the lexicon/booster/negator tables ship inside the codegen'd
    * [[graft.functions.expressions.ValencePolarity]] projection (TextBlob
    * contract: mean modified valence over ASSESSED tokens, with
    * intensifier and negation handling) — the only shuffle is the final
    * (term, label) partial agg.
    */
  def sentenceSentiment(df: DataFrame, textCol: String, terms: Seq[String],
                        lexicon: Map[String, Double],
                        boosters: Map[String, Double] = Valence.boosters,
                        negators: Seq[String] = Valence.negators,
                        posThr: Double = 0.05,
                        negThr: Double = -0.05): DataFrame = {
    val sents = df.select(
      explode(graft.functions.TextFunctions.sentenceSplit(col(textCol))).as("sentence"))
    val toks = filter(split(regexp_replace(col("sentence"), "[.!?]", ""), " "),
      t => length(t) > 0)
    val labeled = sents.withColumn("toks", toks)
      .where(size(col("toks")) > 0)
      .withColumn("polarity",
        graft.functions.TextFunctions
          .valencePolarity(col("toks"), lexicon, boosters, negators).getItem(1))
      // threshold the ROUNDED polarity: a sentence can land exactly on
      // ±0.05 up to accumulation order ((0.9 − 1.0)/2 is the canonical
      // case), and the raw-double comparison then labels it by fp
      // noise — found as a single-sentence divergence vs the DuckDB
      // replay at sf0.1. Six decimals is far above double noise and far
      // below any meaningful polarity difference.
      .withColumn("__p6", round(col("polarity"), 6))
      .withColumn("label",
        when(col("__p6") > posThr, lit("pos"))
          .when(col("__p6") < negThr, lit("neg"))
          .otherwise(lit("neu")))
    labeled.select(col("label"), col("polarity"),
        explode(filter(array(terms.sorted.map(lit): _*),
          t => array_contains(col("toks"), t))).as("term"))
      .groupBy("term", "label")
      .agg(count(lit(1)).as("n_sentences"),
        round(avg("polarity"), 6).as("avg_polarity"))
  }

  /** P6-style language ID without a model: score = stopword hit-rate per
    * language profile, argmax wins, `un` when nothing clears `minHits`.
    * Pure column algebra (array_intersect against inlined profiles) so it
    * stays inside codegen; real corpora would swap in bigger profiles.
    */
  def langIdHeuristic(text: Column,
                      profiles: Map[String, Seq[String]] = LangProfiles.default,
                      minHits: Int = 1): Column = {
    val toks = array_distinct(split(lower(text), " "))
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, stops) =>
      struct(size(array_intersect(toks, array(stops.map(lit): _*))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") >= minHits, best.getField("lang")).otherwise(lit("un"))
  }

  /** P6: detected-language histogram. */
  def langIdCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(langIdHeuristic(col(textCol)).as("lang"))
      .groupBy("lang").agg(count(lit(1)).as("cnt"))

  /** P12: per-group length distribution (reference
    * wimbd/sentence_lengths/summarize.py:7-40).
    */
  def lengthDistribution(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val counts = df.select(col(groupCol), size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .groupBy(groupCol, "n_tokens").agg(count(lit(1)).as("cnt"))
    counts.withColumn("p",
      round(col("cnt") / sum("cnt").over(Window.partitionBy(groupCol)), 6))
  }

  /** P11: dump docs whose length sits on an anomalous spike
    * (reference wimbd/sentence_lengths/map_unique_lengths.py:7-55).
    */
  def anomalousLengths(df: DataFrame, textCol: String, idCol: String,
                       spikes: Seq[Int]): DataFrame =
    df.select(col(idCol), size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .where(col("n_tokens").isin(spikes.map(_.toLong): _*))

  /** P14 made reproducible: hash-Bernoulli sample — keep a row iff the
    * first byte of md5(key) falls below ceil(256·fraction). Unlike
    * `rand(seed)` this is stable across engines, partitionings and reruns.
    * (reference wimbd/random_sample/map_count.py:18 uses `random() < p`.)
    */
  def hashSample(df: DataFrame, key: Column, hexCeil: String): DataFrame =
    df.where(substring(md5(key.cast("string")), 1, hexCeil.length) < lit(hexCeil))

  /** Deterministic stratified sampling — the data-mixing primitive: each
    * stratum keeps rows whose 8-hex md5 prefix falls below
    * `floor(fraction × 16^8)`, so a mixture spec like
    * `Map("src1" -> 0.5, "src2" -> 0.1)` reproduces exactly on reruns and
    * on any engine (no `rand()`). Strata absent from the map keep
    * `defaultFraction`. One scan, no shuffle.
    */
  def hashStratifiedSample(df: DataFrame, key: Column, stratum: Column,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 0.0): DataFrame = {
    def ceilOf(f: Double): Long = math.round(f * (1L << 32)).min(1L << 32)
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    val ceilCol = fractions.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0L))) { case (acc, (s, f)) =>
        acc.when(stratum === s, lit(ceilOf(f)))
      }.otherwise(lit(ceilOf(defaultFraction)))
    df.where(bucket < ceilCol)
  }

  /** Exact token-length quantiles — the percentile view of P10/P12's
    * histograms (pipeline length cutoffs are usually specified as "drop
    * below p1 / above p99"). Spark's `percentile` is an exact sort-based
    * aggregate with linear interpolation (same contract as DuckDB
    * quantile_cont / numpy linear); the aggregation state is the value
    * multiset, so at 100 TB prefer `approx_percentile` with an accuracy
    * knob — this exact form is for oracle-checkable cutoff derivation.
    */
  def lengthQuantiles(df: DataFrame, textCol: String,
                      qs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9, 0.99)): DataFrame =
    df.select(size(split(col(textCol), " ")).cast("double").as("n"))
      .agg(percentile(col("n"), typedLit(qs)).as("p"))
      .select(posexplode(col("p")).as(Seq("i", "v")))
      .select(element_at(typedLit(qs), col("i") + 1).as("q"),
        round(col("v"), 6).as("value"))
      .orderBy("q")

  /** Data-mixing planner: given target mixture WEIGHTS per source and a
    * total token budget, derive what each source can contribute and the
    * deterministic per-source sampling fraction that realizes the mixture —
    * the DoReMi/Pile-style "mixture spec → sampling plan" step in front of
    * [[hashStratifiedSample]]. Per source: available tokens, target tokens
    * (= weight × budget), and `fraction = min(1, target/available)`
    * (sources too small to meet their target are taken whole — upweighting
    * by repetition is a policy decision left to the caller).
    *
    * One scan + one tiny per-source aggregate; the plan is O(|sources|).
    */
  def mixturePlan(df: DataFrame, stratum: Column, textCol: String,
                  weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    val wCol = weights.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0.0))) { case (acc, (s, w)) =>
        acc.when(col("source") === s, lit(w))
      }.otherwise(lit(0.0))
    df.select(stratum.as("source"),
        size(split(col(textCol), " ")).cast("long").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("available_tokens"))
      .withColumn("target_tokens",
        round(wCol * tokenBudget).cast("long"))
      .withColumn("fraction",
        round(least(lit(1.0), col("target_tokens") / col("available_tokens")), 6))
  }

  /** Execute a [[mixturePlan]]: collect the (O(|sources|)) plan to the
    * driver and stratified-sample with its fractions — rerun-reproducible
    * end-to-end. Sources with weight 0 are dropped.
    */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column, textCol: String,
                    weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    val plan = mixturePlan(df, stratum, textCol, weights, tokenBudget)
      .select("source", "fraction").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    hashStratifiedSample(df, key, stratum, plan, defaultFraction = 0.0)
  }

  /** Execute a mixture WITH up-weighting — the policy [[mixtureSample]]
    * leaves to the caller and [[temperatureMixture]] surfaces as `epochs`:
    * a source whose token target exceeds its availability REPEATS, ⌊f⌋
    * full epochs per doc plus a remainder epoch kept by the
    * [[hashStratifiedSample]] md5-bucket rule (f = target/available,
    * uncapped; deterministic across engines, partitionings and reruns).
    * Output rows carry a 0-based `epoch` column so downstream exact-dedup
    * can tell intentional repeats from true duplicates. Plan shape: the
    * O(|sources|) plan aggregate collected to the driver, a scan-pushed
    * source filter, then ONE narrow per-row explode (×⌈f⌉) — no shuffle;
    * output volume is governed by the token budget, not the corpus size.
    * The remainder keep-test compares the integer md5 bucket against
    * frac(f)·2³² in DOUBLE — both factors exact IEEE doubles, so an SQL
    * replay of the same arithmetic selects identical rows.
    */
  def mixtureUpsample(df: DataFrame, key: Column, stratum: Column, textCol: String,
                      weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    val plan = df.select(stratum.as("source"),
        size(split(col(textCol), " ")).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("available_tokens"))
      .collect().flatMap { r =>
        val available = if (r.isNullAt(1)) 0L else r.getLong(1)
        val target = math.round(weights.getOrElse(r.getString(0), 0.0) * tokenBudget)
        if (available > 0L && target > 0L)
          Some(r.getString(0) -> target.toDouble / available)
        else None
      }.toMap
    def perSource[T](v: Double => T, zero: T): Column =
      plan.toSeq.sortBy(_._1)
        .foldLeft(when(lit(false), lit(zero))) { case (acc, (s, f)) =>
          acc.when(stratum === s, lit(v(f)))
        }.otherwise(lit(zero))
    val full = perSource(f => math.floor(f).toLong, 0L)
    val remThresh = perSource(f => (f - math.floor(f)) * 4294967296.0, 0.0)
    val bucket = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double")
    df.where(stratum.isin(plan.keys.toSeq.sorted: _*))
      .withColumn("epoch", explode(sequence(lit(0L), full)))
      .where(col("epoch") < full || bucket < remThresh)
  }

  /** Temperature-scaled mixture weighting (the multilingual/Pile recipe:
    * sampling probability ∝ available_tokens^alpha, alpha ∈ (0,1] — alpha=1
    * is proportional, alpha→0 is uniform): per source, the smoothed
    * probability, token target under `tokenBudget`, the deterministic
    * sampling fraction realizing it, and `epochs` (>1 means the source must
    * repeat to meet its target — surfaced, not silently clamped). Feed the
    * fractions to [[hashStratifiedSample]]. O(|sources|) aggregate; the
    * window runs over the per-source frame, not the corpus.
    */
  def temperatureMixture(df: DataFrame, stratum: Column, textCol: String,
                         alpha: Double, tokenBudget: Long): DataFrame = {
    val perSource = df.select(stratum.as("source"),
        size(split(col(textCol), " ")).cast("long").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("t").as("available_tokens"))
    perSource
      .withColumn("p", round(
        pow(col("available_tokens").cast("double"), lit(alpha)) /
          sum(pow(col("available_tokens").cast("double"), lit(alpha)))
            .over(Window.partitionBy()), 6))
      .withColumn("target_tokens", round(col("p") * tokenBudget).cast("long"))
      .withColumn("fraction",
        round(least(lit(1.0), col("target_tokens") / col("available_tokens")), 6))
      .withColumn("epochs",
        round(col("target_tokens") / col("available_tokens"), 4))
  }

  /** Whitespace unigrams + bigrams of `text` — DSIR's hashed feature space. */
  private def dsirGrams(text: Column): Column = {
    val t = split(text, " ")
    val bi = transform(sequence(lit(1), size(t) - 1),
      i => concat(element_at(t, i), lit(" "), element_at(t, i + 1)))
    concat(t, when(size(t) > 1, bi).otherwise(array()))
  }

  /** Portable gram → bucket hash (md5 8-hex prefix mod `buckets`) — the
    * same engine-agnostic trick as [[hashSample]], so the DuckDB oracle can
    * replay it bit-for-bit. The hot paths below evaluate the identical
    * contract through the [[graft.functions.expressions.DsirKernel]] JVM
    * kernel (one MessageDigest per thread, no interpreted HOF fold); this
    * column form remains the executable spec the kernel is tested against.
    */
  private def dsirBucket(g: Column, buckets: Int): Column =
    conv(substring(md5(g), 1, 8), 16, 10).cast("long") % buckets

  /** Gram-bucket stream of a text column (unigrams then bigrams) via the
    * JVM kernel — `array<long>`, bit-identical to mapping [[dsirBucket]]
    * over [[dsirGrams]].
    */
  private def dsirBucketsCol(text: Column, buckets: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.expressions.DsirBuckets(
        org.apache.spark.sql.graft.Bridge.expression(split(text, " ")), buckets))

  /** DSIR step 1 (Xie et al. 2023, arXiv:2302.03169): per-bucket
    * log-importance ratios of hashed n-gram features, target corpus vs raw.
    * Two narrow scans ending in a `buckets`-cell aggregate; the result is
    * O(buckets) and meant to be collected and inlined (see [[dsirWeights]]).
    * Laplace smoothing keeps empty buckets finite.
    */
  def dsirLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
                    buckets: Int, smoothing: Double = 1.0): Array[Double] = {
    def bucketCounts(df: DataFrame): Map[Long, Long] =
      df.select(explode(dsirBucketsCol(col(textCol), buckets)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = bucketCounts(target)
    val cr = bucketCounts(raw)
    val tt = ct.values.sum.toDouble + smoothing * buckets
    val tr = cr.values.sum.toDouble + smoothing * buckets
    Array.tabulate(buckets) { b =>
      math.log((ct.getOrElse(b.toLong, 0L) + smoothing) / tt) -
        math.log((cr.getOrElse(b.toLong, 0L) + smoothing) / tr)
    }
  }

  /** [[dsirLogRatios]] when the target is a subset of the raw corpus
    * selected by a predicate (the common case: "docs like Wikipedia",
    * "docs in English"): ONE scan computes both bucket histograms — per
    * bucket, the raw count and the predicate-conditional count — instead
    * of two passes over the corpus. At 100 TB this halves the prep cost;
    * the shuffle is `buckets` cells either way.
    */
  def dsirLogRatiosWhere(corpus: DataFrame, targetPred: Column, textCol: String,
                         buckets: Int, smoothing: Double = 1.0): Array[Double] = {
    val rows = corpus
      .select(targetPred.as("t"), explode(dsirBucketsCol(col(textCol), buckets)).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("cr"), sum(when(col("t"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val cr = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val tr = cr.values.sum.toDouble + smoothing * buckets
    val tt = ct.values.sum.toDouble + smoothing * buckets
    Array.tabulate(buckets) { b =>
      math.log((ct.getOrElse(b.toLong, 0L) + smoothing) / tt) -
        math.log((cr.getOrElse(b.toLong, 0L) + smoothing) / tr)
    }
  }

  /** DSIR step 2: per-document importance log-weight = Σ over gram
    * occurrences of the bucket's log ratio. The ratio table (O(buckets)
    * doubles) is inlined as an array literal and indexed inside an
    * `aggregate` fold over the gram array — a pure per-row projection:
    * ZERO shuffle, no join, stays in whole-stage codegen. At 100 TB this
    * is scan-speed; the alternative (explode + join + re-group on doc id)
    * would shuffle every gram in the corpus.
    */
  def dsirWeights(df: DataFrame, textCol: String, logRatios: Array[Double],
                  weightCol: String = "dsir_weight"): DataFrame =
    df.withColumn(weightCol,
      org.apache.spark.sql.graft.Bridge.column(
        graft.functions.expressions.DsirWeightInline(
          org.apache.spark.sql.graft.Bridge.expression(split(col(textCol), " ")),
          logRatios.toSeq)))

  /** DSIR step 3: Gumbel-top-k resampling, derandomized — the Gumbel noise
    * comes from the doc key's own md5 (u = (bucket+0.5)/2^32,
    * g = -ln(-ln u)), so the selected set is identical on reruns and across
    * engines. One `TakeOrderedAndProject`, no full sort.
    */
  def dsirSelect(df: DataFrame, key: Column, k: Int,
                 weightCol: String = "dsir_weight"): DataFrame = {
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") + 0.5) /
      math.pow(2.0, 32)
    val gumbel = -log(-log(u))
    df.withColumn("__score", col(weightCol) + gumbel)
      .orderBy(desc("__score"), key)
      .limit(k)
      .drop("__score")
  }

  /** Exactly-k-per-group deterministic sample — "show me k examples from
    * every domain / language / source" (the eyeballing surface every
    * corpus triage starts from; P14's Bernoulli keeps a FRACTION, this
    * keeps a COUNT). Rank = row_number over md5(key) within the group, so
    * the picked set is uniform-ish, rerun-stable and engine-portable.
    *
    * The rank window partitions by group — each group sorts only its own
    * rows; no global order. For pathological single-group skew at 100 TB,
    * pre-filter with [[hashSample]] at a generous fraction first and rank
    * the survivors.
    */
  def samplePerGroup(df: DataFrame, group: Column, key: Column, k: Int): DataFrame =
    df.withColumn("__rank", row_number().over(
        Window.partitionBy(group).orderBy(md5(key.cast("string")), key)))
      .where(col("__rank") <= k)
      .drop("__rank")

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis via the
    * Gumbel-top-k equivalence), derandomized: the per-row key is
    * ln(weight) + Gumbel(u) with u derived from the row key's own md5, so
    * the selected set is identical on reruns and across engines. The
    * quality-weighted / length-weighted corpus subsampling primitive
    * ("sample 10M docs ∝ quality score") next to [[hashSample]]'s uniform
    * Bernoulli and [[dsirSelect]]'s importance-weight selection (which is
    * this with weight already in log space).
    *
    * One TakeOrderedAndProject — k rows per partition pre-selected
    * map-side, no global sort. Rows with weight ≤ 0 are dropped (ln
    * undefined), matching the "zero weight never sampled" contract.
    */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    val u = (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("double") + 0.5) /
      math.pow(2.0, 32)
    df.where(weight > 0)
      .withColumn("__es_score", log(weight.cast("double")) - log(-log(u)))
      .orderBy(desc("__es_score"), key)
      .limit(k)
      .drop("__es_score")
  }

  /** Per-document script mix — fractions of non-whitespace characters in
    * the major unicode script ranges (Latin, digits, Cyrillic, CJK,
    * Arabic). The cheap companion signal to [[langIdHeuristic]]: script
    * fractions catch what stopword profiles can't (mixed-script spam,
    * mojibake, wrong-script content in a "monolingual" corpus) and cost
    * one codegen'd regex projection — no shuffle, streaming-safe.
    * Explicit codepoint ranges, not \\p{Script=...} classes, so the same
    * predicate evaluates identically in any regex engine (the oracle
    * builds the ranges with chr()). Denominator counts UTF-16 units, so
    * astral chars (emoji) weigh 2 — none of the five tracked ranges is
    * astral, so the script fractions themselves are exact and only the
    * residual ("other") share absorbs the bias.
    */
  def scriptFractions(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nonspace = length(regexp_replace(col(textCol), "\\s", ""))
    def frac(pat: String) =
      round(regexp_count(col(textCol), lit(pat)) /
        greatest(nonspace, lit(1)).cast("double"), 6)
    df.select(col(idCol), nonspace.cast("long").as("n_chars"),
      frac("[A-Za-z]").as("latin_frac"),
      frac("[0-9]").as("digit_frac"),
      frac("[\\u0400-\\u04FF]").as("cyrillic_frac"),
      frac("[\\u4E00-\\u9FFF]").as("cjk_frac"),
      frac("[\\u0600-\\u06FF]").as("arabic_frac"))
  }

  /** Distinctive terms of a corpus slice vs the rest — log-odds-ratio with
    * an informative Dirichlet prior (Monroe et al. 2008, "Fightin' Words"),
    * the statistically-sane version of "what words characterize English
    * docs / src10 / this month's crawl": δ(w) = logit of w in A minus
    * logit in B under +α smoothing, z = δ/√(1/(ca+α) + 1/(cb+α)); raw
    * frequency ratios over-rank rare words, the variance term fixes that.
    * Returns the top-k most A-distinctive (`side = 'a'`) and most
    * B-distinctive (`side = 'b'`) terms.
    *
    * Scale shape: ONE token-scale scan tags each token with the predicate
    * and aggregates per term; totals are a broadcast single-row agg; the
    * z-scored frame is VOCABULARY-sized and localCheckpointed because both
    * the top-k and bottom-k consume it (no subtree reuse across the two
    * TakeOrderedAndProject jobs — re-deriving would re-scan the corpus).
    */
  def distinctiveTerms(docs: DataFrame, groupPred: Column, textCol: String,
                       k: Int, alpha: Double = 0.5): DataFrame = {
    val counts = graft.Par.fanOut(docs)
      .select(groupPred.as("p"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(
        sum(when(col("p"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("p"), 0L).otherwise(1L)).as("cb"))
    val tot = counts.agg(sum("ca").cast("double").as("ta"),
      sum("cb").cast("double").as("tb"), count(lit(1)).cast("double").as("v"))
    def logit(c: Column, t: Column): Column = {
      val num = c + lit(alpha)
      log(num / (t + lit(alpha) * col("v") - num))
    }
    val z = (logit(col("ca"), col("ta")) - logit(col("cb"), col("tb"))) /
      sqrt(lit(1.0) / (col("ca") + lit(alpha)) + lit(1.0) / (col("cb") + lit(alpha)))
    val scored = counts.crossJoin(broadcast(tot))
      .select(col("w"), col("ca"), col("cb"), round(z, 6).as("z"))
      .localCheckpoint()
    val top = scored.orderBy(desc("z"), asc("w")).limit(k).withColumn("side", lit("a"))
    val bot = scored.orderBy(asc("z"), asc("w")).limit(k).withColumn("side", lit("b"))
    top.unionAll(bot)
  }

  /** P13: utterance dates — year histogram over the first present date key
    * (reference wimbd/utterance_dates/map_count.py:8-35).
    */
  def yearCounts(df: DataFrame, dateCols: Seq[String]): DataFrame =
    df.select(year(coalesce(dateCols.map(col): _*)).cast("long").as("year"))
      .where(col("year").isNotNull)
      .groupBy("year").agg(count(lit(1)).as("cnt"))
}

object LangProfiles {
  /** Tiny stopword profiles — enough to demo the operator shape. */
  val default: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "ich"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "et", "que"))
}
