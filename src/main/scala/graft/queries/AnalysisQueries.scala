package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Analyses

/** Python mapper analyses (SURVEY §2.2 P6-P9, P11-P14). PII text is
  * synthesized deterministically (the corpus has none) so the extraction
  * regexes exercise real matches on both sides.
  */
object AnalysisQueries extends QueryPack {

  private def withPii(df: DataFrame): DataFrame =
    df.withColumn("text2", concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .when(col("doc_id") % 7 === 1, lit(" call 555-123-4567"))
        .when(col("doc_id") % 7 === 2,
          concat(lit(" from 10.0."), (col("doc_id") % 200).cast("string"), lit(".15")))
        .otherwise(lit(""))))

  private val piiCte =
    """WITH u AS (SELECT *, text ||
      | (CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |   WHEN doc_id % 7 = 1 THEN ' call 555-123-4567'
      |   WHEN doc_id % 7 = 2 THEN ' from 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.15'
      |   ELSE '' END) AS text2
      | FROM documents)""".stripMargin

  private val taxonomy = Map(
    "speed" -> Seq("fast", "slow"),
    "data_ops" -> Seq("merge", "join"),
    "absent" -> Seq("qqqqq"))

  private val lexicon = Map(
    "fast" -> 1.0, "slow" -> -1.0, "big" -> 0.5, "small" -> -0.5,
    "dup" -> -0.8, "spark" -> 0.9)

  // corpus-adapted modifier tables: the fixture vocabulary is a closed
  // ~30-word set with no English intensifiers/negators, so the driver
  // queries designate frequent corpus words as boosters ("key" amplifies,
  // "line" dampens) and negators ("the"/"a") — every ValencePolarity
  // branch (distance-1/2 boosters, 3-token negation window, clamping)
  // fires thousands of times on the word salad. The ENGLISH tables
  // (operators.Valence) are the library defaults, hand-score-verified in
  // SentimentSpec.
  private val boosters = Map("key" -> 1.4, "line" -> 0.6)
  private val negators = Seq("the", "a")

  private def sqlDoubleValues(m: Map[String, Double]): String =
    m.toSeq.sortBy(_._1)
      .map { case (w, v) => s"('$w', CAST($v AS DOUBLE))" }.mkString(", ")
  private def sqlNegList: String =
    negators.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The ValencePolarity modifier algebra as SQL, over a token table
    * `tok(<keys>, i, w)` (1-based positions): nearest preceding booster
    * (distance 1 full, distance 2 decayed by 0.95), negator within the 3
    * preceding tokens → ×-0.5, clamp to [-1, 1] — byte-for-byte the
    * kernel's arithmetic, so hash compare holds.
    */
  private def valenceScoreCtes(keys: String): String = {
    val on = keys.split(",").map(_.trim)
      .map(k => s"p%s.$k = t.$k").mkString(" AND ")
    s"""hit AS (SELECT ${keys.split(",").map("t." + _.trim).mkString(", ")}, lex.v,
       |   p1.w AS w1, p2.w AS w2, p3.w AS w3
       | FROM tok t JOIN lex ON lex.word = t.w
       | LEFT JOIN tok p1 ON ${on.replace("p%s", "p1")} AND p1.i = t.i - 1
       | LEFT JOIN tok p2 ON ${on.replace("p%s", "p2")} AND p2.i = t.i - 2
       | LEFT JOIN tok p3 ON ${on.replace("p%s", "p3")} AND p3.i = t.i - 3),
       |sc AS (SELECT $keys,
       |   greatest(CAST(-1.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
       |     v * (CASE WHEN b1.m IS NOT NULL THEN b1.m
       |               WHEN b2.m IS NOT NULL THEN 1 + (b2.m - 1) * 0.95
       |               ELSE 1 END)
       |       * (CASE WHEN w1 IN $sqlNegList OR w2 IN $sqlNegList
       |               OR w3 IN $sqlNegList THEN CAST(-0.5 AS DOUBLE)
       |               ELSE 1 END))) AS s
       | FROM hit LEFT JOIN boost b1 ON b1.word = hit.w1
       |          LEFT JOIN boost b2 ON b2.word = hit.w2)""".stripMargin
  }

  private val spikes = Seq(30, 40, 50)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p7_pii" -> ((s, dir) =>
      Analyses.piiCounts(withPii(Tables(s, dir, "documents")), "text2")
        .orderBy("pii_type")),

    // the REDACTION transform over the same synthesized PII: sentinels in,
    // per-type counts as the audit trail
    "p21_pii_redact" -> ((s, dir) =>
      Analyses.piiRedact(withPii(Tables(s, dir, "documents")), "doc_id", "text2")
        .orderBy("doc_id")),

    "p8_taxonomy" -> ((s, dir) =>
      Analyses.taxonomyLabels(Tables(s, dir, "documents"), "text", taxonomy)
        .orderBy("label")),

    // P8 model path (rows-only, like t_quality_clf: L-BFGS weights are not
    // SQL-expressible): LR on taxonomy weak labels, doc score + per-sentence
    // max score side by side — ProfanityModelSpec pins the sentence-local
    // flagging behavior the doc granularity cannot see
    "p8_model" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "([^ ]+( [^ ]+){6}) ", "$1. ").as("text2"))
      val m = graft.operators.ProfanityModel.fitOnTaxonomy(d, "doc_id", "text2", taxonomy)
      graft.operators.ProfanityModel.scoreDocs(d, "doc_id", "text2", taxonomy, m)
        .join(graft.operators.ProfanityModel.scoreSentences(d, "doc_id", "text2", taxonomy, m),
          Seq("doc_id"))
        .orderBy("doc_id")
    }),

    "p9_sentiment" -> ((s, dir) =>
      Analyses.lexiconSentiment(Tables(s, dir, "documents"), "text", "lang",
          lexicon, boosters, negators)
        .orderBy("lang")),

    // P9 reference shape: sentencize (sentence structure synthesized — the
    // fixture has no punctuation — by closing every 7th token group), score
    // polarity per SENTENCE, accumulate by term membership
    "p9_sentence" -> ((s, dir) =>
      Analyses.sentenceSentiment(
        Tables(s, dir, "documents").select(
          regexp_replace(col("text"), "([^ ]+( [^ ]+){6}) ", "$1. ").as("text2")),
        "text2", Seq("spark", "data", "slow", "fast"), lexicon,
        boosters, negators)
        .orderBy("term", "label")),

    "p6_lang_counts" -> ((s, dir) =>
      Tables(s, dir, "documents").groupBy("lang").agg(count(lit(1)).as("cnt"))
        .orderBy("lang")),

    // P6 model path: Cavnar–Trenkle char-ngram classifier trained on the
    // embedded seeds, scored as a zero-shuffle scan projection; output is
    // the (label, prediction) confusion card. The oracle replays BOTH the
    // training and the classification in SQL from the same seed strings.
    "p6_lang_model" -> ((s, dir) =>
      graft.operators.LangId.confusion(Tables(s, dir, "documents"), "text",
        "lang", graft.operators.LangId.ctProfiles())
        .orderBy("lang", "pred")),

    "p11_anomalous_lengths" -> ((s, dir) =>
      Analyses.anomalousLengths(Tables(s, dir, "documents"), "text", "doc_id", spikes)
        .orderBy("doc_id")),

    "p12_length_dist" -> ((s, dir) =>
      Analyses.lengthDistribution(Tables(s, dir, "documents"), "text", "lang")
        .orderBy("lang", "n_tokens")),

    "p14_sample" -> ((s, dir) =>
      Analyses.hashSample(Tables(s, dir, "documents"), col("doc_id"), "20")
        .select("doc_id", "lang").orderBy("doc_id")),

    // deterministic mixture sampling: per-source keep fractions, md5-bucketed
    "p15_stratified" -> ((s, dir) =>
      Analyses.hashStratifiedSample(Tables(s, dir, "documents"), col("doc_id"),
          col("source"),
          fractions = Map("src10" -> 0.5, "src11" -> 0.25, "src12" -> 1.0),
          defaultFraction = 0.05)
        .groupBy("source").agg(count(lit(1)).as("cnt"))
        .orderBy("source")),

    // mixture spec → sampling plan: per-source availability, token targets
    // and the deterministic fraction that realizes the mixture
    "p16_mixture_plan" -> ((s, dir) =>
      Analyses.mixturePlan(Tables(s, dir, "documents"), col("source"), "text",
        weights = Map("src10" -> 0.6, "src11" -> 0.3, "src12" -> 0.1),
        tokenBudget = 10000L).orderBy("source")),

    // exact token-length percentiles (the "drop below p1 / above p99"
    // cutoff derivation next to the p10/p12 histograms)
    "p17_length_quantiles" -> ((s, dir) =>
      Analyses.lengthQuantiles(Tables(s, dir, "documents"), "text")),

    // script-mix fractions over deterministically multi-scripted docs
    // (Cyrillic / CJK / Arabic snippets appended by doc_id class; \uXXXX
    // escapes here, chr(n) in the oracle — never raw unicode in both)
    "t_script_mix" -> ((s, dir) => {
      val snippet = when(col("doc_id") % 4 === 0,
          lit(" \u0410\u0411\u0412 \u0433\u0434"))
        .when(col("doc_id") % 4 === 1, lit(" \u6F22\u5B57"))
        .when(col("doc_id") % 4 === 2, lit(" \u0627\u0628\u062C 42"))
        .otherwise(lit(""))
      val d = Tables(s, dir, "documents").withColumn("text2", concat(col("text"), snippet))
      Analyses.scriptFractions(d, "doc_id", "text2").orderBy("doc_id")
    }),

    // distinctive terms of the English slice vs the rest: Monroe et al.
    // log-odds with Dirichlet prior, top/bottom 15 by z
    "a18_distinctive_terms" -> ((s, dir) =>
      Analyses.distinctiveTerms(Tables(s, dir, "documents"),
        col("lang") === "en", "text", k = 15).orderBy("side", "w")),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis via
    // derandomized Gumbel keys): 30 docs ∝ token count
    "p22_weighted_sample" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      Analyses.weightedSample(d, col("doc_id"), col("n_tokens"), k = 30)
        .select("doc_id", "n_tokens").orderBy("doc_id")
    }),

    // exactly-3-per-source deterministic sample (the eyeballing surface)
    "p23_sample_per_group" -> ((s, dir) =>
      Analyses.samplePerGroup(Tables(s, dir, "documents"), col("source"),
        col("doc_id"), k = 3)
        .select("source", "doc_id").orderBy("source", "doc_id")),

    // mixture execution WITH up-weighting: targets above availability
    // repeat the source (full epochs + md5-bucket remainder epoch);
    // rolled up per (source, epoch) so the whole expansion is checked
    "p24_mixture_upsample" -> ((s, dir) =>
      Analyses.mixtureUpsample(Tables(s, dir, "documents"), col("doc_id"),
          col("source"), "text",
          weights = Map("src10" -> 0.7, "src11" -> 0.3), tokenBudget = 60000L)
        .groupBy("source", "epoch")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
        .orderBy("source", "epoch")),

    // temperature-scaled mixture (sampling prob ∝ tokens^alpha): the
    // multilingual-corpus balancing recipe next to p16's explicit weights
    "p20_temp_mixture" -> ((s, dir) =>
      Analyses.temperatureMixture(Tables(s, dir, "documents"), col("source"),
        "text", alpha = 0.5, tokenBudget = 10000L).orderBy("source")),

    // DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    // buckets, target = English docs, raw = whole corpus; per-doc
    // log-importance weight and the derandomized Gumbel-top-k selection
    "t_dsir" -> ((s, dir) => {
      // repartition: the sf parquet is one file → one split, but the
      // gram-hash fold is CPU-bound (interpreted HOF + md5/gram) — spread
      // it the way a real multi-file corpus would be
      val docs = Tables(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism)
      val ratios = Analyses.dsirLogRatiosWhere(
        docs, col("lang") === "en", "text", buckets = 256)
      Analyses.dsirSelect(Analyses.dsirWeights(docs, "text", ratios), col("doc_id"), 25)
        .select(col("doc_id"), round(col("dsir_weight"), 4).as("dsir_weight"))
        .orderBy("doc_id")
    }),

    // HTML → text extraction over deterministically htmlized docs: tag /
    // script / comment stripping, entity decode, whitespace collapse
    "t_html_strip" -> ((s, dir) => {
      val html = Tables(s, dir, "documents").withColumn("html",
        concat(lit("<html><head><style>p{color:red}</style></head><body><!-- hdr --><p>"),
          col("text"), lit("</p>"),
          when(col("doc_id") % 3 === 0,
            lit("<script type=\"text/javascript\">var x = 1 < 2;</script>"))
            .otherwise(lit("")),
          lit("<p>&amp; &lt;raw&gt;&nbsp;done</p></body></html>")))
      graft.operators.TextQuality.htmlToText(html, "doc_id", "html")
        .orderBy("doc_id")
    }),

    // Unicode repair over deterministically-mangled docs: NFD accents,
    // CRLF, NBSP/em-space, zero-width chars, BOM, a control char
    "t_normalize" -> ((s, dir) => {
      val messy = Tables(s, dir, "documents").withColumn("raw",
        concat(
          when(col("doc_id") % 4 === 0, lit("Cafe\u0301 ")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0,
            lit("\r\nline\u00A0two\u200B!")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            lit("\u0007\u2003end\uFEFF")).otherwise(lit(""))))
      graft.operators.TextQuality.normalizeDocs(messy, "doc_id", "raw")
        .orderBy("doc_id")
    }),

    // Mojibake repair over deterministically-mangled docs: enrich the
    // ASCII corpus with multi-byte chars (the "truth" — 2-, 3- and
    // 4-byte UTF-8), mangle by decoding the truth's UTF-8 bytes as
    // latin-1 (the raw-C1 flavor), repair. The oracle recomputes the
    // truth directly, so the check is exactly "repair inverts the
    // mangle" — no SQL re-implementation of the repair needed.
    "t_fix_mojibake" -> ((s, dir) => {
      val truth = Tables(s, dir, "documents").withColumn("truth",
        concat(
          when(col("doc_id") % 2 === 0, lit("Café — ")).otherwise(lit("")),
          regexp_replace(col("text"), "the ", "thé "),
          when(col("doc_id") % 3 === 0, lit(" €’uvre")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit(" 🙂")).otherwise(lit(""))))
      val mangled = truth.withColumn("mangled",
        decode(encode(col("truth"), "UTF-8"), "ISO-8859-1"))
      graft.operators.TextQuality.fixMojibakeDocs(mangled, "doc_id", "mangled")
        .orderBy("doc_id")
    })
  )

  override val oracles: Map[String, String] = Map(
    "p7_pii" ->
      s"""$piiCte
         |SELECT pii_type, CAST(sum(m) AS BIGINT) AS occurrences FROM (
         | SELECT 'email' AS pii_type,
         |  len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS m FROM u
         | UNION ALL
         | SELECT 'phone', len(regexp_extract_all(text2, '\\d{3}[-. ]\\d{3}[-. ]\\d{4}')) FROM u
         | UNION ALL
         | SELECT 'ip', len(regexp_extract_all(text2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) FROM u
         |) GROUP BY 1 ORDER BY 1""".stripMargin,

    "p21_pii_redact" ->
      s"""$piiCte
         |SELECT doc_id,
         | CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
         | CAST(len(regexp_extract_all(text2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip,
         | CAST(len(regexp_extract_all(text2, '\\d{3}[-. ]\\d{3}[-. ]\\d{4}')) AS BIGINT) AS n_phone,
         | regexp_replace(regexp_replace(regexp_replace(text2,
         |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<|email|>', 'g'),
         |  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<|ip|>', 'g'),
         |  '\\d{3}[-. ]\\d{3}[-. ]\\d{4}', '<|phone|>', 'g') AS text_redacted
         |FROM u ORDER BY doc_id""".stripMargin,

    "p8_taxonomy" ->
      """SELECT label, count(*) AS n_docs FROM (
        | SELECT 'speed' AS label FROM documents WHERE regexp_matches(text, '\b(fast|slow)\b')
        | UNION ALL
        | SELECT 'data_ops' FROM documents WHERE regexp_matches(text, '\b(merge|join)\b')
        | UNION ALL
        | SELECT 'absent' FROM documents WHERE regexp_matches(text, '\b(qqqqq)\b')
        |) GROUP BY 1 ORDER BY 1""".stripMargin,

    "p9_sentiment" ->
      s"""WITH lex(word, v) AS (SELECT * FROM (VALUES
         |  ${sqlDoubleValues(lexicon)}) x(w, s)),
         |boost(word, m) AS (SELECT * FROM (VALUES
         |  ${sqlDoubleValues(boosters)}) x(w, s)),
         |d AS (SELECT lang, doc_id,
         |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
         | FROM documents),
         |tok AS (SELECT doc_id, e.i AS i, e.w AS w FROM (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
         |    i -> {'i': i, 'w': toks[i]})) AS e FROM d)),
         |${valenceScoreCtes("doc_id")},
         |perdoc AS (SELECT d.lang, d.doc_id, coalesce(p.pol, 0.0) AS polarity
         | FROM d LEFT JOIN (SELECT doc_id, sum(s) / count(*) AS pol
         |                   FROM sc GROUP BY 1) p USING (doc_id))
         |SELECT lang, round(avg(polarity), 6) AS avg_polarity, count(*) AS n_docs
         |FROM perdoc GROUP BY 1 ORDER BY 1""".stripMargin,

    "p6_lang_counts" ->
      "SELECT lang, count(*) AS cnt FROM documents GROUP BY 1 ORDER BY 1",

    // L-BFGS weights are not SQL-expressible; the expected output is a
    // committed golden fixture (bit-deterministic across runs — see
    // DuckSql.golden)
    "p8_model" -> DuckSql.golden("p8_model"),

    "p9_sentence" ->
      s"""WITH lex(word, v) AS (SELECT * FROM (VALUES
         |  ${sqlDoubleValues(lexicon)}) x(w, s)),
         |boost(word, m) AS (SELECT * FROM (VALUES
         |  ${sqlDoubleValues(boosters)}) x(w, s)),
         |u AS (SELECT doc_id, regexp_replace(text, '([^ ]+( [^ ]+){6}) ', '\\1. ', 'g') AS text2
         |      FROM documents),
         |se AS (SELECT doc_id,
         |  unnest(list_transform(generate_series(1, len(ss)), i -> {'i': i, 's': ss[i]})) AS e
         | FROM (SELECT doc_id, list_filter(string_split(
         |    regexp_replace(text2, '([.!?]+["'')\\]]*)\\s+', '\\1' || chr(1), 'g'), chr(1)),
         |    x -> x <> '') AS ss FROM u)),
         |t2 AS (SELECT * FROM (
         |  SELECT doc_id, e.i AS si, list_filter(string_split(
         |    regexp_replace(e.s, '[.!?]', '', 'g'), ' '), x -> x <> '') AS toks FROM se)
         | WHERE len(toks) > 0),
         |tok AS (SELECT doc_id, si, e.i AS i, e.w AS w FROM (
         |  SELECT doc_id, si, unnest(list_transform(generate_series(1, len(toks)),
         |    i -> {'i': i, 'w': toks[i]})) AS e FROM t2)),
         |${valenceScoreCtes("doc_id, si")},
         |pol AS (SELECT t2.doc_id, t2.si, t2.toks, coalesce(p.pol, 0.0) AS polarity
         | FROM t2 LEFT JOIN (SELECT doc_id, si, sum(s) / count(*) AS pol
         |                    FROM sc GROUP BY 1, 2) p USING (doc_id, si)),
         |lab AS (SELECT doc_id, si, toks, polarity,
         |    CASE WHEN round(polarity, 6) > 0.05 THEN 'pos'
         |         WHEN round(polarity, 6) < -0.05 THEN 'neg' ELSE 'neu' END AS label
         |  FROM pol),
         |trm(term) AS (SELECT * FROM (VALUES ('data'), ('fast'), ('slow'), ('spark')) x(t)),
         |hit2 AS (SELECT term, label, polarity FROM lab JOIN trm ON list_contains(lab.toks, trm.term))
         |SELECT term, label, count(*) AS n_sentences, round(avg(polarity), 6) AS avg_polarity
         |FROM hit2 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p6_lang_model" -> {
      val seedValues = graft.operators.LangId.seeds
        .map { case (l, t) => s"('$l', ${DuckSql.lit(t)})" }.mkString(",\n  ")
      val k = graft.functions.expressions.CtKernel.DefaultTopK
      s"""WITH seeds(slang, seed) AS (VALUES
         |  $seedValues),
         |sg AS (${DuckSql.ctGrams("slang", "seed", "seeds")}),
         |prof AS (SELECT * FROM (
         |  SELECT slang, g, row_number() OVER (PARTITION BY slang ORDER BY count(*) DESC, g) AS r
         |  FROM sg GROUP BY slang, g) WHERE r <= $k),
         |dg AS (${DuckSql.ctGrams("doc_id", "text", "documents")}),
         |dprof AS (SELECT * FROM (
         |  SELECT doc_id, g, row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g) AS r
         |  FROM dg GROUP BY doc_id, g) WHERE r <= $k),
         |dist AS (SELECT dp.doc_id, l.slang AS cand,
         |   sum(CASE WHEN p.r IS NULL THEN $k ELSE abs(dp.r - p.r) END) AS d,
         |   sum(CASE WHEN p.r IS NULL THEN 0 ELSE 1 END) AS hits
         | FROM dprof dp CROSS JOIN (SELECT DISTINCT slang FROM seeds) l
         | LEFT JOIN prof p ON p.slang = l.slang AND p.g = dp.g
         | GROUP BY 1, 2),
         |pred AS (SELECT doc_id,
         |  CASE WHEN hits < 2 THEN 'un' ELSE cand END AS pred FROM (
         |  SELECT doc_id, cand, d, hits,
         |   row_number() OVER (PARTITION BY doc_id ORDER BY d, cand) AS rn
         |  FROM dist) WHERE rn = 1)
         |SELECT d.lang, coalesce(p.pred, 'un') AS pred, count(*) AS cnt
         |FROM documents d LEFT JOIN pred p USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "p11_anomalous_lengths" ->
      s"""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |FROM documents
         |WHERE len(string_split(text, ' ')) IN (${spikes.mkString(", ")})
         |ORDER BY doc_id""".stripMargin,

    "p12_length_dist" ->
      """WITH c AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  count(*) AS cnt FROM documents GROUP BY 1, 2)
        |SELECT lang, n_tokens, cnt,
        | round(CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY lang), 6) AS p
        |FROM c ORDER BY lang, n_tokens""".stripMargin,

    "p14_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        |ORDER BY doc_id""".stripMargin,

    "p15_stratified" ->
      s"""WITH b AS (SELECT source,
         |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS bucket
         | FROM documents)
         |SELECT source, count(*) AS cnt FROM b
         |WHERE bucket < (CASE source
         |  WHEN 'src10' THEN ${math.round(0.5 * (1L << 32))}
         |  WHEN 'src11' THEN ${math.round(0.25 * (1L << 32))}
         |  WHEN 'src12' THEN ${1L << 32}
         |  ELSE ${math.round(0.05 * (1L << 32))} END)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "p16_mixture_plan" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
        | FROM documents GROUP BY source),
        |p AS (SELECT *, CAST(round((CASE source WHEN 'src10' THEN 0.6
        |  WHEN 'src11' THEN 0.3 WHEN 'src12' THEN 0.1 ELSE 0.0 END) * 10000) AS BIGINT)
        |  AS target_tokens FROM a)
        |SELECT source, n_docs, available_tokens, target_tokens,
        | round(LEAST(1.0, target_tokens / available_tokens), 6) AS fraction
        |FROM p ORDER BY source""".stripMargin,

    "p17_length_quantiles" ->
      """WITH n AS (SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS n FROM documents),
        |q AS (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q,
        |  unnest(quantile_cont(n, [0.25, 0.5, 0.75, 0.9, 0.99])) AS v FROM n)
        |SELECT q, round(v, 6) AS value FROM q ORDER BY q""".stripMargin,

    "t_script_mix" ->
      """WITH u AS (SELECT doc_id, text ||
        | (CASE WHEN doc_id % 4 = 0 THEN ' ' || chr(1040) || chr(1041) || chr(1042)
        |        || ' ' || chr(1075) || chr(1076)
        |   WHEN doc_id % 4 = 1 THEN ' ' || chr(28450) || chr(23383)
        |   WHEN doc_id % 4 = 2 THEN ' ' || chr(1575) || chr(1576) || chr(1580) || ' 42'
        |   ELSE '' END) AS text2 FROM documents),
        |n AS (SELECT doc_id, text2,
        |  length(regexp_replace(text2, '\s', '', 'g')) AS ns FROM u)
        |SELECT doc_id, CAST(ns AS BIGINT) AS n_chars,
        | round(len(regexp_extract_all(text2, '[A-Za-z]'))
        |   / CAST(greatest(ns, 1) AS DOUBLE), 6) AS latin_frac,
        | round(len(regexp_extract_all(text2, '[0-9]'))
        |   / CAST(greatest(ns, 1) AS DOUBLE), 6) AS digit_frac,
        | round(len(regexp_extract_all(text2, '[' || chr(1024) || '-' || chr(1279) || ']'))
        |   / CAST(greatest(ns, 1) AS DOUBLE), 6) AS cyrillic_frac,
        | round(len(regexp_extract_all(text2, '[' || chr(19968) || '-' || chr(40959) || ']'))
        |   / CAST(greatest(ns, 1) AS DOUBLE), 6) AS cjk_frac,
        | round(len(regexp_extract_all(text2, '[' || chr(1536) || '-' || chr(1791) || ']'))
        |   / CAST(greatest(ns, 1) AS DOUBLE), 6) AS arabic_frac
        |FROM n ORDER BY doc_id""".stripMargin,

    "a18_distinctive_terms" ->
      """WITH c AS (SELECT w,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cb
        | FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
        | GROUP BY 1),
        |t AS (SELECT CAST(sum(ca) AS DOUBLE) AS ta, CAST(sum(cb) AS DOUBLE) AS tb,
        |  CAST(count(*) AS DOUBLE) AS v FROM c),
        |s AS (SELECT w, ca, cb, round(
        |   (ln((ca + 0.5) / (ta + 0.5 * v - ca - 0.5)) -
        |    ln((cb + 0.5) / (tb + 0.5 * v - cb - 0.5)))
        |   / sqrt(1.0 / (ca + 0.5) + 1.0 / (cb + 0.5)), 6) AS z
        | FROM c CROSS JOIN t)
        |SELECT w, ca, cb, z, side FROM (
        | (SELECT *, 'a' AS side FROM s ORDER BY z DESC, w LIMIT 15)
        | UNION ALL
        | (SELECT *, 'b' AS side FROM s ORDER BY z ASC, w LIMIT 15))
        |ORDER BY side, w""".stripMargin,

    "p22_weighted_sample" ->
      """WITH w AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |s AS (SELECT doc_id, n_tokens,
        |  ln(CAST(n_tokens AS DOUBLE)) - ln(-ln(
        |   (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |     + 0.5) / 4294967296.0)) AS score
        | FROM w WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens FROM
        | (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 30)
        |ORDER BY doc_id""".stripMargin,

    "p23_sample_per_group" ->
      """SELECT source, doc_id FROM (
        | SELECT source, doc_id, row_number() OVER (PARTITION BY source
        |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM documents)
        |WHERE rn <= 3 ORDER BY source, doc_id""".stripMargin,

    // f = target/avail replayed in the same exact-integer→DOUBLE division;
    // the remainder epoch compares the md5 bucket to frac(f)*2^32 in DOUBLE
    // — identical IEEE arithmetic both engines, so rows match exactly
    "p24_mixture_upsample" ->
      """WITH a AS (SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
        | FROM documents GROUP BY 1),
        |f AS (SELECT source,
        |  CAST(round((CASE source WHEN 'src10' THEN 0.7
        |    WHEN 'src11' THEN 0.3 ELSE 0.0 END) * 60000) AS BIGINT) / avail AS f
        | FROM a),
        |d AS (SELECT d.source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS bucket,
        |  f FROM documents d JOIN f USING (source) WHERE f > 0),
        |e AS (SELECT source, doc_id, t, bucket, f,
        |  unnest(generate_series(0, CAST(floor(f) AS BIGINT))) AS epoch FROM d)
        |SELECT source, epoch, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS n_tokens
        |FROM e
        |WHERE epoch < floor(f) OR CAST(bucket AS DOUBLE) < (f - floor(f)) * 4294967296.0
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p20_temp_mixture" ->
      """WITH a AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
        | FROM documents GROUP BY source),
        |p AS (SELECT *, round(pow(CAST(available_tokens AS DOUBLE), 0.5) /
        |  sum(pow(CAST(available_tokens AS DOUBLE), 0.5)) OVER (), 6) AS p FROM a),
        |t AS (SELECT *, CAST(round(p * 10000) AS BIGINT) AS target_tokens FROM p)
        |SELECT source, n_docs, available_tokens, p, target_tokens,
        | round(LEAST(1.0, target_tokens / available_tokens), 6) AS fraction,
        | round(target_tokens / CAST(available_tokens AS DOUBLE), 4) AS epochs
        |FROM t ORDER BY source""".stripMargin,

    "t_dsir" ->
      """WITH grams AS (SELECT doc_id,
        |  unnest(list_concat(t, CASE WHEN len(t) > 1
        |    THEN list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i+1])
        |    ELSE [] END)) AS g
        | FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
        |b AS (SELECT doc_id,
        |  CAST(concat('0x', substring(md5(g), 1, 8)) AS BIGINT) % 256 AS bk FROM grams),
        |tcnt AS (SELECT bk, count(*) AS c FROM b JOIN documents USING (doc_id)
        | WHERE lang = 'en' GROUP BY 1),
        |rcnt AS (SELECT bk, count(*) AS c FROM b GROUP BY 1),
        |tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tcnt) AS tt,
        |  (SELECT coalesce(sum(c), 0) FROM rcnt) AS tr),
        |lam AS (SELECT i AS bk,
        |  ln((coalesce(tc.c, 0) + 1.0) / (tt + 256.0)) -
        |  ln((coalesce(rc.c, 0) + 1.0) / (tr + 256.0)) AS lr
        | FROM generate_series(0, 255) AS g(i) CROSS JOIN tot
        | LEFT JOIN tcnt tc ON tc.bk = i LEFT JOIN rcnt rc ON rc.bk = i),
        |w AS (SELECT doc_id, sum(lr) AS wt FROM b JOIN lam USING (bk) GROUP BY 1),
        |sel AS (SELECT doc_id, wt FROM w
        | ORDER BY wt + (-ln(-ln((CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) + 0.5) / 4294967296.0))) DESC, doc_id
        | LIMIT 25)
        |SELECT doc_id, round(wt, 4) AS dsir_weight FROM sel ORDER BY doc_id""".stripMargin,

    "t_html_strip" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><style>p{color:red}</style></head><body><!-- hdr --><p>' || text ||
        |  '</p>' ||
        |  (CASE WHEN doc_id % 3 = 0
        |    THEN '<script type="text/javascript">var x = 1 < 2;</script>' ELSE '' END) ||
        |  '<p>&amp; &lt;raw&gt;&nbsp;done</p></body></html>' AS html FROM documents),
        |c0 AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '<[^>]+>', ' ', 'g') AS s FROM h),
        |c1 AS (SELECT doc_id, html,
        |  regexp_replace(regexp_replace(regexp_replace(s,
        |    '&nbsp;', ' ', 'g'),
        |    '&lt;', '<', 'g'),
        |    '&gt;', '>', 'g') AS s FROM c0),
        |c AS (SELECT doc_id, html,
        |  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
        |    '&quot;', '"', 'g'),
        |    '&#39;', '''', 'g'),
        |    '&amp;', '&', 'g'),
        |  '\s+', ' ', 'g')) AS text_clean FROM c1)
        |SELECT doc_id, text_clean,
        | round(CAST(len(text_clean) AS DOUBLE) / greatest(len(html), 1), 6) AS retained_frac
        |FROM c ORDER BY doc_id""".stripMargin,

    // chr() codepoints, not literals, so the mangling is byte-identical to
    // the Spark side: 769=U+0301, 160=NBSP, 8203=ZWSP, 7=BEL, 8195=em
    // space, 65279=BOM; the replace cascade mirrors TextNorm's pass order
    "t_normalize" ->
      """WITH h AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 4 = 0 THEN 'Cafe' || chr(769) || ' ' ELSE '' END) || text ||
        |  (CASE WHEN doc_id % 3 = 0
        |    THEN chr(13) || chr(10) || 'line' || chr(160) || 'two' || chr(8203) || '!' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0
        |    THEN chr(7) || chr(8195) || 'end' || chr(65279) ELSE '' END) AS raw FROM documents),
        |n1 AS (SELECT doc_id, raw, regexp_replace(regexp_replace(raw,
        |  '\x{000D}\x{000A}', chr(10), 'g'), '\x{000D}', chr(10), 'g') AS s FROM h),
        |n2 AS (SELECT doc_id, raw, regexp_replace(s,
        |  '[\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g') AS s FROM n1),
        |n3 AS (SELECT doc_id, raw, regexp_replace(s,
        |  '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]', '', 'g') AS s FROM n2),
        |n4 AS (SELECT doc_id, raw, regexp_replace(s,
        |  '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]', '', 'g') AS s FROM n3),
        |n AS (SELECT doc_id, raw, nfc_normalize(s) AS text_norm FROM n4)
        |SELECT doc_id, text_norm, (text_norm <> raw) AS changed FROM n ORDER BY doc_id""".stripMargin,

    // chr() codepoints so the truth is byte-identical to the Spark side:
    // 233=é, 8212=—, 8364=€, 8217=’, 128578=🙂. `changed` is Spark's
    // repaired<>mangled; the truth differs from the ASCII text exactly
    // when some enrichment fired, i.e. when the mangle altered bytes —
    // so (truth <> text) is the same predicate.
    "t_fix_mojibake" ->
      """WITH h AS (SELECT doc_id, text,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'Caf' || chr(233) || ' ' || chr(8212) || ' ' ELSE '' END) ||
        |  replace(text, 'the ', 'th' || chr(233) || ' ') ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(8364) || chr(8217) || 'uvre' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN ' ' || chr(128578) ELSE '' END) AS truth FROM documents)
        |SELECT doc_id, truth AS text_fixed, (truth <> text) AS changed
        |FROM h ORDER BY doc_id""".stripMargin
  )
}
