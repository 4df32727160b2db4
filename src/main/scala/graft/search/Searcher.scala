package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.TextFunctions
import graft.functions.expressions.{PhraseMatch, PhraseMatchLucene}

/** The Elasticsearch wrapper surface (reference wimbd/es/__init__.py —
  * SURVEY §2.7 E1-E6) re-expressed as DataFrame filters/aggregates: the ES
  * cluster boundary becomes Spark's own task distribution, shard-merge
  * becomes partial-count merge, and `msearch` batching becomes one
  * set-oriented job.
  */
object Searcher {

  /** Phrase predicate over a text column: ordered token-sequence containment
    * with slop (E1; reference :89-184). slop=0 compiles to n-gram
    * containment; tokenization is UAX-29 by default for parity with the
    * engine's other operators.
    */
  def phrasePredicate(text: Column, phrase: String, slop: Int = 0,
                      uax29: Boolean = true, luceneSlop: Boolean = false): Column = {
    val toks = if (uax29) TextFunctions.tokenize(text) else split(text, " ")
    // the PHRASE goes through the same tokenizer as the documents
    // (reference src/cmd/count.rs:120-131 and the ES analyzer both do) —
    // a space-split phrase like "Paris." could never match UAX-29 text
    // tokens, and the index tier (parsePhrases) already tokenizes
    val ph = typedLit(
      if (uax29) graft.functions.Tokenizer.tokenize(phrase).toSeq
      else phrase.split(" ").toSeq)
    val args = (Bridge.expression(toks), Bridge.expression(ph), Bridge.expression(lit(slop)))
    Bridge.column(
      if (luceneSlop) PhraseMatchLucene(args._1, args._2, args._3)
      else PhraseMatch(args._1, args._2, args._3))
  }

  /** Analyze a query string the way [[TextFunctions.esAnalyzeText]]
    * analyzes documents — ES runs the SAME analyzer on both sides of a
    * match_phrase, so phrases aimed at an analyzed column must fold too.
    * Every step mirrors the column pipeline EXACTLY: Spark `lower()`'s
    * case fold (byte fold for full-ASCII strings, default-locale
    * otherwise — UTF8String.toLowerCase's two paths), the same `- _ "`
    * → space translation, the same tokenizer, and the same
    * `[\p{L}\p{N}]` keep-filter (Java regex, per codepoint) — a filter
    * as subtly different as Character.isLetterOrDigit would disagree on
    * Nl/No category tokens and supplementary-plane letters.
    */
  def analyzePhrase(s: String): String = {
    val lowered =
      if (s.forall(_ < 0x80)) s.toLowerCase(java.util.Locale.ROOT)
      else s.toLowerCase
    val folded = lowered.map {
      case '-' | '_' | '"' => ' '
      case c => c
    }
    val keep = java.util.regex.Pattern.compile("[\\p{L}\\p{N}]")
    graft.functions.Tokenizer.tokenize(folded)
      .filter(t => keep.matcher(t).find()).mkString(" ")
  }

  private def combined(text: Column, phrases: Seq[String], allPhrases: Boolean,
                       slop: Int, isRegexp: Boolean, uax29: Boolean,
                       luceneSlop: Boolean = false): Column = {
    // explicit: an empty phrase list would otherwise die inside reduce()
    // with an unhelpful UnsupportedOperationException (the dropParams=Nil
    // bug shape from round 3, pre-empted here)
    require(phrases.nonEmpty, "need at least one phrase")
    // battery-scale ANY/ALL (non-regexp): ONE document walk via
    // the MultiPhrasesFound kernel instead of P predicate columns —
    // matched-count == P is ALL, > 0 is ANY (duplicate phrases collapse
    // to distinct indices, so dedup before the cardinality compare)
    if (!isRegexp && phrases.length > WidePhraseGate) {
      val distinctPhrases = phrases.distinct
      // ANY only needs existence: firstOnly stops the walk at the first
      // hit, so a matching row costs O(position of first hit), not a
      // full-battery walk. BOTH slop dialects ride the kernel — the
      // insertion-budget semantics of PhraseMatch and the Lucene
      // move-distance mode (the ES default users actually get), which
      // the walker verifies with the same matchesPositions core as the
      // per-column PhraseMatchLucene plan (randomized differential in
      // PhraseMatchSpec).
      return if (allPhrases)
        size(multiPhrasesFoundCol(text, distinctPhrases, uax29,
          slop = slop, lucene = luceneSlop)) === distinctPhrases.length
      else size(multiPhrasesFoundCol(text, distinctPhrases, uax29,
        firstOnly = true, slop = slop, lucene = luceneSlop)) > 0
    }
    val preds = phrases.map { p =>
      if (isRegexp) text.rlike("(?i)" + p) // ES regexp mode is case-insensitive (:108-117)
      else phrasePredicate(text, p, slop, uax29, luceneSlop)
    }
    if (allPhrases) preds.reduce(_ && _) else preds.reduce(_ || _)
  }

  /** E1: `count_documents_containing_phrases` (ANY/ALL, slop, regexp mode,
    * optional subset filters).
    */
  def countContaining(df: DataFrame, textCol: String, phrases: Seq[String],
                      allPhrases: Boolean = false, slop: Int = 0,
                      isRegexp: Boolean = false, uax29: Boolean = true,
                      subsetFilter: Map[String, String] = Map.empty,
                      luceneSlop: Boolean = false): DataFrame = {
    val filtered = subsetFilter.foldLeft(df) { case (d, (k, v)) => d.where(col(k) === v) }
    filtered.where(combined(col(textCol), phrases, allPhrases, slop, isRegexp, uax29, luceneSlop))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** E2: `get_documents_containing_phrases` — same predicate, return rows.
    * No pagination needed in batch; `limit` + a sort column reproduce the
    * `search_after` behavior when a bounded page is wanted.
    */
  def getContaining(df: DataFrame, textCol: String, phrases: Seq[String],
                    allPhrases: Boolean = false, slop: Int = 0,
                    isRegexp: Boolean = false, uax29: Boolean = true,
                    numDocuments: Int = 10, sortCols: Seq[Column] = Seq.empty,
                    luceneSlop: Boolean = false,
                    returnAllHits: Boolean = false): DataFrame = {
    val hits = df.where(combined(col(textCol), phrases, allPhrases, slop, isRegexp, uax29, luceneSlop))
    val sorted = if (sortCols.nonEmpty) hits.orderBy(sortCols: _*) else hits
    // reference return_all_hits=True streams every match (scroll); in
    // batch that is simply the unlimited frame
    if (returnAllHits) sorted else sorted.limit(numDocuments)
  }

  /** Above this many phrases the path switches from one predicate
    * column per phrase to the set-oriented [[countPerPhraseWide]] kernel
    * plan — per-row cost and PLAN SIZE are O(P) in the per-column shape
    * (P token-seq scans per row, a P-column aggregate, P×|plan-node|
    * codegen), which caps it at a few hundred phrases; the kernel walks
    * each document once whatever P is.
    */
  private[graft] val WidePhraseGate: Int = 64

  /** E3: `count_documents_for_each_phrase` — one count per phrase, computed
    * in ONE job via a broadcast phrase table instead of N msearch batches
    * (reference :269-345). Zero-hit phrases are kept. Batteries beyond
    * [[WidePhraseGate]] route through [[countPerPhraseWide]] at any slop
    * in EITHER dialect — insertion-budget or `luceneSlop` move-distance
    * (identical results — spec-pinned differentials; the kernel anchors
    * candidates on the first phrase token, which neither dialect
    * relaxes: every match contains the first token somewhere).
    */
  def countPerPhrase(df: DataFrame, textCol: String, phrases: Seq[String],
                     slop: Int = 0, uax29: Boolean = true,
                     luceneSlop: Boolean = false): DataFrame = {
    if (phrases.isEmpty) { // empty benchmark → empty report, never a throw
      val spark = df.sparkSession
      import spark.implicits._
      return Seq.empty[(String, Long)].toDF("phrase", "n_docs")
    }
    if (phrases.length > WidePhraseGate)
      return countPerPhraseWide(df, textCol, phrases, uax29, slop, luceneSlop)
    // one boolean predicate column per phrase, all evaluated in a single
    // scan + single partial-agg (the set-oriented answer to msearch batching)
    val preds = df.select(phrases.zipWithIndex.map { case (p, i) =>
      phrasePredicate(col(textCol), p, slop, uax29, luceneSlop)
        .cast("long").as(s"__p$i")
    }: _*)
    val aggs = phrases.indices.map(i => coalesce(sum(col(s"__p$i")), lit(0L)).as(s"__p$i"))
    val sums = preds.agg(aggs.head, aggs.tail: _*)
    // inline over (phrase, count) structs, not map_from_arrays: a map
    // would RAISE on a duplicate input phrase here while the wide arm
    // reports one row per input — the gate must not be a behavior cliff
    sums.select(inline(array(phrases.zipWithIndex.map { case (p, i) =>
      struct(lit(p).as("phrase"), col(s"__p$i").as("n_docs")) }: _*)))
  }

  /** The [[graft.functions.expressions.MultiPhrasesFound]] kernel as a
    * Column: battery tokenized driver-side with the DOCUMENT tokenizer
    * (the [[phrasePredicate]] contract) and broadcast once. Shared by the
    * wide arms of [[countPerPhrase]] and [[combined]]; the active
    * SparkSession supplies the broadcast context. `firstOnly` is the
    * kernel's existence mode (ANY filters: stop at the first hit).
    */
  private def multiPhrasesFoundCol(text: Column, phrases: Seq[String],
                                   uax29: Boolean,
                                   firstOnly: Boolean = false,
                                   slop: Int = 0,
                                   lucene: Boolean = false): Column = {
    val spark = org.apache.spark.sql.SparkSession.active
    val phraseToks: Array[Array[org.apache.spark.unsafe.types.UTF8String]] =
      phrases.iterator.map { p =>
        val ts: Seq[String] =
          if (uax29) graft.functions.Tokenizer.tokenize(p)
          else p.split(" ").toSeq
        ts.map(org.apache.spark.unsafe.types.UTF8String.fromString(_)).toArray
      }.toArray
    val bc = spark.sparkContext.broadcast(phraseToks)
    val toks = if (uax29) TextFunctions.tokenize(text) else split(text, " ")
    Bridge.column(graft.functions.expressions.MultiPhrasesFound(
      Bridge.expression(toks), bc, firstOnly, slop, lucene))
  }

  /** [[countPerPhrase]] for LARGE phrase batteries (any slop): phrases are
    * tokenized driver-side through the same tokenizer as the documents
    * (the [[phrasePredicate]] contract), broadcast once, and each
    * document is walked ONCE by the
    * [[graft.functions.expressions.MultiPhrasesFound]] kernel against a
    * first-token index of the battery — O(len) per row instead of O(P·len),
    * and a P-independent plan. The only shuffle is the (index, count)
    * partial aggregate: ≤ P rows per partition, never document text.
    * Duplicate phrases each report the shared count, like the per-column
    * arm's one row per input phrase.
    */
  /** The shared tail of every wide battery plan: aggregate the exploded
    * per-index hits (row count, or the sum of `value` when given) and
    * left-join onto the full label frame so zero-hit entries report 0 —
    * the aggregated side (≤ battery-size rows) is the BUILT broadcast
    * side (a broadcast hint on the preserved side of a left join is
    * unsupported and silently ignored). Callers select/rename off the
    * joined (labels..., __n) frame.
    */
  private[graft] def zeroHitCounts(exploded: DataFrame, idx: Column,
                                   value: Option[Column],
                                   labels: DataFrame): DataFrame = {
    val hits = exploded.groupBy(idx.as("__idx"))
      .agg(value.map(sum).getOrElse(count(lit(1))).as("__n"))
    labels.join(broadcast(hits), Seq("__idx"), "left")
  }

  private[graft] def countPerPhraseWide(df: DataFrame, textCol: String,
                                        phrases: Seq[String],
                                        uax29: Boolean = true,
                                        slop: Int = 0,
                                        luceneSlop: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val foundCol = multiPhrasesFoundCol(col(textCol), phrases, uax29,
      slop = slop, lucene = luceneSlop)
    zeroHitCounts(df.select(explode(foundCol).as("__f")), col("__f"), None,
        phrases.zipWithIndex.map { case (p, i) => (i, p) }
          .toDF("__idx", "phrase"))
      .select(col("phrase"), coalesce(col("__n"), lit(0L)).as("n_docs"))
  }

  /** E4: total term frequency of unigrams (reference :348-426 reads ES
    * termvectors; exact by construction here). Zero-hit unigrams kept.
    */
  def unigramTtf(df: DataFrame, textCol: String, unigrams: Seq[String],
                 uax29: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = if (uax29) TextFunctions.tokenize(col(textCol)) else split(col(textCol), " ")
    val counts = df.select(explode(toks).as("unigram"))
      .where(col("unigram").isin(unigrams: _*))
      .groupBy("unigram").agg(count(lit(1)).as("c"))
    // broadcast the BUILT (aggregated, |unigrams|-bounded) side — a hint
    // on the preserved side of a left join is unsupported and ignored
    unigrams.toDF("unigram").join(broadcast(counts), Seq("unigram"), "left")
      .select(col("unigram"), coalesce(col("c"), lit(0L)).as("total_occurrences"))
  }

  /** A12: corpus contamination — fraction of benchmark phrases present at
    * least once (reference wimbd/es/corpus_contamination.py:28-58).
    */
  def contamination(df: DataFrame, textCol: String, phrases: Seq[String],
                    slop: Int = 0, uax29: Boolean = true,
                    luceneSlop: Boolean = false): DataFrame = {
    val per = countPerPhrase(df, textCol, phrases, slop, uax29, luceneSlop)
    // coalesce: an EMPTY benchmark reports (0, 0, 0.0), not nulls (sum
    // and avg over zero rows are null)
    per.agg(count(lit(1)).as("n_phrases"),
      coalesce(sum(when(col("n_docs") > 0, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("n_contaminated"),
      round(coalesce(avg(when(col("n_docs") > 0, 1.0).otherwise(0.0)),
        lit(0.0)), 6).as("pct"))
  }

  /** The reference's batch contamination driver (runs/p3_contamination.py
    * iterates benchmarks × corpora issuing one E3 batch per benchmark)
    * collapsed to ONE corpus scan for every benchmark at once: the distinct
    * phrase union becomes one predicate column each (a single scan +
    * scalar partial-agg regardless of benchmark count), and the per-
    * benchmark rollup joins the tiny (benchmark, phrase) table after
    * aggregation. Phrases shared between benchmarks are evaluated once.
    */
  def contaminationByBenchmark(df: DataFrame, textCol: String,
                               benchPhrases: Seq[(String, String)],
                               slop: Int = 0, uax29: Boolean = true,
                               luceneSlop: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val per = countPerPhrase(df, textCol, benchPhrases.map(_._2).distinct,
      slop, uax29, luceneSlop)
    broadcast(benchPhrases.toDF("benchmark", "phrase"))
      .join(per, Seq("phrase"))
      .groupBy("benchmark")
      .agg(count(lit(1)).as("n_phrases"),
        sum(when(col("n_docs") > 0, 1L).otherwise(0L)).cast("long").as("n_contaminated"),
        round(avg(when(col("n_docs") > 0, 1.0).otherwise(0.0)), 6).as("pct"))
  }

  /** Paired contamination (reference wimbd/es/corpus_contamination.py:44-58
    * `paired_contamination_percentage`): a benchmark EXAMPLE carries
    * several field strings (question + answer, premise + hypothesis) and
    * is contaminated iff some SINGLE document contains ALL of them — the
    * reference zips the fields and queries with `all_phrases=True`; a doc
    * holding only the question does not count. ONE corpus scan: a
    * conjunction predicate column per example, one partial aggregate
    * (per-example max), the driver-side rollup — plan cost O(|examples|)
    * expressions, never O(|examples|) jobs. Same output shape as
    * [[contamination]] (n, count, percentage in the reference's summary).
    */
  def pairedContamination(df: DataFrame, textCol: String,
                          examples: Seq[Seq[String]], slop: Int = 0,
                          uax29: Boolean = true,
                          luceneSlop: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (examples.isEmpty) { // empty benchmark → empty report, never a throw
      import spark.implicits._
      return Seq.empty[(Long, Long, Double)]
        .toDF("n_examples", "n_contaminated", "pct")
    }
    countPerExample(df, textCol, examples, slop, uax29, luceneSlop)
      .agg(count(lit(1)).as("n_examples"),
        sum(when(col("n_docs") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_contaminated"),
        round(avg(when(col("n_docs") > 0, 1.0).otherwise(0.0)), 6).as("pct"))
  }

  /** The row-level surface under [[pairedContamination]] — the reference's
    * `count_documents_for_each_phrase(..., all_phrases=True)` shape
    * (:269-345 with lists of lists): one document count PER EXAMPLE,
    * where a document counts only if it contains every field phrase of
    * that example. Same single-scan plan as [[countPerPhrase]]: one
    * conjunction predicate column per example, one partial aggregate.
    */
  def countPerExample(df: DataFrame, textCol: String,
                      examples: Seq[Seq[String]], slop: Int = 0,
                      uax29: Boolean = true,
                      luceneSlop: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    if (examples.isEmpty)
      return Seq.empty[(Long, Long)].toDF("example_id", "n_docs")
    require(examples.forall(_.nonEmpty),
      "each example needs at least one field phrase")
    if (examples.length > WidePhraseGate)
      return countPerExampleWide(df, textCol, examples, uax29, slop,
        luceneSlop)
    val preds = df.select(examples.zipWithIndex.map { case (ps, i) =>
      ps.map(p => phrasePredicate(col(textCol), p, slop, uax29, luceneSlop))
        .reduce(_ && _).cast("long").as(s"__e$i")
    }: _*)
    val aggs = examples.indices.map(i =>
      coalesce(sum(col(s"__e$i")), lit(0L)).as(s"__e$i"))
    preds.agg(aggs.head, aggs.tail: _*)
      .select(explode(map_from_arrays(
        array(examples.indices.map(i => lit(i.toLong)): _*),
        array(examples.indices.map(i => col(s"__e$i")): _*))))
      .select(col("key").as("example_id"), col("value").as("n_docs"))
  }

  /** [[countPerExample]] for LARGE example batteries (any slop): the
    * DISTINCT field set is tokenized driver-side, broadcast with its
    * field→examples fan-out, and each document is walked ONCE by
    * [[graft.functions.expressions.MultiExamplesMatched]] — per-row cost
    * O(len + matched-fields × fan-out) and an E-independent plan instead
    * of one conjunction column per example. The only shuffle is the
    * (example, count) partial aggregate. Duplicate fields within an
    * example dedup before the cardinality compare (a duplicate conjunct
    * is redundant in the AND), matching the per-column semantics.
    */
  private[graft] def countPerExampleWide(df: DataFrame, textCol: String,
                                         examples: Seq[Seq[String]],
                                         uax29: Boolean = true,
                                         slop: Int = 0,
                                         luceneSlop: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def toks(p: String): Seq[String] =
      if (uax29) graft.functions.Tokenizer.tokenize(p).toSeq
      else p.split(" ").toSeq
    // distinct fields keyed by TOKEN sequence (two spellings that
    // tokenize identically are one field), per-example distinct field ids
    val fieldIdOf = scala.collection.mutable.LinkedHashMap[Seq[String], Int]()
    val exFields: Array[Array[Int]] = examples.iterator.map { ex =>
      ex.map(p => fieldIdOf.getOrElseUpdate(toks(p), fieldIdOf.size))
        .distinct.toArray
    }.toArray
    val fieldToks: Array[Array[org.apache.spark.unsafe.types.UTF8String]] =
      fieldIdOf.keysIterator.map(_.map(
        org.apache.spark.unsafe.types.UTF8String.fromString(_)).toArray).toArray
    val fanOut: Array[Array[Int]] = {
      val b = Array.fill(fieldToks.length)(
        scala.collection.mutable.ArrayBuffer[Int]())
      exFields.zipWithIndex.foreach { case (fs, e) => fs.foreach(f => b(f) += e) }
      b.map(_.toArray)
    }
    val need: Array[Int] = exFields.map(_.length)
    val sc = spark.sparkContext
    val tokCol = if (uax29) TextFunctions.tokenize(col(textCol))
                 else split(col(textCol), " ")
    val matchedCol = Bridge.column(
      graft.functions.expressions.MultiExamplesMatched(
        Bridge.expression(tokCol), sc.broadcast(fieldToks),
        sc.broadcast(fanOut), sc.broadcast(need), slop, luceneSlop))
    zeroHitCounts(df.select(explode(matchedCol).as("__m")), col("__m"),
        None, examples.indices.map(i => Tuple1(i)).toDF("__idx"))
      .select(col("__idx").cast("long").as("example_id"),
        coalesce(col("__n"), lit(0L)).as("n_docs"))
  }

  /** E6: random access by id and seeded random sample. */
  def byId(df: DataFrame, idCol: String, ids: Seq[Any]): DataFrame =
    df.where(col(idCol).isin(ids: _*))

  def randomDocs(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** Reciprocal-rank fusion (Cormack et al. 2009) — ES's hybrid-retrieval
    * combinator: merge any number of ranked lists (lexical BM25, vector
    * kNN, …) by Σ 1/(rrfK + rank) per document; a doc absent from a list
    * simply contributes nothing. Each input frame needs a `doc_id` and a
    * 1-based `rank` column (what [[InvertedIndex.bm25TopK]]-then-rank and
    * [[graft.operators.Similarity.bruteForceKnn]] produce). `n_lists`
    * reports how many lists surfaced the doc. Scores round(6); ties break
    * doc_id-ascending.
    *
    * Plan shape: a union of k-bounded inputs (each already top-k-sized —
    * never corpus-sized), one tiny groupBy, one TakeOrderedAndProject.
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranked list")
    rankings.map(_.select(col("doc_id"),
        (lit(1.0) / (lit(rrfK) + col("rank"))).as("contrib")))
      .reduce(_ unionByName _)
      .groupBy("doc_id")
      .agg(round(sum("contrib"), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf_score"), asc("doc_id")).limit(topK)
  }
}
