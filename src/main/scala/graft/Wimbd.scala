package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Analyses, Dedup, NgramOps, SearchOps, UrlOps}
import graft.search.Searcher
import graft.sources.Corpus

/** One-stop facade mirroring the reference toolkit's user surface, so a
  * reference user maps each workflow 1:1 onto this library:
  *
  *   - the six Rust CLI subcommands (reference src/main.rs:23-82):
  *     [[topk]] [[botk]] [[count]] [[search]] [[stats]] [[unique]]
  *   - the Python map-reduce analyses (reference wimbd/&#42;/run.sh):
  *     [[urlCounts]] [[schemeCounts]] [[languageCounts]] [[piiCounts]] …
  *   - the Elasticsearch query wrappers (reference wimbd/es/__init__.py):
  *     [[countDocumentsContainingPhrases]] [[getDocumentsContainingPhrases]]
  *     [[countDocumentsForEachPhrase]] [[countTotalOccurrencesOfUnigrams]]
  *
  * Each method is a thin delegation to the operator objects (which carry the
  * file:line citations and scale notes); inputs are either a loaded corpus
  * DataFrame or gzip-JSONL paths via [[load]].
  */
object Wimbd {

  /** `expand_dirs` + gzip JSONL scan with the canonical document schema
    * (reference src/io.rs:13-59, src/cmd/util.rs:318-339).
    */
  def load(spark: SparkSession, paths: Seq[String],
           perFileLimit: Option[Int] = None,
           fileLimit: Option[Int] = None): DataFrame =
    Corpus.readJsonl(spark, paths, perFileLimit = perFileLimit, fileLimit = fileLimit)

  /** `wimbd topk PATH... -n N -k K` (reference src/cmd/topk.rs:106-343,
    * exact mode — counts are exact, not sketch upper bounds).
    */
  def topk(docs: DataFrame, n: Int, k: Int, uax29: Boolean = true): DataFrame =
    NgramOps.topK(docs, "text", n, k, uax29)

  /** `wimbd topk` approximate mode: the reference's `--size`-bounded
    * sketch contract (counts are `≤` upper bounds, `--threshold` pruning).
    */
  def topkApprox(docs: DataFrame, n: Int, k: Int, width: Int = 1 << 18,
                 depth: Int = 5, seed: Int = 42, threshold: Long = 1L,
                 uax29: Boolean = true): DataFrame =
    NgramOps.topKApprox(docs, "text", n, k, width, depth, seed, threshold, uax29)

  /** `wimbd botk` (reference src/cmd/botk.rs:103-359 — one exact pass; no
    * inverted-sketch two-pass needed).
    */
  def botk(docs: DataFrame, n: Int, k: Int, uax29: Boolean = true): DataFrame =
    NgramOps.botK(docs, "text", n, k, uax29)

  /** `wimbd count -s PHRASE...` exact token-sequence occurrence counts
    * (reference src/cmd/count.rs:66-208).
    */
  def count(docs: DataFrame, phrases: Seq[String], uax29: Boolean = true): DataFrame =
    NgramOps.countPhrases(docs, "text", phrases, uax29)

  /** `wimbd search -p PATTERN...` regex match counts; `withLocations`
    * additionally returns per-doc submatch offsets (reference
    * src/cmd/search.rs:74-330).
    */
  def search(docs: DataFrame, patterns: Seq[String]): DataFrame =
    NgramOps.searchRegex(docs, "text", patterns)

  def searchWithLocations(docs: DataFrame, patterns: Seq[String],
                          idCol: String = "doc_id",
                          locationsLimit: Option[Int] = None): DataFrame =
    SearchOps.regexLocations(docs, "text", idCol, patterns, locationsLimit)

  /** `wimbd stats` (reference src/cmd/stats.rs:61-374). */
  def stats(docs: DataFrame, uax29: Boolean = true): DataFrame =
    NgramOps.stats(docs, "text", uax29)

  /** `wimbd stats` argmax/argmin doc pointers, ties kept (reference
    * src/cmd/stats.rs:89-135).
    */
  def statsExtremes(docs: DataFrame, idCol: String, uax29: Boolean = true): DataFrame =
    NgramOps.statsExtremes(docs, "text", idCol, uax29)

  /** `wimbd unique -n N` (reference src/cmd/unique.rs:65-161); exact by
    * default, HLL++ when `approx` (strictly better than the reference's
    * collision-biased Bloom estimate).
    */
  def unique(docs: DataFrame, n: Int, approx: Boolean = false,
             uax29: Boolean = true): DataFrame =
    if (approx) NgramOps.uniqueApprox(docs, "text", n, uax29 = uax29)
    else NgramOps.uniqueExact(docs, "text", n, uax29)

  // ---- Python map-reduce analyses (wimbd/*/run.sh) ----

  /** wimbd/url_counts */
  def urlCounts(docs: DataFrame): DataFrame = UrlOps.hostCounts(docs, "url")

  /** wimbd/url_per_tok_counts */
  def urlPerTokCounts(docs: DataFrame, uax29: Boolean = true): DataFrame =
    UrlOps.hostTokenCounts(docs, "url", "text", uax29)

  /** wimbd/scheme_counts */
  def schemeCounts(docs: DataFrame): DataFrame = UrlOps.schemeCounts(docs, "url")

  /** wimbd/high_level_domain_counts (composes over [[urlCounts]] output) */
  def domainSuffixCounts(hostCounts: DataFrame, psl: Seq[String]): DataFrame =
    UrlOps.suffixCounts(hostCounts, psl)

  /** wimbd/high_level_domain_counts with the real publicsuffix.org list
    * (tldextract's data source): full wildcard/exception semantics.
    */
  def domainSuffixCountsPsl(hostCounts: DataFrame,
                            pslPath: String = "/usr/share/publicsuffix/public_suffix_list.dat")
                           (implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    UrlOps.suffixCountsPsl(hostCounts, UrlOps.loadPublicSuffixList(spark, pslPath))

  /** wimbd/extension_counts */
  def extensionCounts(docs: DataFrame): DataFrame = UrlOps.extensionCounts(docs, "url")

  /** wimbd/language — stopword-heuristic path (cheap). */
  def languageCounts(docs: DataFrame): DataFrame = Analyses.langIdCounts(docs, "text")

  /** wimbd/language — model path (map_count.py:7-49 uses pycld2; here the
    * Cavnar–Trenkle classifier with embedded profiles, unreliable → `un`).
    */
  def languageCountsModel(docs: DataFrame): DataFrame =
    operators.LangId.langIdModelCounts(docs, "text", operators.LangId.ctProfiles())
      .select(col("pred").as("lang"), col("cnt"))

  /** wimbd/pii */
  def piiCounts(docs: DataFrame): DataFrame = Analyses.piiCountsGuarded(docs, "text")

  /** wimbd/profanity (taxonomy path; word lists as
    * resources/word_based_bias_list.csv categories)
    */
  def taxonomyCounts(docs: DataFrame, lists: Map[String, Seq[String]]): DataFrame =
    Analyses.taxonomyLabels(docs, "text", lists)

  /** wimbd/sentence_lengths (both histograms in one corpus pass) */
  def lengthHistograms(docs: DataFrame, uax29: Boolean = true): DataFrame = {
    val toks = NgramOps.tokens(col("text"), uax29)
    docs.select(explode(array(
        struct(lit("chars").as("dim"), length(col("text")).cast("long").as("value")),
        struct(lit("tokens").as("dim"), size(toks).cast("long").as("value")))).as("d"))
      .select(col("d.dim").as("dim"), col("d.value").as("value"))
      .groupBy("dim", "value").agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
  }

  /** wimbd/utterance_dates */
  def utteranceDates(docs: DataFrame,
                     dateCols: Seq[String] = Seq("date", "timestamp", "created")): DataFrame =
    Analyses.yearCounts(docs, dateCols)

  /** wimbd/random_sample (deterministic hash-Bernoulli, not rand()) */
  def randomSample(docs: DataFrame, hexCeil: String): DataFrame =
    Analyses.hashSample(docs, col("text"), hexCeil)

  // ---- dedup / overlap workflows (wimbd/text_and_url_overlaps) ----

  /** deduplicate.py — drop docs whose key duplicates an earlier doc. */
  def deduplicate(docs: DataFrame, key: org.apache.spark.sql.Column,
                  order: Seq[org.apache.spark.sql.Column]): DataFrame =
    Dedup.keepFirst(docs, key, order)

  /** decontaminate.py — remove B-docs whose key appears anywhere in A. */
  def decontaminate(b: DataFrame, bKey: org.apache.spark.sql.Column,
                    a: DataFrame, aKey: org.apache.spark.sql.Column): DataFrame =
    Dedup.decontaminate(b, bKey, a, aKey)

  // ---- ES wrapper surface (wimbd/es/__init__.py) ----

  /** count_documents_containing_phrases */
  def countDocumentsContainingPhrases(docs: DataFrame, phrases: Seq[String],
                                      allPhrases: Boolean = false,
                                      isRegexp: Boolean = false,
                                      slop: Int = 0,
                                      luceneSlop: Boolean = false): DataFrame =
    Searcher.countContaining(docs, "text", phrases, allPhrases, slop, isRegexp,
      luceneSlop = luceneSlop)

  /** get_documents_containing_phrases */
  def getDocumentsContainingPhrases(docs: DataFrame, phrases: Seq[String],
                                    numDocuments: Int,
                                    allPhrases: Boolean = false,
                                    isRegexp: Boolean = false,
                                    slop: Int = 0,
                                    returnAllHits: Boolean = false): DataFrame =
    Searcher.getContaining(docs, "text", phrases, allPhrases, slop, isRegexp,
      numDocuments = numDocuments, returnAllHits = returnAllHits)

  /** count_documents_for_each_phrase — one scan, all phrases. */
  def countDocumentsForEachPhrase(docs: DataFrame, phrases: Seq[String],
                                  slop: Int = 0,
                                  luceneSlop: Boolean = false): DataFrame =
    Searcher.countPerPhrase(docs, "text", phrases, slop,
      luceneSlop = luceneSlop)

  /** count_total_occurrences_of_unigrams — exact ttf by construction. */
  def countTotalOccurrencesOfUnigrams(docs: DataFrame, unigrams: Seq[String],
                                      uax29: Boolean = true): DataFrame =
    Searcher.unigramTtf(docs, "text", unigrams, uax29)

  /** corpus_contamination.py — fraction of benchmark phrases present. */
  def corpusContamination(docs: DataFrame, phrases: Seq[String],
                          slop: Int = 0,
                          luceneSlop: Boolean = false): DataFrame =
    Searcher.contamination(docs, "text", phrases, slop,
      luceneSlop = luceneSlop)

  /** corpus_contamination.py:44-58 `paired_contamination_percentage` —
    * multi-field benchmark examples (zipped fields), contaminated iff one
    * document contains every field phrase together.
    */
  def pairedContamination(docs: DataFrame, examples: Seq[Seq[String]],
                          slop: Int = 0,
                          luceneSlop: Boolean = false): DataFrame =
    Searcher.pairedContamination(docs, "text", examples, slop,
      luceneSlop = luceneSlop)

  /** `count_documents_for_each_phrase(..., all_phrases=True)` — one doc
    * count per example (lists of lists), every field in the same doc. */
  def countDocumentsForEachExample(docs: DataFrame,
                                   examples: Seq[Seq[String]],
                                   slop: Int = 0,
                                   luceneSlop: Boolean = false): DataFrame =
    Searcher.countPerExample(docs, "text", examples, slop,
      luceneSlop = luceneSlop)

  /** JSONL result sink with the reference's `--force` overwrite guard
    * (reference src/util.rs:6-25).
    */
  def writeJsonl(df: DataFrame, path: String, force: Boolean = false): Unit =
    Corpus.writeJsonl(df, path, force)

  // ---- index tier (the reference's pre-built ES index, as a table) ----

  /** Build the positions-aware inverted index for `docs` (one shuffle-free
    * pass; persist with [[graft.search.InvertedIndex.writeIndex]] to make
    * every later phrase/term query a pruned posting read instead of a
    * corpus scan — the reference's "index once in ES, query many" posture).
    */
  def buildIndex(docs: DataFrame, uax29: Boolean = true): DataFrame =
    graft.search.InvertedIndex.postings(docs, "doc_id", "text", uax29)

  /** count_documents_for_each_phrase answered from the index (exact and
    * slop variants share the scan tier's matcher semantics).
    */
  def countPhrasesIndexed(postings: DataFrame, phrases: Seq[String],
                          slop: Int = 0, uax29: Boolean = true): DataFrame =
    if (slop == 0)
      graft.search.InvertedIndex.phraseHits(postings, phrases, uax29)
        .select(org.apache.spark.sql.functions.col("phrase"),
          org.apache.spark.sql.functions.col("n_docs"))
    else graft.search.InvertedIndex.countContainingSlop(postings, phrases,
      slop, uax29)

  /** BM25-ranked document ids for a term query — the relevance ordering
    * the ES tier's retrieval applies.
    */
  def rankDocuments(postings: DataFrame, norms: DataFrame, terms: Seq[String],
                    k: Int): DataFrame =
    graft.search.InvertedIndex.bm25TopK(postings, norms, terms, k)

  /** ES regexp/wildcard query over the index's term dictionary (Lucene
    * full-term-match semantics): per-term df/ttf of every matching term.
    */
  def termsMatching(postings: DataFrame, pattern: String,
                    wildcard: Boolean = false): DataFrame =
    graft.search.InvertedIndex.termsMatching(postings, pattern, wildcard)

  /** ES match_phrase_prefix (autocomplete): the phrase's trailing token is
    * a prefix, expanded against the dictionary (capped, term order).
    */
  def countPhrasePrefix(postings: DataFrame, phrases: Seq[String],
                        uax29: Boolean = true,
                        maxExpansions: Int = 50): DataFrame =
    graft.search.InvertedIndex.phrasePrefixHits(postings, phrases, uax29,
      maxExpansions)

  /** ES fuzzy query: dictionary terms within `maxEdits` (≤ 2) classic
    * Levenshtein edits of `term`.
    */
  def termsFuzzy(postings: DataFrame, term: String, maxEdits: Int = 2,
                 prefixLength: Int = 0): DataFrame =
    graft.search.InvertedIndex.termsFuzzy(postings, term, maxEdits,
      prefixLength)

  /** ES more_like_this: documents ranked by similarity to `docId`, from
    * the index alone. The ES profile floors apply at ES defaults
    * (min_term_freq 2 / min_doc_freq 5 — a small test corpus returns
    * empty exactly like a small ES index); pass 1/1 to disable, and cap
    * `maxDocFreq` to df-bound the ranking join at scale.
    */
  def moreLikeThis(postings: DataFrame, norms: DataFrame, docId: Any,
                   maxQueryTerms: Int = 25, k: Int = 10,
                   minTermFreq: Long = 2, minDocFreq: Long = 5,
                   maxDocFreq: Long = Long.MaxValue): DataFrame =
    graft.search.InvertedIndex.moreLikeThis(postings, norms, docId,
      maxQueryTerms, k, minTermFreq, minDocFreq, maxDocFreq)

  /** ES more_like_this with `like: <text>` — the scale-preferred form
    * when the text is at hand (no doc-profile scan of the term-bucketed
    * index). Same ES-default profile floors as [[moreLikeThis]].
    */
  def moreLikeThisText(postings: DataFrame, norms: DataFrame, text: String,
                       uax29: Boolean = true, maxQueryTerms: Int = 25,
                       k: Int = 10, minTermFreq: Long = 2,
                       minDocFreq: Long = 5,
                       maxDocFreq: Long = Long.MaxValue): DataFrame =
    graft.search.InvertedIndex.moreLikeThisText(postings, norms, text,
      uax29, maxQueryTerms, k, excludeId = None,
      minTermFreq = minTermFreq, minDocFreq = minDocFreq,
      maxDocFreq = maxDocFreq)
}
