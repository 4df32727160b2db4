package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.expressions.{NGramsJoined, Tokenize, ValencePolarity}

/** Column-API surface for the text kernels. Everything here produces stock
  * Catalyst plans (custom expressions are codegen'd scalar calls, so they sit
  * inside WholeStageCodegen like built-ins).
  */
object TextFunctions {

  private def col2e(c: Column) = Bridge.expression(c)
  private def e2col(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    Bridge.column(e)

  /** UAX-29 word tokenize (reference src/tokens.rs:8-17). */
  def tokenize(c: Column): Column = e2col(Tokenize(col2e(c)))

  /** The reference ES tier's `standard` analyzer (its indices declare
    * `text: {type: text}` with no custom analyzer — wimbd/es/README.md:
    * 102-125, so phrase queries there are case-folded and ignore
    * punctuation), Spark-shaped: UAX-29 segmentation over the lowercased
    * text, punctuation/symbol-only tokens dropped. Exposed as a
    * PROJECTION rather than an option on every operator: materialize
    * [[esAnalyzeText]] once and run ANY surface over it with uax29=false
    * — phrase counts, contamination, the index build — which is exactly
    * the reference's posture (analysis happens at index-write time, and
    * queries analyze their phrases with the same analyzer; see
    * `Searcher.analyzePhrase`).
    *
    * Divergence note, handled here: the library tokenizer (JDK
    * BreakIterator grammar, reference-CLI parity) joins `-`, `_` and `"`
    * mid-word, while ES's true-UAX-29 standard tokenizer splits them
    * ("state-of-the-art" → [state, of, the, art]) — so those three are
    * translated to spaces BEFORE tokenizing. Apostrophes and decimal
    * points stay mid-word on both sides. `Searcher.analyzePhrase` must
    * mirror every step of this pipeline exactly.
    */
  def esAnalyze(text: Column): Column =
    filter(tokenize(translate(lower(text), "-_\"", "   ")),
      t => t.rlike("[\\p{L}\\p{N}]"))

  /** [[esAnalyze]] re-joined to a single-space string — the normalized
    * text column every downstream operator consumes with uax29=false. */
  def esAnalyzeText(text: Column): Column = array_join(esAnalyze(text), " ")

  /** n-grams of a token array, space-joined strings. */
  def ngrams(tokens: Column, n: Int): Column =
    e2col(NGramsJoined(col2e(tokens), col2e(lit(n))))

  /** tokenize + n-grams in one call. */
  def textNgrams(text: Column, n: Int): Column = ngrams(tokenize(text), n)

  /** Builtin-only n-gram variant (transform/sequence/slice/concat_ws) — used
    * where a plan made of 100% stock expressions is preferred; semantics are
    * identical to [[ngrams]].
    */
  def ngramsBuiltin(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(n)))))
    .otherwise(array().cast("array<string>"))

  /** Sentence segmentation, punkt-style: a boundary is a run of
    * terminators `[.!?]` (plus optional closing quotes/brackets) followed
    * by whitespace; the terminator stays with its sentence, the whitespace
    * is consumed, blank segments drop. Decimal spans like `2.0` never
    * split (no whitespace after the dot).
    *
    * Deliberately NOT `java.text.BreakIterator.getSentenceInstance`: the
    * JDK grammar treats a lowercase continuation as the SAME sentence
    * ("the cat runs. the dog sleeps" = one sentence — probed), which makes
    * it useless on lowercased web corpora; the reference's sentencizer
    * (TextBlob → NLTK punkt, wimbd/sentiment_coocurrence/map_count.py:17)
    * does split there. Stock expressions only, so the plan is pure codegen
    * and a SQL oracle can replay the rule byte-for-byte.
    */
  def sentenceSplit(c: Column): Column = {
    // mark each boundary with a U+0001 separator (never in text), then
    // split on it — RE2 has no lookbehind, so a SQL oracle replays this
    // exact two-step with chr(1)
    val sep = "\u0001"
    filter(split(regexp_replace(c, "([.!?]+[\"')\\]]*)\\s+", "$1" + sep), sep),
      s => length(s) > 0)
  }

  /** Whitespace tokenizer (for corpora known to be single-space separated;
    * cheaper than UAX-29 and exactly reproducible in ANSI SQL oracles).
    */
  def splitTokens(text: Column): Column = split(text, " ")

  /** TextBlob-grade valence over a token array → `[n_assessed, polarity]`
    * (see [[graft.functions.expressions.ValencePolarity]] for the
    * intensifier/negation semantics). The tables ship inside the
    * expression, so scoring is a zero-shuffle scan projection.
    */
  def valencePolarity(tokens: Column,
                      lexicon: Map[String, Double],
                      boosters: Map[String, Double] = Map.empty,
                      negators: Seq[String] = Nil): Column =
    e2col(ValencePolarity(col2e(tokens), lexicon.toSeq.sortBy(_._1),
      boosters.toSeq.sortBy(_._1), negators.distinct.sorted))
}
