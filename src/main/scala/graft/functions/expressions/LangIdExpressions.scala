package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Cavnar–Trenkle n-gram text categorization (the 1994 "N-Gram-Based Text
  * Categorization" algorithm) as a scan-stage kernel — the model-grade
  * replacement for the stopword-profile heuristic where the reference
  * shells out to a compiled language-ID library
  * (reference wimbd/language/map_count.py:7-49).
  *
  * Contract (shared verbatim by the DuckDB oracle, which replays BOTH
  * training and classification in SQL — see AnalysisQueries):
  *  - words = lowercase(text) split on runs of non-letters
  *    (`[^\p{L}\p{M}]+` — combining marks stay inside words, or Devanagari
  *    matras, Thai vowel signs and Arabic harakat would shred every word)
  *  - each word padded `_w_`; character n-grams n = 1..5 over the padding
  *  - a profile is the top-K grams by (count desc, gram asc) — K = 300
  *    in the classic paper, rank 1-based
  *  - out-of-place distance: Σ over doc-profile grams of |docRank −
  *    langRank|, K where the gram is absent from the language profile
  *  - prediction = argmin distance, ties broken language-code ascending;
  *    `un` when the document yields no grams at all
  *
  * All strings here are BMP-safe: java.lang.String UTF-16 ordering, DuckDB
  * UTF-8 binary ordering and Spark UTF8String ordering agree on BMP code
  * points, which the embedded seed texts are restricted to.
  */
object CtKernel {
  val MaxN = 5
  val DefaultTopK = 300

  private val splitter = java.util.regex.Pattern.compile("[^\\p{L}\\p{M}]+")

  /** Padded char n-gram counts of a document. */
  def grams(text: String): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val words = splitter.split(text.toLowerCase(java.util.Locale.ROOT))
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        val pw = "_" + w + "_"
        var n = 1
        while (n <= MaxN) {
          var i = 0
          val last = pw.length - n
          while (i <= last) {
            val g = pw.substring(i, i + n)
            val c = m.get(g)
            m.put(g, if (c == null) 1 else c + 1)
            i += 1
          }
          n += 1
        }
      }
      wi += 1
    }
    m
  }

  /** Ranked profile: top-K grams by (count desc, gram asc), rank = index+1. */
  def profile(text: String, topK: Int): Array[String] = {
    val m = grams(text)
    val entries = new java.util.ArrayList[java.util.Map.Entry[String, Integer]](m.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Integer]] {
        override def compare(a: java.util.Map.Entry[String, Integer],
                             b: java.util.Map.Entry[String, Integer]): Int = {
          val byCount = java.lang.Integer.compare(b.getValue, a.getValue)
          if (byCount != 0) byCount else a.getKey.compareTo(b.getKey)
        }
      })
    val k = math.min(topK, entries.size)
    val out = new Array[String](k)
    var i = 0
    while (i < k) { out(i) = entries.get(i).getKey; i += 1 }
    out
  }

  /** gram → 1-based rank lookup for a trained profile. */
  def rankMap(profileGrams: Seq[String]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](profileGrams.size * 2)
    profileGrams.zipWithIndex.foreach { case (g, i) =>
      if (!m.containsKey(g)) m.put(g, i + 1)
    }
    m
  }

  /** Reliability floor: the winning profile must share MORE than just the
    * `_` word-boundary gram with the document (≥ this many hits), else the
    * detection reports `un` — the analogue of pycld2's unreliable flag,
    * which the reference maps to `un`
    * (wimbd/language/map_count.py:16-24). Text in a script no profile
    * covers matches only the boundary gram and lands here; any genuine
    * (even distant) same-script match shares real grams.
    */
  val MinProfileHits = 2

  /** argmin out-of-place distance; `ranks` must be sorted by language code
    * (first minimum wins = ascending tie-break). "un" when no grams, or
    * when the winner is unreliable (see [[MinProfileHits]]).
    */
  def classify(text: String,
               ranks: Array[(String, java.util.HashMap[String, Integer])],
               topK: Int): String = {
    val dp = profile(text, topK)
    if (dp.isEmpty || ranks.isEmpty) return "un"
    var bestLang: String = null
    var bestD = Long.MaxValue
    var bestHits = 0
    var li = 0
    while (li < ranks.length) {
      val (lang, rm) = ranks(li)
      var d = 0L
      var hits = 0
      var i = 0
      while (i < dp.length) {
        val r = rm.get(dp(i))
        if (r == null) d += topK.toLong
        else { d += math.abs((i + 1).toLong - r.longValue()); hits += 1 }
        i += 1
      }
      if (d < bestD) { bestD = d; bestLang = lang; bestHits = hits }
      li += 1
    }
    if (bestHits < MinProfileHits) "un" else bestLang
  }
}

/** string → predicted language code under profiles shipped inside the
  * expression (the UnigramLogProbInline pattern: the model is plan state,
  * so scoring is a zero-shuffle codegen'd scan projection usable in
  * Structured Streaming gates too).
  */
case class CtLangId(child: Expression,
                    profiles: Seq[(String, Seq[String])],
                    topK: Int = CtKernel.DefaultTopK)
    extends UnaryExpression {

  @transient private lazy val ranks: Array[(String, java.util.HashMap[String, Integer])] =
    profiles.sortBy(_._1).map { case (lang, gs) => (lang, CtKernel.rankMap(gs)) }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ct_langid needs a string document, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ct_langid"

  def detect(s: UTF8String): UTF8String =
    UTF8String.fromString(CtKernel.classify(s.toString, ranks, topK))

  protected override def nullSafeEval(input: Any): Any =
    detect(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ctExpr", this, classOf[CtLangId].getName)
    defineCodeGen(ctx, ev, c => s"$ref.detect($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): CtLangId =
    copy(child = newChild)
}
