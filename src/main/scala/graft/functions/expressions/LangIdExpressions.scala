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

  private val byCountDescGramAsc =
    new java.util.Comparator[java.util.Map.Entry[String, Integer]] {
      override def compare(a: java.util.Map.Entry[String, Integer],
                           b: java.util.Map.Entry[String, Integer]): Int = {
        val byCount = java.lang.Integer.compare(b.getValue, a.getValue)
        if (byCount != 0) byCount else a.getKey.compareTo(b.getKey)
      }
    }

  /** Ranked profile: top-K grams by (count desc, gram asc), rank = index+1.
    * Selection is a bounded worst-first heap (m·log K) instead of a full
    * sort (m·log m) — identical output because (count desc, gram asc) is a
    * strict total order over the map's distinct keys.
    */
  def profile(text: String, topK: Int): Array[String] = {
    val m = grams(text)
    val k = math.min(topK, m.size)
    if (k == 0) return new Array[String](0)
    val heap = new java.util.PriorityQueue[java.util.Map.Entry[String, Integer]](
      k + 1, byCountDescGramAsc.reversed())
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (heap.size < k) heap.add(e)
      else if (byCountDescGramAsc.compare(e, heap.peek()) < 0) {
        heap.poll(); heap.add(e)
      }
    }
    val out = new Array[String](k)
    var i = k - 1
    while (i >= 0) { out(i) = heap.poll().getKey; i -= 1 }
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

  /** Inverted profile index: ONE map over the union of all profile grams,
    * each entry carrying its (language, rank) postings packed as
    * `langIdx << RankBits | rank`. [[classify]] probes |langs| maps per
    * doc-profile gram (37 × 300 = 11k probes/doc for the seed model);
    * [[classifyIndexed]] probes this map once per gram and turns each
    * posting into two array adds — same integer arithmetic, same
    * first-strict-minimum tie-break, bit-identical prediction
    * (differential-tested in LangIdSpec).
    */
  final class RankIndex(profiles: Seq[(String, Seq[String])], val topK: Int) {
    /** language codes ascending — posting langIdx points here. */
    val langs: Array[String] = profiles.map(_._1).sorted.toArray
    require(langs.length.toLong << RankIndex.RankBits <= Int.MaxValue,
      s"${langs.length} languages exceed packed-lang range")
    val postings: java.util.HashMap[String, Array[Int]] = {
      val tmp = new java.util.HashMap[String, java.util.ArrayList[Integer]]()
      profiles.sortBy(_._1).zipWithIndex.foreach { case ((_, gs), li) =>
        require(gs.size < (1 << RankIndex.RankBits),
          s"profile of ${gs.size} grams exceeds packed-rank range")
        val seen = new java.util.HashSet[String]()
        // ALL profile grams rank, even past topK — rankMap's contract
        gs.zipWithIndex.foreach { case (g, i) =>
          // first occurrence wins, like rankMap's containsKey guard
          if (seen.add(g)) {
            var l = tmp.get(g)
            if (l == null) { l = new java.util.ArrayList[Integer](4); tmp.put(g, l) }
            l.add((li << RankIndex.RankBits) | (i + 1))
          }
        }
      }
      val m = new java.util.HashMap[String, Array[Int]](tmp.size() * 2)
      tmp.forEach { (g, l) =>
        val a = new Array[Int](l.size())
        var i = 0
        while (i < a.length) { a(i) = l.get(i).intValue(); i += 1 }
        m.put(g, a)
      }
      m
    }
  }
  object RankIndex { val RankBits = 12 }

  /** [[classify]] against a [[RankIndex]] — identical output, one map
    * probe per doc gram instead of one per (doc gram, language).
    */
  def classifyIndexed(text: String, idx: RankIndex): String = {
    val topK = idx.topK
    val dp = profile(text, topK)
    val nL = idx.langs.length
    if (dp.isEmpty || nL == 0) return "un"
    // every (gram, lang) pair starts at the miss penalty topK; a posting
    // retracts it and adds the out-of-place distance instead
    val d = new Array[Long](nL)
    java.util.Arrays.fill(d, dp.length.toLong * topK)
    val hits = new Array[Int](nL)
    var i = 0
    while (i < dp.length) {
      val arr = idx.postings.get(dp(i))
      if (arr != null) {
        val docRank = (i + 1).toLong
        var j = 0
        while (j < arr.length) {
          val p = arr(j)
          val li = p >>> RankIndex.RankBits
          val r = (p & ((1 << RankIndex.RankBits) - 1)).toLong
          d(li) += math.abs(docRank - r) - topK
          hits(li) += 1
          j += 1
        }
      }
      i += 1
    }
    var best = 0
    var li = 1
    while (li < nL) { if (d(li) < d(best)) best = li; li += 1 }
    if (hits(best) < MinProfileHits) "un" else idx.langs(best)
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

  @transient private lazy val index: CtKernel.RankIndex =
    new CtKernel.RankIndex(profiles, topK)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ct_langid needs a string document, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_ct_langid"

  def detect(s: UTF8String): UTF8String =
    UTF8String.fromString(CtKernel.classifyIndexed(s.toString, index))

  protected override def nullSafeEval(input: Any): Any =
    detect(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ctExpr", this, classOf[CtLangId].getName)
    defineCodeGen(ctx, ev, c => s"$ref.detect($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): CtLangId =
    copy(child = newChild)
}
