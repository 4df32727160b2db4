package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ES-`match_phrase`-with-slop analogue over token arrays (reference
  * wimbd/es/__init__.py:89-184 and docstring at :149-153: a slop=1 query
  * "I like" matches "I really like", "I would like", ...).
  *
  * Two slop semantics, each its own codegen'd predicate:
  *  - [[PhraseMatchKernel.matches]] (expression [[PhraseMatch]]): phrase
  *    tokens in order, TOTAL extra tokens inserted between consecutive
  *    phrase tokens ≤ slop; slop=0 is exact adjacency (≡ n-gram equality).
  *    This is what the reference docstring examples describe.
  *  - [[PhraseMatchKernel.matchesLucene]] (expression [[PhraseMatchLucene]]):
  *    Lucene's move-distance budget — also buys transpositions (slop ≥ 2
  *    matches reversed terms), for users relying on ES/Lucene scoring
  *    semantics rather than the docstring.
  */
object PhraseMatchKernel {
  def matches(tokens: ArrayData, phrase: ArrayData, slop: Int): Boolean = {
    val n = tokens.numElements()
    val m = phrase.numElements()
    if (m == 0) return true
    if (n < m) return false
    val first = phrase.getUTF8String(0)
    var start = 0
    while (start <= n - m) {
      if (tokens.getUTF8String(start).equals(first) &&
        tryFrom(tokens, phrase, start, slop)) return true
      start += 1
    }
    false
  }

  /** Greedy-with-backtracking subsequence match anchored at `start`:
    * DP over (phrase position, gap budget) is overkill for the tiny m and
    * slop in practice — a bounded recursion is simpler and allocation-free.
    */
  private def tryFrom(tokens: ArrayData, phrase: ArrayData, start: Int, slop: Int): Boolean = {
    def rec(ti: Int, pi: Int, budget: Int): Boolean = {
      if (pi == phrase.numElements()) return true
      if (ti >= tokens.numElements()) return false
      var gap = 0
      while (gap <= budget && ti + gap < tokens.numElements()) {
        if (tokens.getUTF8String(ti + gap).equals(phrase.getUTF8String(pi)) &&
          rec(ti + gap + 1, pi + 1, budget - gap)) return true
        gap += 1
      }
      false
    }
    rec(start + 1, 1, slop)
  }

  /** Lucene-parity sloppy match (`match_phrase` slop as Lucene's
    * SloppyPhraseScorer scores it): phrase term i carries query offset i;
    * the doc matches iff there are distinct doc positions p_i with
    * token(p_i) = term_i and max(p_i - i) - min(p_i - i) ≤ slop. This is the
    * move-distance budget — slop ≥ 2 buys a transposition ("b a" matches
    * phrase "a b"), which the insertion-only [[matches]] never does.
    */
  def matchesLucene(tokens: ArrayData, phrase: ArrayData, slop: Int): Boolean = {
    val n = tokens.numElements()
    val m = phrase.numElements()
    if (m == 0) return true
    if (n < m) return false
    // doc positions per phrase term (m is tiny; n bounded by doc length)
    val pos = new Array[Array[Int]](m)
    var i = 0
    while (i < m) {
      val t = phrase.getUTF8String(i)
      var sameAs = -1
      var j = 0
      while (sameAs < 0 && j < i) {
        if (phrase.getUTF8String(j).equals(t)) sameAs = j
        j += 1
      }
      if (sameAs >= 0) pos(i) = pos(sameAs)
      else {
        val buf = new Array[Int](n)
        var len = 0
        var p = 0
        while (p < n) {
          if (tokens.getUTF8String(p).equals(t)) { buf(len) = p; len += 1 }
          p += 1
        }
        if (len == 0) return false
        pos(i) = java.util.Arrays.copyOf(buf, len)
      }
      i += 1
    }
    matchesPositions(pos, n, slop)
  }

  /** The positions-level core of [[matchesLucene]]: `pos(i)` = sorted doc
    * positions of phrase term i (duplicate phrase terms may share arrays —
    * the distinct-position constraint disambiguates), `n` = doc token
    * length. Public so the inverted-index tier can run the IDENTICAL
    * matcher on stored postings without the document in hand.
    */
  def matchesPositions(pos: Array[Array[Int]], n: Int, slop: Int): Boolean = {
    val m = pos.length
    if (m == 0) return true
    // For a window base b, term i needs an unused position in
    // [b+i, b+i+slop]. Windows shift right with i and share one length, so
    // greedy earliest-deadline (phrase order, smallest feasible position)
    // is an exact interval-matching check. Candidate bases: every p - i.
    val used = new Array[Int](m)
    var ti = 0
    while (ti < m) {
      val ps = pos(ti)
      var pi = 0
      while (pi < ps.length) {
        // adjusted position may be negative (a term matched earlier in the
        // doc than its phrase offset — exactly the transposition case)
        val b = ps(pi) - ti
        if (b > -m && b + m - 1 < n + slop) {
          var ok = true
          var k = 0
          while (ok && k < m) {
            val lo = b + k
            val hi = b + k + slop
            val cand = pos(k)
            var found = -1
            var c = 0
            while (found < 0 && c < cand.length) {
              val p = cand(c)
              if (p >= lo && p <= hi) {
                var clash = false
                var u = 0
                while (!clash && u < k) { clash = used(u) == p; u += 1 }
                if (!clash) found = p
              }
              c += 1
            }
            if (found < 0) ok = false else used(k) = found
            k += 1
          }
          if (ok) return true
        }
        pi += 1
      }
      ti += 1
    }
    false
  }
}

/** Exact token-sequence occurrence count: the reference's `count_occurences`
  * sliding-window compare (src/cmd/count.rs:191-208) — every end offset
  * tested, overlaps counted.
  */
object CountTokenSeqKernel {
  def count(tokens: ArrayData, phrase: ArrayData): Long = {
    val n = tokens.numElements()
    val m = phrase.numElements()
    if (m == 0 || m > n) return 0L
    var c = 0L
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        ok = tokens.getUTF8String(i + j).equals(phrase.getUTF8String(j))
        j += 1
      }
      if (ok) c += 1
      i += 1
    }
    c
  }
}

/** Codegen'd occurrence count of a token sequence inside a token array —
  * lets `wimbd count` run as a scan-fused scalar aggregation with no
  * n-gram explode and no join.
  */
case class CountTokenSeq(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"graft_count_seq needs (array<string>, array<string>), got (${a.sql}, ${b.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_count_seq"

  protected override def nullSafeEval(tokens: Any, phrase: Any): Any =
    CountTokenSeqKernel.count(tokens.asInstanceOf[ArrayData], phrase.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.expressions.CountTokenSeqKernel.count($t, $p)")

  protected override def withNewChildrenInternal(
      l: Expression, r: Expression): CountTokenSeq = copy(left = l, right = r)
}

/** Lucene-parity sloppy phrase predicate — see
  * [[PhraseMatchKernel.matchesLucene]]. Kept as a separate expression (not a
  * mode flag) so each stays a fixed-arity codegen'd predicate.
  */
case class PhraseMatchLucene(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_phrase_match_lucene needs (array<string>, array<string>, int), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_phrase_match_lucene"

  protected override def nullSafeEval(tokens: Any, phrase: Any, slop: Any): Any =
    PhraseMatchKernel.matchesLucene(tokens.asInstanceOf[ArrayData],
      phrase.asInstanceOf[ArrayData], slop.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, s) =>
      s"graft.functions.expressions.PhraseMatchKernel.matchesLucene($t, $p, $s)")

  protected override def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PhraseMatchLucene =
    copy(first = f, second = s, third = t)
}

case class PhraseMatch(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_phrase_match needs (array<string>, array<string>, int), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_phrase_match"

  protected override def nullSafeEval(tokens: Any, phrase: Any, slop: Any): Any =
    PhraseMatchKernel.matches(tokens.asInstanceOf[ArrayData],
      phrase.asInstanceOf[ArrayData], slop.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, s) =>
      s"graft.functions.expressions.PhraseMatchKernel.matches($t, $p, $s)")

  protected override def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PhraseMatch =
    copy(first = f, second = s, third = t)
}
