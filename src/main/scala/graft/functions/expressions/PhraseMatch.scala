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
  * Semantics implemented: the phrase tokens must appear in order, with the
  * TOTAL number of extra tokens inserted between consecutive phrase tokens
  * ≤ slop. slop=0 is exact adjacency (≡ n-gram equality). Divergence from
  * Lucene documented: Lucene's slop is an edit-distance-style move budget
  * that also buys transpositions (slop ≥ 2 can match reversed terms); this
  * implementation is insertion-only.
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
