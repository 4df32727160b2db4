package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document inverted-index rows grouped INSIDE the row — one O(L) pass
  * over the token array builds term → sorted positions, so the index build
  * needs no (term, doc) shuffle at all: the only exchange left is the
  * bucketBy(term) layout write. This is the scan-stage half of what an
  * indexing engine's per-segment writer does (Lucene's in-memory postings
  * before flush), expressed as a codegen'd expression.
  */
object PostingsKernel {

  /** Growable unboxed position list (the per-term accumulator — avoids
    * Integer boxing in the corpus-scale build loop).
    */
  private final class IntList {
    private[this] var a = new Array[Int](4)
    private[this] var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
      a(n) = v; n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
  }

  /** tokens → array<struct<term, positions>>; positions ascend because the
    * single left-to-right pass appends them in order. First-occurrence term
    * order (deterministic for a given document).
    */
  def termPostings(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val order = new java.util.ArrayList[UTF8String](math.min(n, 16))
    val pos = new java.util.HashMap[UTF8String, IntList]()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var lst = pos.get(t)
        if (lst == null) {
          lst = new IntList
          pos.put(t, lst)
          order.add(t)
        }
        lst.add(i)
      }
      i += 1
    }
    val out = new Array[Any](order.size())
    i = 0
    while (i < order.size()) {
      val t = order.get(i)
      out(i) = new GenericInternalRow(
        Array[Any](t, ArrayData.toArrayData(pos.get(t).toArray)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object SlopPositionsKernel {
  /** Adapter for [[PhraseMatchKernel.matchesPositions]] over index-stored
    * postings: `posArrays(i)` = sorted positions of phrase term i (pass
    * the same arm twice for duplicated phrase terms — the matcher's
    * distinct-position constraint disambiguates), `n` = the doc's token
    * length (the in-index `dl` norm), Lucene move-distance `slop`.
    */
  def slopMatch(posArrays: ArrayData, n: Long, slop: Int): Boolean = {
    val m = posArrays.numElements()
    val pos = new Array[Array[Int]](m)
    var i = 0
    while (i < m) {
      if (posArrays.isNullAt(i)) return false
      val a = posArrays.getArray(i)
      if (a.numElements() == 0) return false
      pos(i) = a.toIntArray()
      i += 1
    }
    PhraseMatchKernel.matchesPositions(pos, n.toInt, slop)
  }
}

/** `graft_phrase_slop_positions(pos_arrays, dl, slop)` — sloppy phrase
  * containment decided from postings alone; the IDENTICAL matcher the scan
  * tier's `graft_phrase_match_lucene` runs after it derives positions from
  * the document (shared [[PhraseMatchKernel.matchesPositions]] core).
  */
case class PhraseSlopPositions(first: Expression, second: Expression,
                               third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(ArrayType(IntegerType, _), _), LongType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_phrase_slop_positions needs (array<array<int>>, bigint, int), " +
          s"got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_phrase_slop_positions"

  protected override def nullSafeEval(pos: Any, dl: Any, slop: Any): Any =
    SlopPositionsKernel.slopMatch(pos.asInstanceOf[ArrayData],
      dl.asInstanceOf[Long], slop.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, d, s) =>
      s"graft.functions.expressions.SlopPositionsKernel.slopMatch($p, $d, $s)")

  protected override def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PhraseSlopPositions =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_term_postings(tokens)` — see [[PostingsKernel.termPostings]]. */
case class TermPostings(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_term_postings needs array<string>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  override def prettyName: String = "graft_term_postings"

  protected override def nullSafeEval(input: Any): Any =
    PostingsKernel.termPostings(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PostingsKernel.termPostings($c)")

  protected override def withNewChildInternal(newChild: Expression): TermPostings =
    copy(child = newChild)
}
