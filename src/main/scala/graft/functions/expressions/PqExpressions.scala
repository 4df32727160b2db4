package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encode as ONE tight-loop kernel (Jégou et al.
  * 2011): per subspace j, the argmin-L2 centroid over the codebook, plus
  * the decoded (reconstructed) vector for asymmetric-distance scoring.
  *
  * This replaces a nested higher-order-function formulation
  * (`transform(sequence, transform(sequence, aggregate(...)))`) that
  * Catalyst evaluates INTERPRETED per row — m×K×sub boxed lambda
  * evaluations each — with primitive-array loops in the same accumulation
  * order: diff² summed over i ascending, candidates scanned c ascending
  * with a strict `<`, so ties break to the LOWER code and every double is
  * bit-identical to the HOF version and to the DuckDB oracle replay
  * (`ann_pq_topk` / `ann_ivfpq_topk` hash-match on exactly this
  * arithmetic).
  */
object PqKernel {

  /** Returns struct(codes: array<int>, decoded: array<double>), or null
    * when the vector is null, shorter than m×sub, or has null elements.
    */
  def encode(v: ArrayData, cb: Array[Array[Array[Double]]]): InternalRow = {
    if (v == null) return null
    val m = cb.length
    val sub = cb(0)(0).length
    if (v.numElements() < m * sub) return null
    val k = cb(0).length
    val codes = new Array[Int](m)
    val dec = new Array[Double](m * sub)
    var j = 0
    while (j < m) {
      val cands = cb(j)
      var best = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val cent = cands(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          if (v.isNullAt(j * sub + i)) return null
          val diff = v.getDouble(j * sub + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      System.arraycopy(cands(best), 0, dec, j * sub, sub)
      j += 1
    }
    InternalRow(
      new GenericArrayData(codes.map(c => c: Any)),
      new GenericArrayData(dec.map(x => x: Any)))
  }
}

/** `graft_pq_encode(vec)` with a plan-embedded codebook: one codegen'd
  * kernel call per row instead of an interpreted HOF tree. The codebook
  * rides along as a reference object (same pattern as the BPE merge table
  * and Cavnar–Trenkle profiles), so executors receive it with the
  * serialized plan — no join, no shuffle, no broadcast variable to manage.
  */
case class PqEncodeDecode(child: Expression,
                          codebook: Array[Array[Array[Double]]])
  extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "empty PQ codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode needs array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false)),
    StructField("decoded", ArrayType(DoubleType, containsNull = false))))

  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  def encodeRow(v: ArrayData): InternalRow = PqKernel.encode(v, codebook)

  protected override def nullSafeEval(v: Any): Any =
    encodeRow(v.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqExpr", this, classOf[PqEncodeDecode].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("pqRow")
      s"""
         |InternalRow $r = $ref.encodeRow($v);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  protected override def withNewChildInternal(newChild: Expression): PqEncodeDecode =
    copy(child = newChild)
}
