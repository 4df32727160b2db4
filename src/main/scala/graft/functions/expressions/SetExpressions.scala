package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `|distinct(a) ∩ distinct(b)|` for string arrays without materializing the
  * intersection array — value-identical to `size(array_intersect(a, b))`,
  * which builds (hash set + ArrayData + copy) only to count it. This is the
  * hot kernel of near-dup Jaccard verification, where both sides are
  * per-document shingle arrays.
  */
object IntersectionSizeKernel {
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    val set = new java.util.HashSet[UTF8String](n * 2)
    var smallHasNull = false
    var i = 0
    while (i < n) {
      if (small.isNullAt(i)) smallHasNull = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var c = 0
    var nullCounted = false
    val m = large.numElements()
    i = 0
    while (i < m) {
      if (large.isNullAt(i)) {
        if (smallHasNull && !nullCounted) { c += 1; nullCounted = true }
      } else if (set.remove(large.getUTF8String(i))) c += 1 // remove ⇒ distinct
      i += 1
    }
    c
  }
}

case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"graft_intersect_size needs (array<string>, array<string>), got (${a.sql}, ${b.sql})")
  }

  // IntegerType on purpose: drop-in for size(array_intersect(...))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_size"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    IntersectionSizeKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.IntersectionSizeKernel.count($a, $b)")

  protected override def withNewChildrenInternal(
      l: Expression, r: Expression): IntersectionSize = copy(left = l, right = r)
}

/** Optimizer rewrite: `size(array_intersect(a, b))` over string arrays →
  * [[IntersectionSize]], skipping the intermediate array. Applies only in
  * non-legacy size semantics (`size(null)` = null on both shapes then).
  * Injected by [[graft.GraftExtensions]].
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {
  private def isStringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Size(ArrayIntersect(l, r), false) if isStringArray(l) && isStringArray(r) =>
      IntersectionSize(l, r)
  }
}
