package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a broadcast Bloom filter — the codegen'd
  * replacement for the `udf((s: String) => bc.value.mightContainString(s))`
  * black box: the probe now participates in whole-stage codegen, so a
  * Bloom-decontaminated scan stays one fused stage instead of breaking at
  * a ScalaUDF boundary (and the UTF8String's bytes feed the filter
  * directly — no per-row java.lang.String materialization).
  *
  * `mightContainBinary` over the UTF-8 bytes is bit-identical to
  * `mightContainString` (which hashes the same UTF-8 encoding), so
  * results match the udf it replaces exactly. NULL keys return NULL,
  * like any unary expression — callers decide the NULL policy (the
  * decontaminate caller keeps NULL-keyed rows, matching the old
  * `s != null && …` udf under `!`-negation… see Dedup.decontaminateApprox).
  */
case class BloomMightContain(child: Expression, filter: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain needs a string key, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  def contains(s: UTF8String): Boolean =
    filter.value.mightContainBinary(s.getBytes)

  protected override def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  // Broadcast has reference equality only, so the derived case-class
  // equals would never let two semantically identical probes compare (or
  // canonicalize) equal — defeating plan-cache and exchange-reuse matching
  // across separate decontaminateApprox calls. The broadcast id identifies
  // the immutable broadcast value within one SparkContext, so it is the
  // right equality token; two broadcasts of bit-identical filter contents
  // still compare unequal (a missed reuse, never a correctness issue), and
  // cross-context comparison is out of scope.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      (this eq b) || (child == b.child && filter.id == b.filter.id)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[BloomMightContain], child,
      java.lang.Long.valueOf(filter.id))

  protected override def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
