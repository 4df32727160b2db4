package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.sketch.Sketches

/** Count-min estimate against a broadcast [[Sketches.CMS]] — the codegen'd
  * replacement for `udf((s: String) => bc.value.estimate(s))` in
  * `NgramOps.topKApprox` pass 2: the probe participates in whole-stage
  * codegen (the n-gram re-stream stays one fused stage instead of breaking
  * at a ScalaUDF boundary), and the UTF8String's UTF-8 bytes feed the FNV
  * kernel directly — no per-row java.lang.String materialization. The
  * sketch hashes the same UTF-8 encoding either way, so results are
  * bit-identical to the udf this replaces. NULL keys return NULL.
  */
case class CmsEstimate(child: Expression, cms: Broadcast[Sketches.CMS])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate needs a string key, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  def estimate(s: UTF8String): Long = cms.value.estimateBytes(s.getBytes)

  protected override def nullSafeEval(input: Any): Any =
    estimate(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  // Broadcast equality token is the broadcast id (reference equality would
  // defeat plan-cache / exchange-reuse matching) — same rationale as
  // BloomMightContain.
  override def equals(other: Any): Boolean = other match {
    case e: CmsEstimate =>
      (this eq e) || (child == e.child && cms.id == e.cms.id)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(classOf[CmsEstimate], child, java.lang.Long.valueOf(cms.id))

  protected override def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
