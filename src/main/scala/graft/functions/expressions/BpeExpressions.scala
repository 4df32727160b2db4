package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Bpe

/** BPE-encode a string into subword tokens under a trained merge list.
  * The merge table rides inside the expression (static parameter, like
  * MinHash's k): executors get it with the serialized plan, and codegen
  * references the compiled table directly — no per-row setup, no UDF
  * serialization overhead on the hot path.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val table = new Bpe.MergeTable(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  protected override def nullSafeEval(input: Any): Any =
    table.encodeUtf8(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[Bpe.MergeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeUtf8($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
