package graft.functions.expressions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[RegexMatchOffsets]]: find all non-overlapping matches and
  * return their [start, end) offsets. Offsets are Java char (UTF-16 code
  * unit) indices — the reference reports Rust byte offsets
  * (src/cmd/search.rs:199-204); the two agree on ASCII text and this
  * divergence is documented at the operator.
  */
object RegexKernel {
  private val cache = new ConcurrentHashMap[String, Pattern]()

  private def compiled(p: UTF8String): Pattern = {
    val key = p.toString
    var pat = cache.get(key)
    if (pat == null) {
      pat = Pattern.compile(key)
      cache.putIfAbsent(key, pat)
    }
    pat
  }

  /** array<struct<start_col int, end_col int>> of every match. */
  def offsets(text: UTF8String, pattern: UTF8String): ArrayData = {
    val m = compiled(pattern).matcher(text.toString)
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    while (m.find()) rows += InternalRow(m.start(), m.end())
    new GenericArrayData(rows.toArray[Any])
  }
}

/** All regex match offsets in a string — the reference's
  * `search --with-locations` submatch records (src/cmd/search.rs:188-216)
  * as a native codegen'd expression.
  */
case class RegexMatchOffsets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_regex_offsets needs (string, string) inputs, got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("start_col", IntegerType, nullable = false),
      StructField("end_col", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_regex_offsets"

  protected override def nullSafeEval(text: Any, pattern: Any): Any =
    RegexKernel.offsets(text.asInstanceOf[UTF8String], pattern.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.expressions.RegexKernel.offsets($t, $p)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexMatchOffsets =
    copy(left = newLeft, right = newRight)
}
