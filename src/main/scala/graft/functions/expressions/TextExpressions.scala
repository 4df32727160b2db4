package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Tokenizer

/** UAX-29 tokenize as a native Catalyst expression (codegen-friendly: the
  * generated Java calls the static kernel directly). Semantics: reference
  * src/tokens.rs:8-17.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokenize needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  protected override def nullSafeEval(input: Any): Any =
    Tokenizer.tokenizeUtf8(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenizer.tokenizeUtf8($c)")

  protected override def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Sliding-window n-grams over a token array, each joined with a single
  * space. Full windows only (reference src/ngrams/mod.rs:83-112).
  */
case class NGramsJoined(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams needs (array<string>, int) inputs, got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  protected override def nullSafeEval(tokens: Any, n: Any): Any =
    Tokenizer.ngramsJoinedUtf8(tokens.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.Tokenizer.ngramsJoinedUtf8($t, $n)")

  protected override def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NGramsJoined =
    copy(left = newLeft, right = newRight)
}

/** Unicode normalization repair pass (NFC/NFKC + line endings + space and
  * zero-width cleanup) — semantics in [[graft.functions.TextNorm]]. Runs
  * as a codegen'd scan-stage projection: the static kernel call keeps the
  * whole normalize→tokenize→hash chain inside WholeStageCodegen.
  */
case class NormalizeText(child: Expression, nfkc: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  protected override def nullSafeEval(input: Any): Any =
    graft.functions.TextNorm.normalizeUtf8(input.asInstanceOf[UTF8String], nfkc)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNorm.normalizeUtf8($c, $nfkc)")

  protected override def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** Mojibake repair (UTF-8 mis-decoded as cp1252/latin-1) — semantics and
  * guards in [[graft.functions.Mojibake]]; the reference's mC4 prep runs
  * ftfy per document for the same repair (preparation/mc4/mc4.py:11,69).
  * Codegen'd scan-stage projection like [[NormalizeText]]; run it BEFORE
  * graft_normalize (which strips the C1-control evidence).
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fix_mojibake needs a string input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  protected override def nullSafeEval(input: Any): Any =
    graft.functions.Mojibake.fixUtf8(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Mojibake.fixUtf8($c)")

  protected override def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}
