package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document mean unigram log-probability under a PRUNED language model
  * shipped inside the expression (like BPE's merge table): `[n_scored,
  * avg_logp]` over the tokens present in the vocabulary, OOV tokens
  * excluded from the mean — the same contract as the join-based
  * `TextQuality.unigramLogProb`, evaluated entirely in the scan stage.
  *
  * Why it exists: the join formulation is right when the vocabulary is
  * unbounded, but a top-V pruned model (CCNet prunes its KenLM the same
  * way) is a few MB — shipping it in the plan turns LM scoring into a
  * zero-shuffle projection, which is also what makes it usable in
  * Structured Streaming gates (no stream-side aggregation state at all).
  */
case class UnigramLogProbInline(child: Expression,
                                vocab: Seq[(String, Long)], total: Long)
    extends UnaryExpression {

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](vocab.size * 2)
    val n = total.toDouble
    vocab.foreach { case (w, c) =>
      m.put(UTF8String.fromString(w), math.log(c / n))
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_logprob needs array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_unigram_logprob"

  def score(tokens: ArrayData): ArrayData = {
    var sum = 0.0
    var n = 0
    var i = 0
    val len = tokens.numElements()
    while (i < len) {
      val lp = table.get(tokens.getUTF8String(i))
      if (lp != null) { sum += lp.doubleValue(); n += 1 }
      i += 1
    }
    new GenericArrayData(Array[Any](n.toDouble, if (n == 0) 0.0 else sum / n))
  }

  protected override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmExpr", this, classOf[UnigramLogProbInline].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): UnigramLogProbInline =
    copy(child = newChild)
}
