package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TextBlob-grade valence scoring of a token array: `[n_assessed,
  * polarity]` where polarity is the mean MODIFIED valence over the tokens
  * that carry a lexicon entry (the reference's TextBlob averages over its
  * "assessments", not over all tokens —
  * wimbd/sentiment_coocurrence/map_count.py:17-40), 0.0 when none do.
  *
  * Modifier semantics, chosen to be exactly replayable in ANSI SQL (the
  * p9 oracles rebuild them with prev-token self-joins):
  *  - intensifiers: the nearest PRECEDING booster scales the valence — at
  *    distance 1 by its full multiplier `b`, at distance 2 dampened to
  *    `1 + (b-1)*0.95` (TextBlob applies its modifier chain the same way;
  *    the 0.95 decay is VADER's published distance damping);
  *  - negation: any negator within the 3 preceding tokens flips and
  *    dampens the valence by -0.5 (TextBlob's negation factor);
  *  - the modified valence is clamped to [-1, 1].
  *
  * The lexicon/booster/negator tables ship inside the expression (like the
  * BPE merge table and the CT language profiles), so scoring is a
  * zero-shuffle scan projection that stays inside whole-stage codegen.
  */
case class ValencePolarity(child: Expression,
                           lexicon: Seq[(String, Double)],
                           boosters: Seq[(String, Double)],
                           negators: Seq[String])
    extends UnaryExpression {

  @transient private lazy val lex: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](lexicon.size * 2)
    lexicon.foreach { case (w, v) => m.put(UTF8String.fromString(w), v) }
    m
  }
  @transient private lazy val boost: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](boosters.size * 2)
    boosters.foreach { case (w, b) => m.put(UTF8String.fromString(w), b) }
    m
  }
  @transient private lazy val negSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](negators.size * 2)
    negators.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_valence needs array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_valence"

  def score(tokens: ArrayData): ArrayData = {
    val len = tokens.numElements()
    var sum = 0.0
    var n = 0
    var i = 0
    while (i < len) {
      val v = lex.get(tokens.getUTF8String(i))
      if (v != null) {
        var mod = 1.0
        if (i >= 1) {
          val b1 = boost.get(tokens.getUTF8String(i - 1))
          if (b1 != null) mod = b1.doubleValue()
          else if (i >= 2) {
            val b2 = boost.get(tokens.getUTF8String(i - 2))
            if (b2 != null) {
              mod = 1.0 + (b2.doubleValue() - 1.0) * ValencePolarity.BoosterDecay
            }
          }
        }
        var negated = false
        var j = i - 1
        val lo = math.max(0, i - ValencePolarity.NegationWindow)
        while (j >= lo && !negated) {
          if (negSet.contains(tokens.getUTF8String(j))) negated = true
          j -= 1
        }
        val s = (v.doubleValue() * mod) *
          (if (negated) ValencePolarity.NegationFactor else 1.0)
        sum += math.max(-1.0, math.min(1.0, s))
        n += 1
      }
      i += 1
    }
    new GenericArrayData(Array[Any](n.toDouble, if (n == 0) 0.0 else sum / n))
  }

  protected override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("valenceExpr", this, classOf[ValencePolarity].getName)
    defineCodeGen(ctx, ev, c => s"$ref.score($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): ValencePolarity =
    copy(child = newChild)
}

object ValencePolarity {
  /** TextBlob's negation multiplier. */
  val NegationFactor: Double = -0.5
  /** VADER's per-step distance damping for a booster one token removed. */
  val BoosterDecay: Double = 0.95
  /** How many preceding tokens a negator reaches across. */
  val NegationWindow: Int = 3
}
