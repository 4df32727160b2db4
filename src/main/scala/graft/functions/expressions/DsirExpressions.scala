package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared DSIR hashed-feature kernel: the gram stream of a token array is
  * its unigrams followed by its adjacent bigrams (joined with one space),
  * and each gram's bucket is the first 4 bytes of its md5, read as an
  * unsigned 32-bit big-endian integer, mod `buckets` — bit-identical to
  * the portable column formulation `conv(substring(md5(g), 1, 8), 16, 10)
  * % buckets` that the DuckDB oracle replays, but evaluated in one tight
  * JVM loop instead of an interpreted higher-order fold (measured ~4×
  * faster end-to-end on the DSIR pipeline).
  */
private[expressions] object DsirKernel {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private val space = Array[Byte](' ')

  private def digestBucket(d: java.security.MessageDigest, buckets: Int): Long = {
    val h = d.digest() // digest() resets the instance for the next gram
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    u % buckets
  }

  /** The gram-bucket stream: unigram buckets then bigram buckets — the
    * exact fold order of `concat(tokens, bigrams)`.
    */
  def bucketStream(tokens: ArrayData, buckets: Int): Array[Long] = {
    val d = md5.get()
    val n = tokens.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { bytes(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val out = new Array[Long](if (n > 1) 2 * n - 1 else n)
    i = 0
    while (i < n) {
      d.update(bytes(i))
      out(i) = digestBucket(d, buckets)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      d.update(bytes(i)); d.update(space); d.update(bytes(i + 1))
      out(n + i) = digestBucket(d, buckets)
      i += 1
    }
    out
  }
}

/** Per-document DSIR importance log-weight: Σ over the gram stream of the
  * bucket's log ratio, ratio table shipped inside the expression. The
  * summation order (unigrams then bigrams, left to right) matches the
  * `aggregate` fold it replaces, so results are bit-identical.
  */
case class DsirWeightInline(child: Expression, ratios: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val table: Array[Double] = ratios.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dsir_weight needs array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dsir_weight"

  def weight(tokens: ArrayData): Double = {
    val stream = DsirKernel.bucketStream(tokens, table.length)
    var sum = 0.0
    var i = 0
    while (i < stream.length) { sum += table(stream(i).toInt); i += 1 }
    sum
  }

  protected override def nullSafeEval(input: Any): Any =
    weight(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirW", this, classOf[DsirWeightInline].getName)
    defineCodeGen(ctx, ev, c => s"$ref.weight($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): DsirWeightInline =
    copy(child = newChild)
}

/** The per-document gram-bucket stream as `array<long>` — the histogram
  * side of DSIR: explode this (8-byte longs, not gram strings) and count.
  */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dsir_buckets needs array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  def stream(tokens: ArrayData): ArrayData =
    new GenericArrayData(DsirKernel.bucketStream(tokens, buckets))

  protected override def nullSafeEval(input: Any): Any =
    stream(input.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirB", this, classOf[DsirBuckets].getName)
    defineCodeGen(ctx, ev, c => s"$ref.stream($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}
