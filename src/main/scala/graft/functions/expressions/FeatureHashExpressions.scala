package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for inline feature-hash document embeddings (the hashing trick,
  * Weinberger et al. 2009): each token OCCURRENCE votes ±1 into bucket
  * hash(token) mod dim, so the result is a signed, tf-weighted d-dim
  * bag-of-words projection computed in ONE pass over the token array — a
  * scan-fused projection like [[SimHashKernel]] (SimHash is exactly this
  * with dim buckets replaced by per-bit votes). The unbiased-sign trick
  * makes inner products of the hashed vectors unbiased estimates of the
  * original bag-of-words inner products, which is what lets the embedding
  * tier
  * (cosine near-dup, ANN, PCA, SemDeDup) run on text-only corpora with
  * no model in the loop.
  */
object FeatureHashKernel {

  /** md5 variant (oracle-portable): bucket = the first 4 hex digits of
    * md5(token) as an integer, mod dim (dim ≤ 65536); sign = high bit of
    * hex digit 5 (digit ∈ 8..f ⇒ +1). Bit-identical to the SQL
    * formulation `conv(substring(md5(w),1,4),16,10) % dim` +
    * `substring(md5(w),5,1) in (8..f)`.
    */
  def embedMd5(tokens: ArrayData, dim: Int): ArrayData = {
    val v = new Array[Double](dim)
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      md.reset()
      val digest = md.digest(
        tokens.getUTF8String(t).toString.getBytes(StandardCharsets.UTF_8))
      val h16 = ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
      v(h16 % dim) += (if ((digest(2) & 0x80) != 0) 1.0 else -1.0)
      t += 1
    }
    new GenericArrayData(v)
  }

  /** xxhash64 variant (production): bucket = floorMod(XXH64(bytes, 42),
    * dim), sign = the hash's top bit — the same hash family the MinHash /
    * SimHash production strategies use, pure long arithmetic.
    */
  def embedXx(tokens: ArrayData, dim: Int): ArrayData = {
    val v = new Array[Double](dim)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val bytes = tokens.getUTF8String(t).getBytes
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L)
      v(java.lang.Math.floorMod(h, dim.toLong).toInt) +=
        (if ((h >>> 63) == 1L) 1.0 else -1.0)
      t += 1
    }
    new GenericArrayData(v)
  }
}

/** Inline signed feature-hash embedding of a token array →
  * array<double> of length `dim`; `md5Parity` selects the
  * oracle-reproducible md5 hash vs the xxhash64 production hash.
  */
case class HashedEmbedding(child: Expression, dim: Int, md5Parity: Boolean)
    extends UnaryExpression {

  require(dim >= 1 && dim <= 65536, s"dim $dim out of range 1..65536")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_feature_hash needs array<string> tokens, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_feature_hash"

  protected override def nullSafeEval(tokens: Any): Any =
    if (md5Parity) FeatureHashKernel.embedMd5(tokens.asInstanceOf[ArrayData], dim)
    else FeatureHashKernel.embedXx(tokens.asInstanceOf[ArrayData], dim)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (md5Parity) "embedMd5" else "embedXx"
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.FeatureHashKernel.$fn($t, $dim)")
  }

  protected override def withNewChildInternal(newChild: Expression): HashedEmbedding =
    copy(child = newChild)
}
