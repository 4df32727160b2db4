package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for inline SimHash fingerprints: per-document bit votes summed in
  * one pass over the token array — no token explode, no nBits-column sum
  * aggregation, no shuffle. Like [[MinHashKernel]], this turns the
  * fingerprint step into an embarrassingly parallel scan projection.
  */
object SimHashKernel {

  /** md5-parity fingerprint (nBits ≤ 32): bit j votes +1 iff the j-th hex
    * digit of md5(token) has its high bit set — bit-identical to the
    * portable SQL formulation ([[graft.operators.SimHash.md5HexBit]]).
    */
  def simhashMd5(tokens: ArrayData, nBits: Int): UTF8String = {
    val sums = new Array[Int](nBits)
    val md = MessageDigest.getInstance("MD5")
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      md.reset()
      val digest = md.digest(tokens.getUTF8String(t).toString.getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < nBits) {
        val nibble = if (j % 2 == 0) (digest(j / 2) >> 4) & 0xf else digest(j / 2) & 0xf
        sums(j) += (if (nibble >= 8) 1 else -1)
        j += 1
      }
      t += 1
    }
    bitString(sums)
  }

  /** xxhash64 fingerprint (nBits ≤ 64): bit j of XXH64(token bytes, seed 42)
    * — the same hash Spark's `xxhash64` computes, so results match the
    * column formulation ([[graft.operators.SimHash.xxhashBit]]) bit for bit.
    */
  def simhashXx(tokens: ArrayData, nBits: Int): UTF8String = {
    val sums = new Array[Int](nBits)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val bytes = tokens.getUTF8String(t).getBytes
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      var j = 0
      while (j < nBits) {
        sums(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    bitString(sums)
  }

  private def bitString(sums: Array[Int]): UTF8String = {
    val chars = new Array[Byte](sums.length)
    var j = 0
    while (j < sums.length) {
      chars(j) = if (sums(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(chars)
  }
}

/** Inline SimHash fingerprint over a token array, as an nBits-char '0'/'1'
  * string; `md5Parity` selects the oracle-reproducible md5 bit source vs
  * the 64-bit xxhash64 production source.
  */
case class SimHashFingerprint(child: Expression, nBits: Int, md5Parity: Boolean)
    extends UnaryExpression {

  require(nBits <= (if (md5Parity) 32 else 64),
    s"nBits $nBits exceeds the ${if (md5Parity) "md5 hex" else "xxhash64"} bit budget")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs array<string> tokens, got ${t.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash"

  protected override def nullSafeEval(tokens: Any): Any =
    if (md5Parity) SimHashKernel.simhashMd5(tokens.asInstanceOf[ArrayData], nBits)
    else SimHashKernel.simhashXx(tokens.asInstanceOf[ArrayData], nBits)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (md5Parity) "simhashMd5" else "simhashXx"
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.expressions.SimHashKernel.$fn($t, $nBits)")
  }

  protected override def withNewChildInternal(newChild: Expression): SimHashFingerprint =
    copy(child = newChild)
}
