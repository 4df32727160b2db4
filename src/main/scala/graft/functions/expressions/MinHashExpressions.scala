package graft.functions.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for inline MinHash signatures: the k min-hash values of a
  * document's w-token shingle set computed in ONE pass over the token
  * array — no shingle explode, no groupBy shuffle. The signature step of
  * LSH dedup becomes an embarrassingly parallel scan projection, which is
  * the shape you want when the corpus is 100 TB: the only remaining
  * shuffle in candidate generation is the (tiny) band-bucket aggregation.
  */
object MinHashKernel {

  private val hex = "0123456789abcdef".toCharArray

  /** md5-parity signature: value i is the lexicographic min over shingles
    * of substring(md5((i/4) + ":" + shingle), (i%4)*8, 8) — bit-identical
    * to the portable SQL formulation ([[graft.operators.MinHash.md5Strategy]])
    * so the DuckDB oracle reproduces it. Returns null when the doc has no
    * full window (matches the groupBy formulation, where the doc emits no
    * row).
    */
  def sigMd5(tokens: ArrayData, w: Int, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return null
    val groups = (k + 3) / 4
    val mins = new Array[String](k)
    val md = MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    var start = 0
    while (start <= n - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(start + j).toString)
        j += 1
      }
      val shingle = sb.toString
      var g = 0
      while (g < groups) {
        md.reset()
        md.update(String.valueOf(g).getBytes(StandardCharsets.UTF_8))
        md.update(':'.toByte)
        md.update(shingle.getBytes(StandardCharsets.UTF_8))
        val digest = md.digest()
        val hexChars = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hexChars(2 * b) = hex((digest(b) >> 4) & 0xf)
          hexChars(2 * b + 1) = hex(digest(b) & 0xf)
          b += 1
        }
        val full = new String(hexChars)
        var i = g * 4
        val hi = math.min(g * 4 + 4, k)
        while (i < hi) {
          val part = full.substring((i % 4) * 8, (i % 4) * 8 + 8)
          if (mins(i) == null || part.compareTo(mins(i)) < 0) mins(i) = part
          i += 1
        }
        g += 1
      }
      start += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  /** xxhash64-based signature for the production path: value i is the min
    * over shingles of XXH64(shingle bytes, seed = i). 8-byte hashes, no
    * digest allocation — the fast default when cross-engine reproducibility
    * isn't required (it is still deterministic).
    */
  def sigXx(tokens: ArrayData, w: Int, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var start = 0
    while (start <= n - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(start + j).toString)
        j += 1
      }
      val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
      var i = 0
      while (i < k) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, i)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      start += 1
    }
    new GenericArrayData(mins)
  }
}

/** Inline MinHash signature over a token array; `md5Parity` selects the
  * portable md5 hash family (array&lt;string&gt;, oracle-reproducible) vs
  * the xxhash64 family (array&lt;long&gt;, production).
  */
case class MinHashSignature(child: Expression, w: Int, k: Int, md5Parity: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs array<string> tokens, got ${t.sql}")
  }
  override def dataType: DataType =
    if (md5Parity) ArrayType(StringType, containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  protected override def nullSafeEval(tokens: Any): Any =
    if (md5Parity) MinHashKernel.sigMd5(tokens.asInstanceOf[ArrayData], w, k)
    else MinHashKernel.sigXx(tokens.asInstanceOf[ArrayData], w, k)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (md5Parity) "sigMd5" else "sigXx"
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("sig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.expressions.MinHashKernel.$fn($t, $w, $k);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  protected override def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
