package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BLAKE2b-512 (RFC 7693) — the hash the reference derives Elasticsearch
  * document ids from: `hashlib.blake2b(url.strip().encode("UTF8"))
  * .hexdigest()` (reference ELASTIC.md:120-125, and C4/LAION id recovery
  * throughout its ES docs). The JDK has no BLAKE2, so the permutation is
  * implemented here from the RFC; golden vectors in Blake2bSpec pin it
  * against `hashlib.blake2b` outputs.
  */
object Blake2bKernel {

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  // message schedule (RFC 7693 §2.7); rounds 10/11 reuse rows 0/1
  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
                       t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t        // low word of the offset counter; high word stays 0
    if (last) v(14) = ~v(14)

    @inline def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) += v(b) + x; v(d) = rotr(v(d) ^ v(a), 32)
      v(c) += v(d); v(b) = rotr(v(b) ^ v(c), 24)
      v(a) += v(b) + y; v(d) = rotr(v(d) ^ v(a), 16)
      v(c) += v(d); v(b) = rotr(v(b) ^ v(c), 63)
    }

    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Unkeyed BLAKE2b with `outLen` output bytes (1..64; hashlib default 64). */
  def hash(input: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64, s"blake2b digest size $outLen")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong // depth 1, fanout 1, no key
    val n = input.length
    var off = 0
    // full blocks except the last (an empty message still compresses once)
    while (n - off > 128) {
      compress(h, input, off, off + 128L, last = false)
      off += 128
    }
    val lastBlock = new Array[Byte](128)
    System.arraycopy(input, off, lastBlock, 0, n - off)
    compress(h, lastBlock, 0, n.toLong, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Python-parity ES doc id: `hashlib.blake2b(s.strip().encode("UTF8"))
    * .hexdigest()`. The strip matches `str.strip()`'s unicode-whitespace
    * set (Java's isWhitespace ∪ isSpaceChar ∪ U+0085, which Python treats
    * as whitespace but Java classifies as neither).
    */
  def esDocId(s: UTF8String): UTF8String = {
    val str = s.toString
    var from = 0
    var to = str.length
    @inline def isWs(c: Char): Boolean =
      Character.isWhitespace(c) || Character.isSpaceChar(c) || c == '\u0085'
    while (from < to && isWs(str.charAt(from))) from += 1
    while (to > from && isWs(str.charAt(to - 1))) to -= 1
    val bytes = str.substring(from, to)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val digest = hash(bytes, 64)
    val hex = new Array[Char](128)
    var i = 0
    while (i < 64) {
      hex(2 * i) = HEX((digest(i) >> 4) & 0xf)
      hex(2 * i + 1) = HEX(digest(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }
}

/** `graft_blake2b_es_id(url)` — see [[Blake2bKernel.esDocId]]. */
case class Blake2bEsId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_blake2b_es_id needs string, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_blake2b_es_id"

  protected override def nullSafeEval(input: Any): Any =
    Blake2bKernel.esDocId(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.Blake2bKernel.esDocId($c)")

  protected override def withNewChildInternal(newChild: Expression): Blake2bEsId =
    copy(child = newChild)
}
