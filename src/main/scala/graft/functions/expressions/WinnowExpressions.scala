package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** Kernel for inline winnowing fingerprints (Schleimer et al., SIGMOD '03)
  * with a Karp-Rabin ROLLING hash over token hashes: shingle i+1's hash
  * derives from shingle i's in O(1), so fingerprinting a document is O(n)
  * total — one pass, no per-shingle digest, no explode, no shuffle. The
  * window minimum uses a monotonic deque (amortized O(1) per step), with
  * winnowing's rightmost-minimum tie rule.
  */
object WinnowKernel {

  private final val B = 0x100000001b3L // FNV-ish odd multiplier, mod 2^64

  /** Sorted distinct fingerprints of k-token shingles winnowed over
    * w-shingle windows; null when the doc has no full shingle window.
    */
  def fingerprints(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    val nShingles = n - k + 1
    val nWindows = nShingles - w + 1
    if (nWindows <= 0) return null

    // token content hashes
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val bytes = tokens.getUTF8String(i).getBytes
      th(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 7L)
      i += 1
    }

    // rolling shingle hashes: H_i = sum th(i+j) * B^(k-1-j)  (mod 2^64)
    var bPow = 1L // B^(k-1)
    var j = 1
    while (j < k) { bPow *= B; j += 1 }
    val sh = new Array[Long](nShingles)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + th(i); i += 1 }
    sh(0) = h
    i = 1
    while (i < nShingles) {
      h = (h - th(i - 1) * bPow) * B + th(i + k - 1)
      sh(i) = h
      i += 1
    }

    // winnow: rightmost min of each w-window via monotonic deque
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](nShingles)
    var head = 0; var tail = 0 // [head, tail) holds candidate indices
    i = 0
    while (i < nShingles) {
      while (tail > head && sh(deque(tail - 1)) >= sh(i)) tail -= 1 // ≥ keeps rightmost
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(sh(deque(head)))
      i += 1
    }

    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** Inline winnowing fingerprint set (sorted distinct array<long>) of a
  * token array — the O(n) rolling-hash scale path next to the portable
  * md5-shingle formulation in `TextQuality.winnowFingerprintCounts`.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k=$k and w=$w must be ≥ 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow needs array<string> tokens, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  protected override def nullSafeEval(tokens: Any): Any =
    WinnowKernel.fingerprints(tokens.asInstanceOf[ArrayData], k, w)

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("fps")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.expressions.WinnowKernel.fingerprints($t, $k, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  protected override def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** The PORTABLE winnow formulation as a kernel: per k-shingle hash =
  * first 8 hex chars of md5 (what the DuckDB oracle replays), w-window
  * lexicographic minima, distinct in first-occurrence order — bit-identical
  * to the `transform(ngrams(...), md5-substring)` + `array_min(slice)`
  * column cascade it replaces (which evaluated an interpreted md5 chain
  * per shingle; same lesson as the DSIR kernel, measured ~3× on the
  * winnow queries). Returns an EMPTY array when no full window exists,
  * matching the column form's `otherwise(array())`.
  */
case class WinnowMd5Fingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, s"k=$k and w=$w must be ≥ 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow_md5 needs array<string> tokens, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow_md5"

  def fps(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val nSh = n - k + 1
    val nWin = nSh - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val d = WinnowMd5Fingerprints.md5.get()
    val space = Array[Byte](' ')
    val hex = new Array[String](nSh)
    var i = 0
    while (i < nSh) {
      var j = 0
      while (j < k) {
        if (j > 0) d.update(space)
        d.update(tokens.getUTF8String(i + j).getBytes)
        j += 1
      }
      val h = d.digest() // resets for the next shingle
      val sb = new java.lang.StringBuilder(8)
      var b = 0
      while (b < 4) {
        val v = h(b) & 0xff
        sb.append(Character.forDigit(v >> 4, 16)).append(Character.forDigit(v & 0xf, 16))
        b += 1
      }
      hex(i) = sb.toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]()
    i = 0
    while (i < nWin) {
      var m = hex(i)
      var j = 1
      while (j < w) { if (hex(i + j).compareTo(m) < 0) m = hex(i + j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new GenericArrayData(out)
  }

  protected override def nullSafeEval(tokens: Any): Any =
    fps(tokens.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowMd5", this, classOf[WinnowMd5Fingerprints].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fps($c)")
  }

  protected override def withNewChildInternal(newChild: Expression): WinnowMd5Fingerprints =
    copy(child = newChild)
}

object WinnowMd5Fingerprints {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
}
