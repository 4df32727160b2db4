package graft.functions

import java.text.BreakIterator
import java.util.Locale

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** UAX-29 word segmentation with the same observable semantics as the
  * reference's unicode tokenizer (reference: src/tokens.rs:8-17): split on
  * Unicode word boundaries and keep every segment containing at least one
  * non-whitespace character. Punctuation segments survive as their own
  * tokens and decimal-number spans like "2.0" stay a single token
  * (golden vector: reference src/tokens.rs:56-76).
  *
  * The UTF8String entry points are static-forwarder friendly so generated
  * whole-stage-codegen Java can call them directly (no boxing, no UDF).
  */
object Tokenizer {

  // BreakIterator is mutable and not thread-safe; one instance per task thread.
  private val local = new ThreadLocal[BreakIterator] {
    override def initialValue(): BreakIterator =
      BreakIterator.getWordInstance(Locale.ROOT)
  }

  def tokenize(s: String): Array[String] = {
    if (s == null) return null
    val bi = local.get()
    bi.setText(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      if (!isBlankRange(s, start, end)) out += s.substring(start, end)
      start = end
      end = bi.next()
    }
    out.toArray
  }

  private def isBlankRange(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      if (!Character.isWhitespace(cp)) return false
      i += Character.charCount(cp)
    }
    true
  }

  /** Sliding n-gram windows over a token array (reference:
    * src/ngrams/mod.rs:83-112 — full windows only; fewer than n tokens
    * yields zero n-grams).
    */
  def ngrams(tokens: Array[String], n: Int): Array[Array[String]] = {
    if (tokens == null) return null
    val count = if (tokens.length >= n) tokens.length - n + 1 else 0
    Array.tabulate(count)(i => java.util.Arrays.copyOfRange(tokens, i, i + n))
  }

  // ---- codegen entry points (UTF8String / ArrayData in and out) ----

  def tokenizeUtf8(s: UTF8String): ArrayData = {
    if (s == null) return null
    val toks = tokenize(s.toString)
    val arr = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  private val SPACE = UTF8String.fromString(" ")

  /** All n-grams of `tokens`, each joined with single spaces. Joining to one
    * string (instead of array-of-array) keeps shuffle rows compact for the
    * topk/botk/unique group-bys.
    */
  def ngramsJoinedUtf8(tokens: ArrayData, n: Int): ArrayData = {
    if (tokens == null) return null
    val m = tokens.numElements()
    val count = if (m >= n && n > 0) m - n + 1 else 0
    val out = new Array[Any](count)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { window(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SPACE, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
