package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}

import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair kernel — undoes the classic crawl-corpus encoding
  * accident where UTF-8 bytes were decoded as windows-1252 or latin-1
  * ("â€™" → "’", "Ã©" → "é", double-encoded variants, and the
  * latin-1 flavor whose 0x80–0x9F bytes survive as raw C1 controls).
  * The reference's mC4 preparation runs ftfy over every document for
  * exactly this reason (preparation/mc4/mc4.py:11,69); this is the
  * same repair as a pure, codegen-callable kernel.
  *
  * Algorithm (one pass, iterated to a fixpoint ≤3 rounds for
  * double-mangled text):
  *   1. find maximal runs of characters that map back to a high byte
  *      (≥0x80) under the inverse windows-1252 table — C1 controls map
  *      to themselves (the latin-1 flavor), 0xA0–0xFF map to themselves,
  *      and the 27 cp1252 specials (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ”
  *      • – — ˜ ™ š › œ ž Ÿ) map to 0x80–0x9F. A mangled multi-byte
  *      UTF-8 sequence consists only of such characters (lead bytes are
  *      0xC2–0xF4, continuations 0x80–0xBF), so runs cover every
  *      repairable region and never cross ASCII text.
  *   2. re-encode the run to its byte sequence and attempt a STRICT
  *      UTF-8 decode — malformed input keeps the run untouched, which is
  *      what makes legitimate latin-text ("café", "Ü") safe: an isolated
  *      é is the bare lead byte 0xE9 with no continuation and fails.
  *   3. plausibility guards before accepting, because short runs can
  *      decode by coincidence ("é©©" is valid UTF-8 for a CJK char, and
  *      legit pairs like "ß—" or "é—€" are too): every decoded codepoint
  *      must be assigned, non-control, non-private-use; and the run must
  *      EITHER decode entirely into the common repair targets (Latin
  *      supplements, Greek, Cyrillic, punctuation, currency, symbols,
  *      emoji), OR carry a raw C1 control (the latin-1 flavor — never
  *      intentional), OR carry ≥2 cp1252 specials while decoding to ≥2
  *      codepoints (mangled rare-script sentences, e.g. "ä¸­æ–‡" →
  *      "中文"; legit singleton juxtapositions decode to one rare
  *      codepoint and are kept). See [[tryDecode]] for the rationale.
  *
  * Consequence of run-granularity strict decoding: a run mixing a valid
  * mangled sequence with unrelated high-byte noise is left untouched
  * (no partial repair inside a run) — the conservative choice for a
  * corpus transform. Repair is idempotent on its own output
  * (property-tested): repaired text contains multi-byte characters the
  * inverse table no longer maps, or ASCII.
  *
  * Run this BEFORE [[TextNorm.normalize]]: normalize strips the C1
  * controls that the latin-1 flavor needs as evidence.
  */
object Mojibake {

  /** Inverse windows-1252 for the 0x80–0x9F specials (5 slots — 0x81,
    * 0x8D, 0x8F, 0x90, 0x9D — are undefined in cp1252 and covered by the
    * C1-identity fallback instead).
    */
  private val cp1252Inv: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** byteFor(c) = the high byte c decodes from, or -1. Array-indexed so
    * the per-char probe in the scan loop is a bounds check + load.
    */
  private val byteFor: Array[Int] = {
    val a = Array.fill(0x2200)(-1)
    var c = 0x80
    while (c <= 0xFF) { a(c) = c; c += 1 } // latin-1 identity incl. C1
    cp1252Inv.foreach { case (ch, b) => a(ch.toInt) = b }
    a
  }

  @inline private def hiByte(c: Char): Int =
    if (c < 0x2200) byteFor(c) else -1

  /** Raw C1 control — the latin-1 mojibake flavor's fingerprint, never
    * intentional prose.
    */
  @inline private def isC1(c: Char): Boolean =
    c >= '\u0080' && c <= '\u009F'

  /** cp1252 special (€ ’ ™ „ …) — strongly mojibake-suggestive, but a
    * single one can occur in legit text next to a mappable letter
    * ("ß—" re-encodes to DF 97 = valid UTF-8 for rare NKo U+07D7), so
    * one special alone is NOT sufficient evidence.
    */
  @inline private def isSpecial(c: Char): Boolean =
    c >= '\u0100' && hiByte(c) >= 0 // the specials all sit >= U+0100

  /** Codepoint ranges mojibake repair commonly produces; runs decoding
    * entirely inside them are accepted even without an indicator char
    * (the "Ã©" → "é" case re-encodes to 0xC3 0xA9 — no 0x80–0x9F byte).
    */
  private def commonTarget(cp: Int): Boolean =
    (cp >= 0xA0 && cp < 0x500) ||      // Latin-1 supp … Cyrillic
      (cp >= 0x1E00 && cp < 0x1F00) || // Latin extended additional
      (cp >= 0x2000 && cp < 0x2070) || // general punctuation
      (cp >= 0x20A0 && cp < 0x20D0) || // currency symbols
      (cp >= 0x2100 && cp < 0x2150) || // letterlike symbols
      (cp >= 0x2190 && cp < 0x2C00) || // arrows/dingbats/misc symbols
      (cp >= 0x1F000 && cp < 0x1FB00)  // emoji planes ("ðŸ™‚" → 🙂)

  /** Decode the run s[from, until) as UTF-8 bytes; null = leave as-is.
    *
    * Acceptance, after the assigned/non-control/non-private screen:
    *   - every decoded codepoint in [[commonTarget]] (the Latin/Greek/
    *     Cyrillic/punctuation/symbol/emoji ranges repair usually
    *     produces), or
    *   - a raw C1 control in the run (the latin-1 flavor's fingerprint —
    *     never intentional), or
    *   - ≥2 cp1252 specials AND ≥2 decoded codepoints: mangled CJK/rare-
    *     script SENTENCES hit this ("ä¸­æ–‡" → 中文), while the legit
    *     singleton juxtapositions that also form valid UTF-8 ("ß—",
    *     "é—€" inside "café—€5") decode to ONE rare codepoint and stay.
    *     The residual ambiguity (a lone mangled rare-script char vs that
    *     exact legit pair) is decided in favor of keeping the input —
    *     same trade ftfy's badness heuristic makes.
    */
  private def tryDecode(s: String, from: Int, until: Int,
                        c1Present: Boolean, specials: Int): String = {
    val len = until - from
    if (len < 2) return null // a multi-byte UTF-8 sequence is ≥2 bytes
    val bytes = new Array[Byte](len)
    var hasLead = false
    var k = 0
    while (k < len) {
      val b = hiByte(s.charAt(from + k))
      bytes(k) = b.toByte
      if (b >= 0xC2 && b <= 0xF4) hasLead = true
      k += 1
    }
    if (!hasLead) return null
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    val out =
      try dec.decode(ByteBuffer.wrap(bytes)).toString
      catch { case _: CharacterCodingException => return null }
    var common = true
    var ncps = 0
    var ci = 0
    while (ci < out.length) {
      val cp = out.codePointAt(ci)
      if (!Character.isDefined(cp) || Character.isISOControl(cp) ||
          Character.getType(cp) == Character.PRIVATE_USE.toInt) return null
      if (!commonTarget(cp)) common = false
      ncps += 1
      ci += Character.charCount(cp)
    }
    if (common || c1Present || (specials >= 2 && ncps >= 2)) out else null
  }

  /** One repair pass; returns `s` itself (same reference) when nothing
    * changed so [[fix]]'s fixpoint check is an identity comparison.
    */
  def fixOnce(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    while (i < n) {
      if (hiByte(s.charAt(i)) >= 0) {
        var j = i
        var c1 = false
        var specials = 0
        while (j < n && hiByte(s.charAt(j)) >= 0) {
          val cj = s.charAt(j)
          if (isC1(cj)) c1 = true
          else if (isSpecial(cj)) specials += 1
          j += 1
        }
        val repaired = tryDecode(s, i, j, c1, specials)
        if (repaired != null) {
          if (sb == null) {
            sb = new java.lang.StringBuilder(n)
            sb.append(s, 0, i)
          }
          sb.append(repaired)
        } else if (sb != null) sb.append(s, i, j)
        i = j
      } else {
        if (sb != null) sb.append(s.charAt(i))
        i += 1
      }
    }
    if (sb == null) s else sb.toString
  }

  /** Repair to a fixpoint (≤3 passes: double-mangled text needs two,
    * the third proves quiescence).
    */
  def fix(s: String): String = {
    var cur = s
    var rounds = 0
    while (rounds < 3) {
      val next = fixOnce(cur)
      if (next eq cur) return cur
      cur = next
      rounds += 1
    }
    cur
  }

  /** UTF8String adapter for codegen call sites. */
  def fixUtf8(s: UTF8String): UTF8String = {
    val in = s.toString
    val out = fix(in)
    if (out eq in) s else UTF8String.fromString(out)
  }
}
