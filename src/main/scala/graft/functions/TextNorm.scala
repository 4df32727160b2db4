package graft.functions

import java.text.Normalizer

import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization kernel — the first transform every real
  * corpus pipeline runs before tokenizing/hashing (composed-vs-decomposed
  * accents, NBSP vs space, zero-width junk all change hashes and token
  * counts, which silently breaks dedup and contamination joins across
  * differently-encoded shards).
  *
  * Pass order (mirrored exactly by the DuckDB oracle's regex cascade +
  * `nfc_normalize`, so the passes must stay separable):
  *   1. line endings: CRLF → LF, stray CR → LF;
  *   2. Unicode spaces (NBSP, en/em/thin spaces, ideographic space …) →
  *      ASCII space;
  *   3. zero-width characters (ZWSP/ZWNJ/ZWJ/BOM) and soft hyphen removed;
  *   4. remaining ISO control characters except `\n` and `\t` removed;
  *   5. canonical composition LAST (NFC; NFKC optionally — folds
  *      width/compat forms, e.g. fullwidth digits, ligatures): stripping a
  *      zero-width joiner can expose a (base, combining-mark) pair that
  *      still needs composing, and composition cannot re-create anything
  *      passes 1-4 remove — so the transform is idempotent
  *      (property-tested in TextNormSpec).
  *
  * No whitespace collapsing and no case folding here — those are policy
  * (c4Clean / quality gates), not encoding repair.
  */
object TextNorm {

  private def isUnicodeSpace(c: Char): Boolean =
    c == '\u00A0' || c == '\u1680' || (c >= '\u2000' && c <= '\u200A') ||
      c == '\u202F' || c == '\u205F' || c == '\u3000'

  private def isZeroWidth(c: Char): Boolean =
    c == '\u200B' || c == '\u200C' || c == '\u200D' ||
      c == '\uFEFF' || c == '\u00AD'

  def normalize(s: String, nfkc: Boolean): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < n && s.charAt(i + 1) == '\n') i += 1
      } else if (c == '\n' || c == '\t') sb.append(c)
      else if (isUnicodeSpace(c)) sb.append(' ')
      else if (isZeroWidth(c)) ()
      else if (!Character.isISOControl(c)) sb.append(c)
      i += 1
    }
    // canonical form LAST: stripping a zero-width joiner can expose a
    // (base, combining-mark) pair that must still compose, and composition
    // can't re-create anything the cleanup passes remove — which is what
    // makes the whole transform idempotent (property-tested)
    val cleaned = sb.toString
    val form = if (nfkc) Normalizer.Form.NFKC else Normalizer.Form.NFC
    if (Normalizer.isNormalized(cleaned, form)) cleaned
    else Normalizer.normalize(cleaned, form)
  }

  /** UTF8String adapter for codegen call sites. */
  def normalizeUtf8(s: UTF8String, nfkc: Boolean): UTF8String =
    UTF8String.fromString(normalize(s.toString, nfkc))
}
