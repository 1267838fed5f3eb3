package graft.analysis

import java.text.Normalizer

/** ASCII folding — the reference's `ASCIIFoldingFilter`
  * [8x lucene/analysis/common .../miscellaneous/ASCIIFoldingFilter.java,
  * ~2k LoC of generated per-codepoint table]: map Unicode Latin letters
  * to their ASCII equivalents so `café`/`cafe` and `Über`/`Uber` match.
  *
  * Re-derivation, not a table copy: every accented Latin letter's ASCII
  * form is its NFD canonical decomposition with the combining marks
  * removed (`é` → `e` + U+0301 → `e`), so the general path is
  * `Normalizer.NFD` + strip `COMBINING_SPELLING_MARK`/`NON_SPACING_MARK`;
  * the letters with no canonical decomposition (ligatures, crossed and
  * runic forms: Æ ß Ð Ø Þ Đ Ħ ı Ł Ŋ Ŧ Œ Ĳ ŉ ĸ …) are the explicit
  * specials table below. Output agrees with the reference's published
  * mapping over Latin-1 Supplement + Latin Extended-A (U+00C0–U+017F),
  * the range any realistic web-text Latin corpus hits; codepoints
  * outside the handled ranges pass through unchanged (same as the
  * reference for unmapped codepoints).
  *
  * Pure per-string function — applied to DISTINCT dictionary terms and
  * joined back, never per-occurrence.
  */
object Folding {

  private val Specials: Map[Char, String] = Map(
    'Æ' -> "AE", 'æ' -> "ae",
    'Ð' -> "D", 'ð' -> "d",
    'Ø' -> "O", 'ø' -> "o",
    'Þ' -> "TH", 'þ' -> "th",
    'ß' -> "ss",
    'Đ' -> "D", 'đ' -> "d",
    'Ħ' -> "H", 'ħ' -> "h",
    'İ' -> "I", 'ı' -> "i",
    'Ĳ' -> "IJ", 'ĳ' -> "ij",
    'ĸ' -> "q",
    'Ŀ' -> "L", 'ŀ' -> "l",
    'Ł' -> "L", 'ł' -> "l",
    'ŉ' -> "'n",
    'Ŋ' -> "NG", 'ŋ' -> "ng",
    'Œ' -> "OE", 'œ' -> "oe",
    'Ŧ' -> "T", 'ŧ' -> "t",
    'ſ' -> "s")

  /** Fold `s` to its ASCII form. ASCII-only strings return `s` itself
    * (no allocation on the common path).
    */
  def fold(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val sb = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80) sb.append(c)
      else Specials.get(c) match {
        case Some(r) => sb.append(r)
        case None =>
          val d = Normalizer.normalize(String.valueOf(c), Normalizer.Form.NFD)
          var j = 0
          while (j < d.length) {
            val t = Character.getType(d.charAt(j))
            if (t != Character.NON_SPACING_MARK &&
                t != Character.COMBINING_SPACING_MARK &&
                t != Character.ENCLOSING_MARK) sb.append(d.charAt(j))
            j += 1
          }
      }
      i += 1
    }
    sb.toString
  }
}
