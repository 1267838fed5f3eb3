package graft.analysis

/** Classic Soundex with the H/W merge rule — the reference's
  * `PhoneticFilter` + commons-codec `Soundex` pairing
  * [8x lucene/analysis/phonetic .../PhoneticFilter.java]: letters map to
  * digit classes (BFPV→1 CGJKQSXZ→2 DT→3 L→4 MN→5 R→6), vowels separate,
  * H/W are transparent (same-class consonants on both sides of an h/w
  * merge), first letter kept verbatim, 3 digits zero-padded.
  *
  * Single source of truth: [[soundexSql]] is ONE portable SQL expression
  * evaluated verbatim by BOTH engines — Spark (`expr`) for the entry and
  * DuckDB for the oracle — so the phonetic rules cannot drift between the
  * implementation and its check (same pattern as [[Stemmer]]). Only
  * engine-portable builtins are used: `translate` (unmapped chars drop
  * when the to-alphabet is shorter in both engines), `replace` (global in
  * both), `substr`, `||`. Run-collapse avoids `regexp_replace` entirely
  * (global-replace flags differ between the engines): `replace(x,'dd','d')`
  * halves a run per application, so ⌈log2(maxTokenLength=255)⌉ = 8 nested
  * applications per digit collapse any run exactly.
  *
  * Input contract: lowercase purely-alphabetic terms (the caller filters
  * with [[alphaOnlySql]] — digits inside a token would collide with the
  * code alphabet).
  */
object Phonetic {

  /** h/w are absent (transparent); they survive `translate` unchanged
    * when in first position and never equal a digit, so they cannot
    * merge with anything.
    */
  private val FromAlpha = "abcdefgijklmnopqrstuvxyz"
  private val ToCodes   = "012301202245501262301202"

  /** Portable predicate: true iff `c` is non-empty pure a-z. */
  def alphaOnlySql(c: String): String =
    s"(length($c) > 0 AND translate($c, 'abcdefghijklmnopqrstuvwxyz', '') = '')"

  /** Portable SQL computing the 4-char Soundex code of column `c`. */
  def soundexSql(c: String): String = {
    // first letter verbatim + tail with h/w removed (the H/W rule:
    // deleting them makes flanking same-class consonants adjacent, so
    // the run-collapse merges them — e.g. ashcraft → a261)
    val stripped =
      s"substr($c, 1, 1) || replace(replace(substr($c, 2), 'h', ''), 'w', '')"
    val codes = s"translate($stripped, '$FromAlpha', '$ToCodes')"
    // collapse runs of each digit class: 8 halvings handle runs ≤ 255
    val collapsed = (1 to 6).foldLeft(codes) { (acc, d) =>
      (1 to 8).foldLeft(acc)((a, _) => s"replace($a, '$d$d', '$d')")
    }
    // drop the first code char (the first letter's own class, already
    // represented verbatim — adjacent same-class letters merged into it),
    // remove vowel separators, zero-pad to 3 digits
    s"(substr($c, 1, 1) || substr(replace(substr($collapsed, 2), '0', '') || '000', 1, 3))"
  }

  /** Plain-Scala mirror of [[soundexSql]] (for differential tests). */
  def soundex(w: String): String = {
    require(w.nonEmpty && w.forall(ch => ch >= 'a' && ch <= 'z'))
    val stripped = w.head + w.tail.filterNot(ch => ch == 'h' || ch == 'w')
    val codes = stripped.map { ch =>
      val i = FromAlpha.indexOf(ch)
      if (i < 0) ch else ToCodes(i)
    }
    val collapsed = new StringBuilder
    codes.foreach { ch =>
      if (collapsed.isEmpty || !(ch.isDigit && ch != '0' && collapsed.last == ch))
        collapsed += ch
    }
    val digits = collapsed.drop(1).filter(ch => ch >= '1' && ch <= '6')
    (w.head + (digits.toString + "000").take(3))
  }
}
