package graft.analysis

/** English possessive stripper — the reference's
  * `EnglishPossessiveFilter` [8x lucene/analysis/common
  * .../en/EnglishPossessiveFilter.java]: remove a trailing `'s` (any of
  * the three apostrophe codepoints the reference accepts, either case of
  * `s`) from a token. Runs before the stemmer in the stock `text_en`
  * chain.
  */
object Possessive {
  private def isApos(c: Char): Boolean =
    c == '\'' || c == '’' || c == '＇'

  def strip(s: String): String =
    if (s.length >= 2 && isApos(s.charAt(s.length - 2)) &&
        (s.charAt(s.length - 1) == 's' || s.charAt(s.length - 1) == 'S'))
      s.substring(0, s.length - 2)
    else s
}

/** English minimal stemmer — the reference's `EnglishMinimalStemFilter`
  * [8x lucene/analysis/common .../en/EnglishMinimalStemmer.java], the
  * plural-only "s-stemmer" (Harman 1991): strip a trailing `s` unless
  * the word ends in `-us`/`-ss` or a guarded vowel+`es` pattern;
  * `-ies` → `-y` behind a consonant.
  *
  * Single source of truth: [[stemSql]] is ONE portable SQL `CASE`
  * expression evaluated verbatim by BOTH engines — Spark (`expr`) for
  * the entry and DuckDB for the oracle — so the stemming rules cannot
  * drift between the implementation and its check. [[stem]] is the
  * plain-Scala re-derivation used by differential tests.
  */
object Stemmer {

  /** Portable SQL for stemming column `c` (works in Spark SQL and
    * DuckDB unchanged: substr is 1-based, || concatenates in both).
    */
  def stemSql(c: String): String =
    s"""CASE
       |  WHEN length($c) < 3 OR substr($c, length($c), 1) <> 's' THEN $c
       |  WHEN substr($c, length($c)-1, 1) IN ('u', 's') THEN $c
       |  WHEN substr($c, length($c)-1, 1) = 'e' THEN
       |    CASE
       |      WHEN length($c) > 3 AND substr($c, length($c)-2, 1) = 'i'
       |           AND substr($c, length($c)-3, 1) NOT IN ('a', 'e')
       |        THEN substr($c, 1, length($c)-3) || 'y'
       |      WHEN substr($c, length($c)-2, 1) IN ('i', 'a', 'o', 'e') THEN $c
       |      ELSE substr($c, 1, length($c)-1)
       |    END
       |  ELSE substr($c, 1, length($c)-1)
       |END""".stripMargin

  /** Plain-Scala mirror of [[stemSql]] (for differential tests). */
  def stem(w: String): String = {
    val n = w.length
    if (n < 3 || w(n - 1) != 's') return w
    w(n - 2) match {
      case 'u' | 's' => w
      case 'e' =>
        if (n > 3 && w(n - 3) == 'i' && w(n - 4) != 'a' && w(n - 4) != 'e')
          w.substring(0, n - 3) + "y"
        else if (w(n - 3) == 'i' || w(n - 3) == 'a' || w(n - 3) == 'o' || w(n - 3) == 'e') w
        else w.substring(0, n - 1)
      case _ => w.substring(0, n - 1)
    }
  }
}
