package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Word-delimiter splitting — the reference's `WordDelimiterGraphFilter`
  * [8x lucene/analysis/common .../miscellaneous/WordDelimiterGraphFilter
  * .java, ~600 LoC], the filter the stock `text_en_splitting` field type
  * applies to product-code-ish tokens ("PowerShot", "Wi-Fi", "SD500").
  *
  * Semantics re-derived from the published factory contract, default
  * flags of the Solr factory:
  *
  *  - subword boundaries at non-alphanumeric delimiters (`Wi-Fi` →
  *    `Wi`,`Fi`), at lower→upper case transitions when
  *    `splitOnCaseChange` (`PowerShot` → `Power`,`Shot`), and at
  *    letter↔digit transitions when `splitOnNumerics` (`SD500` →
  *    `SD`,`500`);
  *  - an acronym run followed by a lowercase letter splits BEFORE its
  *    last upper (`XLDuper` → `XL`,`Duper`) — the reference's
  *    "ABCDef → ABC, Def" rule;
  *  - `stemEnglishPossessive` strips a trailing `'s`/`’s` from the
  *    token before splitting (`O'Neil's` → `O`,`Neil`);
  *  - `catenateWords`/`catenateNumbers` additionally emit each maximal
  *    run of consecutive alpha (resp. digit) subwords joined (`Wi-Fi` →
  *    +`WiFi`); `catenateAll` joins every subword (`SD-500` → +`SD500`);
  *    a catenation identical to the single subword it spans is not
  *    re-emitted (the reference's single-part dedup);
  *  - `preserveOriginal` re-emits the unsplit token.
  *
  * Pure function of the token — safe at any parallelism. The Spark
  * entry applies it to the DISTINCT values of a dictionary-sized column
  * and joins back (never per-occurrence at 100 TB).
  */
object WordDelimiter {

  final case class Flags(
      splitOnCaseChange: Boolean = true,
      splitOnNumerics: Boolean = true,
      stemEnglishPossessive: Boolean = true,
      catenateWords: Boolean = false,
      catenateNumbers: Boolean = false,
      catenateAll: Boolean = false,
      preserveOriginal: Boolean = false)

  val Default: Flags = Flags()

  private def isAlpha(c: Char): Boolean = Character.isLetter(c)
  private def isDigit(c: Char): Boolean = Character.isDigit(c)

  /** Split one token into its subwords + configured catenations, in
    * emission order (subwords left to right, then word catenations,
    * number catenations, all-catenation, preserved original).
    */
  def parts(token: String, f: Flags = Default): Seq[String] = {
    val t0 = if (f.stemEnglishPossessive) Possessive.strip(token) else token
    val n = t0.length
    val subs = ArrayBuffer.empty[String]
    val isNum = ArrayBuffer.empty[Boolean] // per subword: all-digit?
    var i = 0
    while (i < n) {
      // skip delimiters
      while (i < n && !isAlpha(t0.charAt(i)) && !isDigit(t0.charAt(i))) i += 1
      if (i < n) {
        val start = i
        val digit = isDigit(t0.charAt(i))
        i += 1
        var done = false
        while (i < n && !done) {
          val c = t0.charAt(i)
          if (!isAlpha(c) && !isDigit(c)) done = true // delimiter
          else if (f.splitOnNumerics && isDigit(c) != digit) done = true
          else if (!digit && f.splitOnCaseChange &&
                   Character.isUpperCase(c) && Character.isLowerCase(t0.charAt(i - 1)))
            done = true // lower→upper
          else if (!digit && f.splitOnCaseChange && Character.isLowerCase(c) &&
                   i - 1 > start && Character.isUpperCase(t0.charAt(i - 1)) &&
                   Character.isUpperCase(t0.charAt(i - 2))) {
            // acronym run then lowercase: split BEFORE the last upper
            i -= 1
            done = true
          } else i += 1
        }
        subs += t0.substring(start, i)
        isNum += digit
      }
    }
    val out = ArrayBuffer.empty[String]
    out ++= subs
    def catenateRuns(keep: Boolean => Boolean): Unit = {
      var j = 0
      while (j < subs.length) {
        if (keep(isNum(j))) {
          var k = j
          while (k + 1 < subs.length && keep(isNum(k + 1))) k += 1
          if (k > j) out += subs.slice(j, k + 1).mkString
          j = k + 1
        } else j += 1
      }
    }
    if (f.catenateWords) catenateRuns(num => !num)
    if (f.catenateNumbers) catenateRuns(num => num)
    if (f.catenateAll && subs.length > 1) out += subs.mkString
    if (f.preserveOriginal && !out.contains(token)) out += token
    out.toSeq
  }
}
