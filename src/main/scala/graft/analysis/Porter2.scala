package graft.analysis

/** Snowball English ("Porter2") stemmer — a clean-room implementation
  * of the PUBLISHED algorithm (M.F. Porter, "The English (Porter2)
  * stemming algorithm", snowballstem.org), the stemmer Solr's common
  * `text_en` variants ship as SnowballPorterFilterFactory [8x
  * lucene/analysis/common/.../snowball/SnowballFilter.java +
  * tartarus/snowball/ext/EnglishStemmer.java — machine-generated from
  * the same published Snowball source]. Distinct from [[Porter]] (the
  * 1980 paper algorithm): Porter2 adds exceptional forms, the
  * gener/commun/arsen R1 overrides, Y-marking, the `li`-ending rule,
  * and revised suffix tables.
  *
  * Snowball `among` semantics throughout: within a step the LONGEST
  * matching suffix is selected first; if its region condition then
  * fails, the step does nothing (no fallback to a shorter suffix).
  */
object Porter2 {

  private val Exceptions: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariant forms
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Words after which step 1a stops the algorithm. */
  private val Stoppers = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  private val DoubleEnd = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val ValidLi = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  /** First position AFTER a non-vowel that follows a vowel, scanning
    * from `from`; w.length when no such pattern exists (null region).
    */
  private def regionStart(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w(i))) i += 1
    while (i < w.length && isVowel(w(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** Ends in a short syllable: non-vowel + vowel + non-vowel(≠ w,x,Y)
    * at the end, or a word-initial vowel followed by one non-vowel.
    */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w(0)) && !isVowel(w(1))
    else if (n >= 3) {
      val c = w(n - 1)
      !isVowel(w(n - 3)) && isVowel(w(n - 2)) &&
        !isVowel(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  def stem(word: String): String = {
    if (word == null) return word
    var w = word
    if (w.startsWith("'")) w = w.substring(1)
    Exceptions.get(w) match {
      case Some(e) => return e
      case None =>
    }
    if (w.length <= 2) return w

    // mark consonant y as Y: initial y, or y after a vowel
    val sb = new StringBuilder(w)
    var i = 0
    while (i < sb.length) {
      if (sb(i) == 'y' && (i == 0 || isVowel(sb(i - 1)))) sb(i) = 'Y'
      i += 1
    }
    w = sb.toString

    // R1 (with the published prefix overrides) and R2 as absolute marks;
    // the word only ever changes at its tail, so the marks stay valid
    val r1 =
      if (w.startsWith("gener") || w.startsWith("arsen")) 5
      else if (w.startsWith("commun")) 6
      else regionStart(w, 0)
    val r2 = regionStart(w, r1)

    // step 0: longest of 's' 's '
    Seq("'s'", "'s", "'").find(w.endsWith).foreach { s =>
      if (w.length > s.length) w = w.dropRight(s.length)
    }
    finish(steps1to5(w, r1, r2))
  }

  /** Steps 1a–5 on the Y-marked, apostrophe-stripped word; r1/r2 are
    * absolute region marks (suffix-in-region = suffix start ≥ mark).
    */
  private def steps1to5(w0: String, r1: Int, r2: Int): String = {
    var w = w0
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = w.length - sufLen >= r2
    def hasVowel(upTo: Int): Boolean = w.substring(0, upTo).exists(isVowel)

    // — step 1a —
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = w.dropRight(if (w.length > 4) 2 else 1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && w.length >= 2 && hasVowel(w.length - 2))
      w = w.dropRight(1)
    if (Stoppers.contains(w)) return w

    // — step 1b —
    val s1b = Seq("eedly", "ingly", "edly", "eed", "ing", "ed")
      .find(w.endsWith)
    s1b match {
      case Some(s @ ("eed" | "eedly")) =>
        if (inR1(s.length)) w = w.dropRight(s.length) + "ee"
      case Some(s) =>
        if (hasVowel(w.length - s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && DoubleEnd.contains(w.takeRight(2))) w = w.dropRight(1)
          else if (endsShortSyllable(w) && r1 >= w.length) w += "e" // short word
        }
      case None =>
    }

    // — step 1c: y/Y → i after a non-vowel that isn't the first letter —
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') &&
        !isVowel(w(w.length - 2)))
      w = w.dropRight(1) + "i"

    // — step 2 (longest match; condition = suffix in R1) —
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ogi") {
          if (w.length > 3 && w(w.length - 4) == 'l') w = w.dropRight(3) + r
        } else if (s == "li") {
          if (w.length > 2 && ValidLi.contains(w(w.length - 3))) w = w.dropRight(2)
        } else w = w.dropRight(s.length) + r
      }
    }

    // — step 3 (in R1; ative additionally requires R2) —
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ative") { if (inR2(s.length)) w = w.dropRight(s.length) }
        else w = w.dropRight(s.length) + r
      }
    }

    // — step 4 (in R2) —
    val step4: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
      "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      if (inR2(s.length)) {
        if (s == "ion") {
          if (w.length > 3 && (w(w.length - 4) == 's' || w(w.length - 4) == 't'))
            w = w.dropRight(3)
        } else w = w.dropRight(s.length)
      }
    }

    // — step 5 —
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(1) && w.length >= 2 && w(w.length - 2) == 'l')
      w = w.dropRight(1)

    w
  }

  private def finish(w: String): String = w.map(c => if (c == 'Y') 'y' else c)
}
