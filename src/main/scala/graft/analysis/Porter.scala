package graft.analysis

/** Porter stemmer — a clean-room implementation of the PUBLISHED
  * algorithm (M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980), the default English stemmer of the
  * reference's `text_en` chain [8x
  * lucene/analysis/common/.../en/PorterStemFilter.java]. The paper
  * version, not the Snowball revision: the known-answer vectors in
  * PorterSpec are the paper's own step examples.
  *
  * Terminology (paper §2): a word is [C](VC)^m[V]; `m` is the measure
  * of the stem under test. A letter is a consonant unless it is
  * a/e/i/o/u or a `y` preceded by a consonant.
  */
object Porter {

  def stem(word: String): String = {
    if (word == null || word.length <= 2) return word
    var w = word
    w = step1a(w)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  /** True when position i of `w` holds a consonant (paper definition:
    * `y` after a consonant is a vowel).
    */
  private def isCons(w: String, i: Int): Boolean = w(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** The measure m of `stem`: number of VC transitions in [C](VC)^m[V]. */
  private def measure(stem: String): Int = {
    var m = 0
    var i = 0
    val n = stem.length
    // skip the optional leading consonant run
    while (i < n && isCons(stem, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(stem, i)) i += 1 // vowel run
      if (i < n) { // consonant run after a vowel run = one VC
        m += 1
        while (i < n && isCons(stem, i)) i += 1
      }
    }
    m
  }

  private def containsVowel(stem: String): Boolean =
    stem.indices.exists(i => !isCons(stem, i))

  /** *d — stem ends with a double consonant. */
  private def endsDoubleCons(stem: String): Boolean = {
    val n = stem.length
    n >= 2 && stem(n - 1) == stem(n - 2) && isCons(stem, n - 1)
  }

  /** *o — stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(stem: String): Boolean = {
    val n = stem.length
    n >= 3 && isCons(stem, n - 3) && !isCons(stem, n - 2) &&
      isCons(stem, n - 1) &&
      stem(n - 1) != 'w' && stem(n - 1) != 'x' && stem(n - 1) != 'y'
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stripped =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2)))
          Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3)))
          Some(w.dropRight(3))
        else None
      stripped match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleCons(s) && !"lsz".contains(s.last)) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1)))
      w.dropRight(1) + "i"
    else w

  /** (suffix, replacement) pairs of one step, longest suffix wins;
    * applied when m(stem) > `minM`.
    */
  private def replaceLongest(w: String, rules: Seq[(String, String)],
                             minM: Int): String = {
    // paper semantics: the longest MATCHING suffix is selected first,
    // and only then its m-condition decides whether anything happens
    rules.sortBy(-_._1.length).collectFirst {
      case (suf, rep) if w.endsWith(suf) =>
        val stem = w.dropRight(suf.length)
        if (measure(stem) > minM) stem + rep else w
    }.getOrElse(w)
  }

  private val Step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
    "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
    "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
    "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
    "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val Step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val Step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step2(w: String): String = replaceLongest(w, Step2Rules, 0)

  private def step3(w: String): String = replaceLongest(w, Step3Rules, 0)

  private def step4(w: String): String = {
    Step4Suffixes.sortBy(-_.length).collectFirst {
      case suf if w.endsWith(suf) =>
        val stem = w.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          // (m>1 and (*S or *T)) ION — the ion rule's extra condition
          (suf != "ion" || (stem.nonEmpty &&
            (stem.last == 's' || stem.last == 't')))
        if (ok) stem else w
    }.getOrElse(w)
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (measure(w) > 1 && endsDoubleCons(w) && w.last == 'l')
      w.dropRight(1)
    else w
}
