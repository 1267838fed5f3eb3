package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Folding, Possessive, WordDelimiter}
import graft.analysis.WordDelimiter.Flags

/** Known-answer vectors for the word-delimiter / ASCII-folding /
  * possessive filters. WordDelimiter vectors are the published examples
  * from the Solr reference guide's WordDelimiterGraphFilterFactory
  * section; folding vectors are real-language words whose folded forms
  * are unambiguous.
  */
class FiltersSpec extends AnyFunSuite {

  private def wd(s: String, f: Flags = WordDelimiter.Default): Seq[String] =
    WordDelimiter.parts(s, f)

  test("WDGF: delimiter split") {
    assert(wd("Wi-Fi") == Seq("Wi", "Fi"))
    assert(wd("hot-spot") == Seq("hot", "spot"))
    assert(wd("O'Neil") == Seq("O", "Neil"))
  }

  test("WDGF: case-change split") {
    assert(wd("PowerShot") == Seq("Power", "Shot"))
    assert(wd("transAM") == Seq("trans", "AM"))
    assert(wd("powerShot") == Seq("power", "Shot"))
  }

  test("WDGF: acronym run then lowercase splits before last upper") {
    assert(wd("XLDuper") == Seq("XL", "Duper"))
    assert(wd("SuperDuperXL500") == Seq("Super", "Duper", "XL", "500"))
  }

  test("WDGF: numeric split") {
    assert(wd("SD500") == Seq("SD", "500"))
    assert(wd("j2se") == Seq("j", "2", "se"))
    assert(wd("ZX-2000") == Seq("ZX", "2000"))
    assert(wd("Customer#000000042") == Seq("Customer", "000000042"))
    assert(wd("5-LOW") == Seq("5", "LOW"))
  }

  test("WDGF: possessive stripped before splitting") {
    assert(wd("O'Neil's") == Seq("O", "Neil"))
    assert(wd("A's") == Seq("A"))
    assert(wd("BOB’S", Flags()) == Seq("BOB"))
  }

  test("WDGF: splitOnCaseChange=false keeps mixed-case runs") {
    val f = Flags(splitOnCaseChange = false)
    assert(wd("PowerShot", f) == Seq("PowerShot"))
    assert(wd("Wi-Fi", f) == Seq("Wi", "Fi"))
  }

  test("WDGF: splitOnNumerics=false keeps alnum runs") {
    val f = Flags(splitOnNumerics = false)
    assert(wd("SD500", f) == Seq("SD500"))
    assert(wd("j2se", f) == Seq("j2se"))
  }

  test("WDGF: catenateWords joins adjacent alpha runs") {
    val f = Flags(catenateWords = true)
    assert(wd("Wi-Fi", f) == Seq("Wi", "Fi", "WiFi"))
    assert(wd("wi-fi-800", f) == Seq("wi", "fi", "800", "wifi"))
    // single alpha subword: no duplicate catenation
    assert(wd("solo", f) == Seq("solo"))
  }

  test("WDGF: catenateNumbers joins adjacent digit runs") {
    val f = Flags(catenateNumbers = true)
    assert(wd("2000-4000", f) == Seq("2000", "4000", "20004000"))
    assert(wd("Wi-Fi", f) == Seq("Wi", "Fi"))
  }

  test("WDGF: catenateAll joins every subword") {
    val f = Flags(catenateAll = true)
    assert(wd("SD-500", f) == Seq("SD", "500", "SD500"))
    assert(wd("single", f) == Seq("single"))
  }

  test("WDGF: preserveOriginal re-emits unsplit token") {
    val f = Flags(preserveOriginal = true)
    assert(wd("Wi-Fi", f) == Seq("Wi", "Fi", "Wi-Fi"))
    assert(wd("plain", f) == Seq("plain"))
  }

  test("WDGF: pure delimiters yield nothing") {
    assert(wd("--##--") == Seq.empty)
    assert(wd("") == Seq.empty)
  }

  test("folding: canonical decompositions") {
    assert(Folding.fold("café") == "cafe")
    assert(Folding.fold("naïve") == "naive")
    assert(Folding.fold("Über") == "Uber")
    assert(Folding.fold("fiancée") == "fiancee")
    assert(Folding.fold("São Paulo") == "Sao Paulo")
    assert(Folding.fold("Señor") == "Senor")
    assert(Folding.fold("Čapek") == "Capek")
    assert(Folding.fold("Ångström") == "Angstrom")
  }

  test("folding: specials with no canonical decomposition") {
    assert(Folding.fold("Æon") == "AEon")
    assert(Folding.fold("straße") == "strasse")
    assert(Folding.fold("Łódź") == "Lodz")
    assert(Folding.fold("smørrebrød") == "smorrebrod")
    assert(Folding.fold("Þorn") == "THorn")
    assert(Folding.fold("œuvre") == "oeuvre")
    assert(Folding.fold("Reykjavík") == "Reykjavik") // í decomposes; ð special elsewhere
    assert(Folding.fold("Eyjafjörður") == "Eyjafjordur")
  }

  test("folding: ASCII passthrough returns the same instance") {
    val s = "plain ascii"
    assert(Folding.fold(s) eq s)
  }

  test("folding: accent round-trip over the corpus vowel translate") {
    // the ascii_folding entry's differential: translate a..u to accented
    // forms, fold back, expect identity — pin it here for every vocab word
    val acc = Map('a' -> 'á', 'e' -> 'é', 'i' -> 'í', 'o' -> 'ó', 'u' -> 'ú')
    for (w <- OracleGen.CorpusVocab) {
      val accented = w.map(c => acc.getOrElse(c, c))
      assert(Folding.fold(accented) == w, s"round trip for $w")
    }
  }

  test("char n-grams: distinct sliding grams, short terms yield none") {
    import graft.operators.AnalysisOps.charNgrams
    assert(charNgrams("spark", 3) == Seq("spa", "par", "ark"))
    assert(charNgrams("aaaa", 3) == Seq("aaa"))
    assert(charNgrams("ab", 3) == Seq.empty)
    assert(charNgrams("abc", 3) == Seq("abc"))
  }

  test("fingerprint filter: sorted distinct analyzed terms, from the index") {
    val dir = "/root/testdata/sf0.001"
    val spark = SparkTestBase.spark
    val fp = graft.operators.AnalysisOps.fingerprintFilter(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp.keySet == texts.keySet)
    for ((id, text) <- texts.take(25)) {
      val expect = graft.analysis.Analyzer.tokenize(text)
        .map(_.term).distinct.sorted
      assert(fp(id) == (expect.mkString(" "), expect.length.toLong), s"doc $id")
    }
  }

  test("keyword marker: the protected words are ones Porter would change") {
    for (w <- graft.operators.AnalysisOps.ProtectedWords)
      assert(graft.analysis.Porter.stem(w) != w,
        s"$w must be stemmer-visible for protection to be observable")
  }

  test("WDGF: differential vs an independent brute twin on random tokens") {
    // the oracle's rule set (boundary insertion at lower→upper and
    // letter↔digit, split on non-alphanumerics, no acronym rule) —
    // re-derived here with plain string ops, NOT regexes, so the two
    // sides share no code. Inputs avoid the acronym shape (>=2 uppers
    // then lower) which the reference splits differently (own vector
    // tests above).
    def bruteParts(s: String): Seq[String] = {
      val sb = new StringBuilder
      for (i <- s.indices) {
        val c = s.charAt(i)
        if (i > 0) {
          val p = s.charAt(i - 1)
          val caseSplit = p.isLower && c.isUpper
          val numSplit = (p.isLetter && c.isDigit) || (p.isDigit && c.isLetter)
          if (caseSplit || numSplit) sb.append(' ')
        }
        sb.append(if (c.isLetterOrDigit) c else ' ')
      }
      sb.toString.split(' ').filter(_.nonEmpty).toSeq
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abcsXYZS019-#._ '" // incl. s/S so 's-adjacent shapes occur
    var checked = 0
    while (checked < 500) {
      val s = Seq.fill(1 + rnd.nextInt(12))(
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
      val hasAcronym = s.sliding(3).exists(t => t.length == 3 &&
        t(0).isUpper && t(1).isUpper && t(2).isLower)
      val possessive = s.length >= 2 && (s.endsWith("'s") || s.endsWith("'S"))
      if (!hasAcronym && !possessive) {
        assert(wd(s) == bruteParts(s), s"input: ${s.map(_.toInt)} ($s)")
        checked += 1
      }
    }
  }

  test("possessive: strip variants") {
    assert(Possessive.strip("spark's") == "spark")
    assert(Possessive.strip("SPARK'S") == "SPARK")
    assert(Possessive.strip("spark’s") == "spark")
    assert(Possessive.strip("sparks") == "sparks")
    assert(Possessive.strip("'s") == "")
    assert(Possessive.strip("s") == "s")
  }
}
