package graft

import org.apache.spark.sql.functions.{col, expr}

class StemmerSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("minimal stemmer: SQL expression equals the Scala mirror on vocab + edges") {
    import spark.implicits._
    val edges = Seq("s", "as", "ss", "us", "bus", "miss", "dogs", "cats",
      "dies", "ties", "cries", "flies", "ponies", "aies", "eies",
      "goes", "does", "gases", "shoes", "pies", "runs", "focus", "is")
    val vocab = graft.synth.CorpusSynth.corpus(spark, 500L, seed = 9L)
      .select("text").as[String].collect()
      .flatMap(_.split(' ')).filter(_.nonEmpty).distinct.toSeq
    val words = (edges ++ vocab).distinct
    val got = words.toDF("w")
      .select(col("w"), expr(graft.analysis.Stemmer.stemSql("w")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.foreach { w =>
      assert(got(w) == graft.analysis.Stemmer.stem(w), s"word '$w'")
    }
    // spot checks of the reference rules
    assert(graft.analysis.Stemmer.stem("dogs") == "dog")
    assert(graft.analysis.Stemmer.stem("ponies") == "pony")
    assert(graft.analysis.Stemmer.stem("miss") == "miss")
    assert(graft.analysis.Stemmer.stem("focus") == "focus")
    assert(graft.analysis.Stemmer.stem("dies") == "dy") // ies→y behind a consonant
    assert(graft.analysis.Stemmer.stem("goes") == "goes")
  }
}

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, HtmlCodec, Token}

class AnalyzerSpec extends AnyFunSuite {

  test("tokenizer: alphanumeric runs, lowercase, positions") {
    assert(Analyzer.tokenizeRaw("Hello, World-42!").toList ==
      List(Token("hello", 0), Token("world", 1), Token("42", 2)))
  }

  test("stop filter preserves position gaps (reference StopFilter semantics)") {
    val toks = Analyzer.tokenize("the quick fox and a dog")
    assert(toks.toList == List(Token("quick", 1), Token("fox", 2), Token("dog", 5)))
  }

  test("stop set is the classic 33-word English list") {
    assert(Analyzer.EnglishStopWords.size == 33)
    assert(Analyzer.EnglishStopWords("the") && Analyzer.EnglishStopWords("with"))
    assert(!Analyzer.EnglishStopWords("from")) // not in the 33-word list
  }

  test("maxTokenLength=255: overlong runs split at the limit") {
    val long = "x" * 600
    val toks = Analyzer.tokenizeRaw(long)
    assert(toks.map(_.term.length).toList == List(255, 255, 90))
    assert(toks.map(_.pos).toList == List(0, 1, 2))
  }

  test("analyze: per-term tf + positions + dl, terms sorted") {
    val a = Analyzer.analyze("cat dog the cat")
    assert(a.dl == 3) // 'the' stopped
    assert(a.terms.map(_.term).toList == List("cat", "dog"))
    val cat = a.terms.find(_.term == "cat").get
    assert(cat.tf == 2 && cat.positions.toList == List(0, 3))
  }

  test("positionIncrementGap: tokenizeValues semantics + joinValues equivalence") {
    // reference semantics: value-1 positions offset by raw-len(v0) + gap
    val toks = Analyzer.tokenizeValues(Seq("quick fox", "the dog"), 100)
    assert(toks.toList ==
      List(Token("quick", 0), Token("fox", 1), Token("dog", 103)))
    // the single-text composition is token- and position-identical to the
    // reference multivalued analysis, and dl (norms) is unchanged —
    // differential over deterministic pseudo-random word lists that mix
    // stopwords, empties, punctuation and multi-value counts
    val words = Array("the", "quick", "fox", "and", "dog", "", "x-y", "42")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val values = Seq.fill(1 + rnd.nextInt(4))(
        Seq.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length)))
          .mkString(" "))
      val gap = rnd.nextInt(5) * 50
      val joined = Analyzer.joinValues(values, gap)
      assert(Analyzer.tokenize(joined).toList ==
        Analyzer.tokenizeValues(values, gap).toList, s"$values gap=$gap")
      assert(Analyzer.countTokens(joined) ==
        Analyzer.tokenizeValues(values, gap).length, s"dl of $values")
    }
  }

  test("html render/extract roundtrip is byte-identical (per-row invariant)") {
    val texts = Seq("plain words here", "with <angle> & \"quotes\" and 'apos'",
      "a  b   c", "",
      // entity-LIKE literals: escape("&lt;") = "&amp;lt;" must come back
      // as "&lt;", not double-unescape to "<" (requires &amp; decoded LAST)
      "literal &lt; and &amp; and &quot; stay literal", "&amp;amp;", "&#39;x&#39;")
    texts.foreach { t =>
      assert(HtmlCodec.extractText(HtmlCodec.render("t", t)) == t)
    }
  }
}
