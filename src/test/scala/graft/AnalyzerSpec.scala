package graft

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

  test("html render/extract roundtrip is byte-identical (per-row invariant)") {
    val texts = Seq("plain words here", "with <angle> & \"quotes\" and 'apos'",
      "a  b   c", "")
    texts.foreach { t =>
      assert(HtmlCodec.extractText(HtmlCodec.render("t", t)) == t)
    }
  }
}
