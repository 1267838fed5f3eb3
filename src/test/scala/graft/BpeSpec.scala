package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Bpe

class BpeSpec extends AnyFunSuite {

  test("training learns merges most-frequent-first with lexicographic ties") {
    val merges = Bpe.train(Seq("low", "lower", "lowest"), 10)
    // (l,o) and (o,w) both occur in 3 words; the lexicographically
    // smaller pair merges first, then the cascade builds the full words
    assert(merges.take(3) ==
      Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(merges.length == 6) // training stops when no pairs remain
  }

  test("encode applies lowest-rank merges first; OOV words still merge") {
    val merges = Bpe.train(Seq("low", "lower", "lowest"), 10)
    assert(Bpe.encode("low", merges) == Seq("low"))
    assert(Bpe.encode("lowest", merges) == Seq("lowest"))
    // OOV: 'slower' was never seen, but its 'lower' suffix merges
    assert(Bpe.encode("slower", merges) == Seq("s", "lower"))
    assert(Bpe.tokenCount("slower", merges) == 2)
    // fully unknown symbols stay as characters
    assert(Bpe.tokenCount("zzz", merges) == 3)
  }

  test("training and encoding are deterministic (pure function of vocab)") {
    val v = Seq("merge", "merger", "stream", "streams", "spark")
    val m1 = Bpe.train(v, 15)
    val m2 = Bpe.train(scala.util.Random.shuffle(v), 15)
    assert(m1 == m2) // input order must not matter
    assert(v.forall(w => Bpe.encode(w, m1) == Bpe.encode(w, m2)))
  }

  test("token counts are positive and bounded by word length") {
    val m = Bpe.train(OracleGen.CorpusVocab, 20)
    OracleGen.CorpusVocab.foreach { w =>
      val c = Bpe.tokenCount(w, m)
      assert(c >= 1 && c <= w.length, s"$w -> $c")
    }
  }
}
