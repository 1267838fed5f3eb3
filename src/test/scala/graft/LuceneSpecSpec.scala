package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec.LuceneSpec

class LuceneSpecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(1234)

  test("idf: hand-computed fixture values (8.x formula)") {
    // N=3, df=2: ln(1 + 1.5/2.5) = ln(1.6)
    assert(math.abs(LuceneSpec.idf(2, 3) - math.log(1.6).toFloat) < 1e-9)
    // df == N: idf stays > 0 (ln(1 + 0.5/(N+0.5)))
    assert(LuceneSpec.idf(100, 100) > 0f)
  }

  test("hand-scored 3-doc corpus, query 'cat' (SURVEY.md §5.2 fixture)") {
    // d0: "cat dog" dl=2 | d1: "cat cat fish" dl=3 | d2: "dog bird bird bird" dl=4
    // N=3, sttf=9, avgdl=3; 'cat' df=2, idf=ln(1.6)≈0.470003629
    val s = new LuceneSpec.TermScorer(docFreq = 2, docCount = 3, sumTotalTermFreq = 9)
    val nb = (dl: Int) => graft.codec.SmallFloat.intToByte4(dl).toInt & 0xff
    // d0: tf=1, dl=2: denom=k1*(0.25+0.75*2/3)=1.2*0.75=0.9; score=w*1/(1+0.9)=w/1.9
    assert(math.abs(s.score(1f, nb(2)) - 0.470003629f / 1.9f) < 1e-6)
    // d1: tf=2, dl=3: denom=1.2*1.0=1.2; score=w*2/(2+1.2)=w*0.625
    assert(math.abs(s.score(2f, nb(3)) - 0.470003629f * 0.625f) < 1e-6)
  }

  test("property: score finite, non-negative, monotone ↑tf, anti-monotone ↑dl, bound dominates") {
    (0 until 500).foreach { _ =>
      val n    = rnd.nextInt(1000000).toLong + 1
      val df   = rnd.nextLong().abs % n + 1
      val sttf = n * (rnd.nextInt(500) + 1)
      val tf   = rnd.nextInt(255) + 1
      val nbi  = rnd.nextInt(256)
      val s = new LuceneSpec.TermScorer(df, n, sttf)
      val sc = s.score(tf.toFloat, nbi)
      assert(!sc.isNaN && !sc.isInfinite && sc >= 0f)
      assert(s.score(tf.toFloat + 1, nbi) >= sc)               // ↑tf
      if (nbi < 255) assert(s.score(tf.toFloat, nbi + 1) <= sc) // ↑dl
      assert(s.maxScore(tf + 1, graft.codec.SmallFloat.byte4ToInt(nbi.toByte)) >= sc)
    }
  }

  test("hit ordering: score desc, docID asc tie-break") {
    val hits = Seq((5L, 1.0f), (2L, 2.0f), (9L, 2.0f), (1L, 0.5f))
    assert(hits.sorted(LuceneSpec.hitOrdering).map(_._1) == Seq(2L, 9L, 5L, 1L))
  }
}
