package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Indexer
import graft.search.{Interval => I, MoreQueries}

/** Minimal-interval algebra: unit evaluation on hand positions, the
  * minimality law (no result interval properly contains another), and
  * distributed consistency with the span operators.
  */
class IntervalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ev(e: I.Expr, pos: Map[String, Array[Int]]): List[(Int, Int)] =
    I.eval(e, pos).map(iv => (iv._1, iv._2)).toList

  test("term / or: union is minimal and sorted") {
    val pos = Map("a" -> Array(1, 5, 9), "b" -> Array(5, 7))
    assert(ev(I.Term("a"), pos) == List((1, 1), (5, 5), (9, 9)))
    assert(ev(I.Or(Seq(I.Term("a"), I.Term("b"))), pos) ==
      List((1, 1), (5, 5), (7, 7), (9, 9)))
  }

  test("ordered: minimal intervals, nested ones dropped, gaps filtered") {
    // a at 1,5; b at 10 → only (5,10) is minimal
    val p1 = Map("a" -> Array(1, 5), "b" -> Array(10))
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Term("b"))), p1) == List((5, 10)))
    // a at 1; b at 5,8 → only (1,5)
    val p2 = Map("a" -> Array(1), "b" -> Array(5, 8))
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Term("b"))), p2) == List((1, 5)))
    // maxgaps: (5,10) has 4 uncovered inner positions
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Term("b")), maxGaps = 3), p1) == Nil)
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Term("b")), maxGaps = 4), p1) ==
      List((5, 10)))
    // three children, ordered chaining
    val p3 = Map("a" -> Array(1), "b" -> Array(3, 9), "c" -> Array(5))
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Term("b"), I.Term("c"))), p3) ==
      List((1, 5)))
    // or-child inside ordered
    val p4 = Map("a" -> Array(2), "b" -> Array(9), "c" -> Array(4))
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Or(Seq(I.Term("b"), I.Term("c"))))), p4) ==
      List((2, 4)))
  }

  test("unordered + maxwidth: min-window sweep is minimal") {
    val pos = Map("a" -> Array(1, 20), "b" -> Array(3, 18))
    val got = ev(I.Unordered(Seq(I.Term("a"), I.Term("b"))), pos)
    assert(got == List((1, 3), (18, 20)))
    assert(ev(I.MaxWidth(I.Unordered(Seq(I.Term("a"), I.Term("b"))), 3), pos) == got)
    assert(ev(I.MaxWidth(I.Unordered(Seq(I.Term("a"), I.Term("b"))), 2), pos).isEmpty)
    // minimality law on a messier case
    val messy = Map("a" -> Array(1, 4, 11), "b" -> Array(2, 9))
    val ivs = ev(I.Unordered(Seq(I.Term("a"), I.Term("b"))), messy)
    for (i <- ivs; j <- ivs if i != j)
      assert(!(i._1 <= j._1 && j._2 <= i._2), s"$i contains $j")
  }

  test("phrase / containing / containedBy combinators") {
    val pos = Map("a" -> Array(1, 10), "b" -> Array(2, 14), "c" -> Array(12))
    // phrase = ordered with zero gaps: only (1,2) is adjacent
    assert(ev(I.PhraseOf(Seq(I.Term("a"), I.Term("b"))), pos) == List((1, 2)))
    // unordered (a,b) windows: (1,2), (2,10), (10,14); only (10,14)
    // contains c@12
    val ab = I.Unordered(Seq(I.Term("a"), I.Term("b")))
    assert(ev(ab, pos) == List((1, 2), (2, 10), (10, 14)))
    assert(ev(I.Containing(ab, I.Term("c")), pos) == List((10, 14)))
    assert(ev(I.Containing(ab, I.Term("c"), negate = true), pos) ==
      List((1, 2), (2, 10)))
    // c@12 is contained by (10,14)
    assert(ev(I.ContainedBy(I.Term("c"), ab), pos) == List((12, 12)))
    assert(ev(I.ContainedBy(I.Term("a"), ab, negate = true), pos) == Nil)
  }

  test("before / after / overlapping combinators") {
    val pos = Map("a" -> Array(1, 10), "b" -> Array(2, 14), "c" -> Array(12))
    // a-intervals before some c@12: a@1 and a@10 both end before 12
    assert(ev(I.Before(I.Term("a"), I.Term("c")), pos) == List((1, 1), (10, 10)))
    assert(ev(I.Before(I.Term("b"), I.Term("c")), pos) == List((2, 2)))
    // after: b@14 starts after c@12 ends
    assert(ev(I.After(I.Term("b"), I.Term("c")), pos) == List((14, 14)))
    assert(ev(I.After(I.Term("a"), I.Term("c")), pos) == Nil)
    // overlapping: unordered (a,b) windows (1,2),(2,10),(10,14); c@12
    // overlaps only (10,14)
    val ab = I.Unordered(Seq(I.Term("a"), I.Term("b")))
    assert(ev(I.Overlapping(ab, I.Term("c")), pos) == List((10, 14)))
    assert(ev(I.Overlapping(ab, I.Term("c"), negate = true), pos) ==
      List((1, 2), (2, 10)))
  }

  test("negated filter side is NOT required: docs lacking it still match") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tiny = Seq(
      (0L, "u", "alpha beta gamma"),   // contains gamma -> excluded
      (1L, "u", "alpha beta delta"),   // no gamma at all -> must match
      (2L, "u", "alpha delta beta")    // gamma-free, non-adjacent
    ).toDF("doc_id", "url", "text")
    val v = Indexer.buildTables(spark, Indexer.asDocInput(spark, tiny), 16L)
    val got = I.matches(spark, v,
      I.Containing(I.PhraseOf(Seq(I.Term("alpha"), I.Term("beta"))),
        I.Term("gamma"), negate = true))
      .collect().map(_.getLong(0)).toSet
    // doc 0's (alpha,beta)@(0,1) does NOT contain gamma@2 -> matches;
    // doc 1 has no gamma and must not be dropped by the doc prefilter
    assert(got == Set(0L, 1L))
    val overlap = I.matches(spark, v,
      I.Overlapping(I.PhraseOf(Seq(I.Term("alpha"), I.Term("beta"))),
        I.Term("gamma"), negate = true))
      .collect().map(_.getLong(0)).toSet
    assert(overlap == Set(0L, 1L))
  }

  test("atLeast(n of k): minimal windows equal brute-force subset enumeration") {
    val rnd = new scala.util.Random(11)
    def bruteAtLeast(n: Int, lists: Seq[Array[Int]]): List[(Int, Int)] = {
      val wins = lists.indices.combinations(n).flatMap { sub =>
        val ls = sub.map(lists)
        if (ls.exists(_.isEmpty)) Iterator.empty
        else {
          // all tuples: one position per chosen child
          def tuples(rest: List[Array[Int]]): Iterator[List[Int]] = rest match {
            case Nil => Iterator(Nil)
            case h :: t => h.iterator.flatMap(p => tuples(t).map(p :: _))
          }
          tuples(ls.toList).map(ps => (ps.min, ps.max))
        }
      }.toSeq.distinct
      wins.filter(w => !wins.exists(o =>
        o != w && w._1 <= o._1 && o._2 <= w._2)).sorted.toList
    }
    for (iter <- 1 to 100) {
      val k = 2 + rnd.nextInt(3)
      val n = 1 + rnd.nextInt(k)
      val lists = Seq.fill(k)(
        Array.fill(rnd.nextInt(4))(rnd.nextInt(15)).distinct.sorted)
      val vocab = lists.indices.map(i => s"t$i")
      val pos = vocab.zip(lists).toMap
      val got = ev(I.AtLeast(n, vocab.map(I.Term(_))), pos)
      val want = bruteAtLeast(n, lists)
      assert(got == want, s"iter=$iter n=$n lists=${lists.map(_.toSeq)}")
    }
    // 2-of-3 sanity: the pair windows (1,5), (1,6), (5,6); (1,6)
    // properly contains (5,6) and is dropped, the others are minimal
    val pos = Map("a" -> Array(1), "b" -> Array(5), "c" -> Array(6))
    assert(ev(I.AtLeast(2, Seq(I.Term("a"), I.Term("b"), I.Term("c"))), pos) ==
      List((1, 5), (5, 6)))
  }

  test("first-n filter keeps only intervals ending before n") {
    val pos = Map("a" -> Array(2, 8), "b" -> Array(3, 9))
    val ph = I.PhraseOf(Seq(I.Term("a"), I.Term("b")))
    assert(ev(ph, pos) == List((2, 3), (8, 9)))
    assert(ev(I.First(ph, 4), pos) == List((2, 3)))
    assert(ev(I.First(ph, 3), pos) == Nil) // end 3 is NOT < 3
  }

  test("extend pads intervals, clamps at 0, and re-minimalizes") {
    val pos = Map("a" -> Array(0, 3), "b" -> Array(1, 4))
    // phrase (a,b): (0,1) and (3,4); extend before=2 after=1 ->
    // (0,2) [clamped] and (1,5): neither contains the other
    val ph = I.PhraseOf(Seq(I.Term("a"), I.Term("b")))
    assert(ev(I.Extend(ph, 2, 1), pos) == List((0, 2), (1, 5)))
    // padding counts as covered: ordered(extend(a,0,1), b) with
    // maxgaps=0 matches a@0 (covers 0-1) then b... build via gaps check
    val pos2 = Map("a" -> Array(0), "b" -> Array(2))
    assert(ev(I.Ordered(Seq(I.Extend(I.Term("a"), 0, 1), I.Term("b")),
      maxGaps = 0), pos2) == List((0, 2)))
    assert(ev(I.Ordered(Seq(I.Term("a"), I.Term("b")),
      maxGaps = 0), pos2) == Nil) // without the pad, gap 1 > 0
  }

  test("prefix/wildcard interval sources resolve against the term dictionary") {
    import spark.implicits._
    val tiny = Seq(
      (0L, "u", "alpha alps beta"),
      (1L, "u", "alto beta gamma"),
      (2L, "u", "beta gamma delta")
    ).toDF("doc_id", "url", "text")
    val v = Indexer.buildTables(spark, Indexer.asDocInput(spark, tiny), 16L)
    // prefix al* = {alpha, alps, alto}; ordered(al*, beta)
    val got = I.matches(spark, v,
      I.Ordered(Seq(I.Prefix("al"), I.Term("beta"))))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(0L -> 1, 1L -> 1))
    val wc = I.matches(spark, v,
      I.Ordered(Seq(I.Wildcard("al?s"), I.Term("beta"))))
      .collect().map(_.getLong(0)).toSet
    assert(wc == Set(0L)) // only 'alps'
    // fuzzy: 'alpa'~1 = {alpha (+h), alps (s->a)}; alto is 2 edits
    val fz = I.matches(spark, v,
      I.Ordered(Seq(I.Fuzzy("alpa", 1), I.Term("beta"))))
      .collect().map(_.getLong(0)).toSet
    assert(fz == Set(0L))
    // unresolved use fails fast
    intercept[RuntimeException] {
      I.eval(I.Prefix("al"), Map.empty)
    }
  }

  test("property: ordered/unordered minimal sets equal brute force on random positions") {
    val rnd = new scala.util.Random(7)
    // brute-force reference: enumerate ALL tuples, build their spans,
    // then keep the minimal ones
    def bruteMinimal(spans: Seq[(Int, Int)]): List[(Int, Int)] =
      spans.distinct.filter(s =>
        !spans.distinct.exists(o => o != s && s._1 <= o._1 && o._2 <= s._2))
        .sorted.toList
    for (_ <- 1 to 200) {
      val k = 2 + rnd.nextInt(2) // 2-3 lists
      val universe = rnd.shuffle((0 until 30).toList)
      var at = 0
      val lists = (0 until k).map { _ =>
        val n = 1 + rnd.nextInt(4)
        val l = universe.slice(at, at + n).sorted.toArray // disjoint positions
        at += n
        l
      }
      val pos = lists.zipWithIndex.map { case (l, i) => s"t$i" -> l }.toMap
      val exprs = (0 until k).map(i => I.Term(s"t$i"))
      // unordered: all tuples, window = (min, max)
      val tuples = lists.foldLeft(Seq(Seq.empty[Int])) { (acc, l) =>
        for (t <- acc; p <- l) yield t :+ p
      }
      val unoExpected = bruteMinimal(tuples.map(t => (t.min, t.max)))
      assert(ev(I.Unordered(exprs), pos) == unoExpected, s"unordered $pos")
      // ordered: strictly increasing tuples only
      val ordExpected = bruteMinimal(tuples
        .filter(t => t.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
        .map(t => (t.head, t.last)))
      assert(ev(I.Ordered(exprs), pos) == ordExpected, s"ordered $pos")
    }
  }

  test("distributed matches agree with span operators on the corpus") {
    import graft.synth.CorpusSynth
    val view = Indexer.buildTables(spark,
      Indexer.asDocInput(spark, CorpusSynth.corpusWithIds(spark, 800, seed = 21L)),
      segSize = 256L).persisted()
    // unordered interval of 2 terms within width w  ==  unordered span
    // with slop w-2 (width - length <= slop)
    val terms = Seq("w0000", "w0001")
    val viaIntervals = I.matches(spark, view,
      I.MaxWidth(I.Unordered(terms.map(I.Term)), 6))
      .collect().map(_.getLong(0)).toSet
    val viaSpans = MoreQueries.spanNearUnordered(spark, view, terms, 4)
      .collect().map(_.getLong(0)).toSet
    assert(viaIntervals == viaSpans)
    assert(viaIntervals.nonEmpty)
  }
}
