package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.Indexer
import graft.search.{DoubleOracle, ExactSearch, MoreQueries, QueryCompiler, QueryRequest, Query => Q}
import graft.synth.CorpusSynth

/** Query-compiler tests: rewrite normalization laws (structural) and
  * differential equivalence of compiled nested trees vs hand-composed
  * primitives.
  */
class QueryCompilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  lazy val view = {
    val v = Indexer.buildTables(spark,
      Indexer.asDocInput(spark, CorpusSynth.corpusWithIds(spark, 1200, seed = 21L)),
      segSize = 256L).persisted()
    v.postings.count()
    v
  }

  private def close(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-12 * math.max(1.0, math.abs(a))

  private def scoredMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("rewrite: boost folding, single-clause collapse, disjunction splice") {
    assert(QueryCompiler.rewrite(view, Q.Boost(Q.Boost(Q.Term("a"), 2.0), 3.0))
      == Q.Boost(Q.Term("a"), 6.0))
    assert(QueryCompiler.rewrite(view, Q.Boost(Q.Term("a"), 1.0)) == Q.Term("a"))
    assert(QueryCompiler.rewrite(view, Q.Bool(should = Seq(Q.Term("a")))) == Q.Term("a"))
    assert(QueryCompiler.rewrite(view, Q.Bool(must = Seq(Q.Term("a")))) == Q.Term("a"))
    assert(QueryCompiler.rewrite(view,
      Q.Bool(should = Seq(Q.Bool(should = Seq(Q.Term("a"), Q.Term("b"))), Q.Term("c"))))
      == Q.Bool(should = Seq(Q.Term("a"), Q.Term("b"), Q.Term("c"))))
    // MTQ expansion to constant-score over dictionary terms
    QueryCompiler.rewrite(view, Q.Prefix("w000")) match {
      case Q.ConstScore(Q.TermSet(ts), 1.0) =>
        assert(ts.nonEmpty && ts.forall(_.startsWith("w000")))
        assert(ts == MoreQueries.prefixTerms(view, "w000"))
      case other => fail(s"unexpected rewrite: $other")
    }
    // boost under const-score folds into the constant
    assert(QueryCompiler.rewrite(view, Q.Boost(Q.TermSet(Seq("x")), 3.0))
      == Q.ConstScore(Q.TermSet(Seq("x")), 3.0))
  }

  test("leading-wildcard rewrite: reversed-dictionary path == generic rlike path") {
    // pick a suffix that exists in the synth dictionary
    import org.apache.spark.sql.functions.{col, length}
    val suffix = view.terms.select("term").where(length(col("term")) >= 2)
      .orderBy("term").limit(1).collect().head.getString(0).takeRight(2)
    val fast = QueryCompiler.rewrite(view, Q.Wildcard("*" + suffix))
    val slow = Q.ConstScore(Q.TermSet(MoreQueries.wildcardTerms(view, "*" + suffix)))
    assert(fast == slow)
    // mixed patterns must still take the generic path
    assert(QueryCompiler.rewrite(view, Q.Wildcard("*a*b"))
      == Q.ConstScore(Q.TermSet(MoreQueries.wildcardTerms(view, "*a*b"))))
  }

  test("compiled nested tree equals hand-composed primitives") {
    val q = Q.Bool(
      must = Seq(Q.Term("w0002")),
      should = Seq(Q.Term("w0005"), Q.Boost(Q.Term("w0007"), 2.0)),
      mustNot = Seq(Q.Term("w0009")))
    val got = scoredMap(QueryCompiler.compile(spark, view, q, DoubleOracle))
    val s2 = scoredMap(ExactSearch.scored(spark, view, Seq("w0002"), DoubleOracle))
    val s5 = scoredMap(ExactSearch.scored(spark, view, Seq("w0005"), DoubleOracle))
    val s7 = scoredMap(ExactSearch.scored(spark, view, Seq("w0007"), DoubleOracle))
    val excl = MoreQueries.matchingDocs(spark, view, Seq("w0009"))
      .collect().map(_.getLong(0)).toSet
    val expected = s2.collect {
      case (d, s) if !excl(d) =>
        d -> (s + s5.getOrElse(d, 0.0) + 2.0 * s7.getOrElse(d, 0.0))
    }
    assert(got.keySet == expected.keySet)
    assert(got.forall { case (d, s) => close(s, expected(d)) })
    assert(got.nonEmpty)
  }

  test("minShouldMatch over a disjunction matches the exact path") {
    val terms = Seq("w0001", "w0002", "w0003")
    val q = Q.Bool(should = terms.map(Q.Term(_)), minShouldMatch = 2)
    val got = scoredMap(QueryCompiler.compile(spark, view, q, DoubleOracle))
    val ref = scoredMap(ExactSearch.scored(spark, view, terms, DoubleOracle,
      minShouldMatch = 2))
    assert(got.keySet == ref.keySet)
    assert(got.forall { case (d, s) => close(s, ref(d)) })
    assert(got.nonEmpty)
    // msm > #should matches nothing
    assert(QueryCompiler.compile(spark, view,
      Q.Bool(should = Seq(Q.Term("w0001")), minShouldMatch = 2), DoubleOracle)
      .count() == 0)
  }

  test("nested disjunction counts as ONE clause toward minShouldMatch") {
    // msm=2 over [bool(a OR b), c]: requires c AND (a OR b) — a doc
    // with a and b but NOT c must NOT match (splice would wrongly
    // flatten to [a,b,c] and let it through)
    val a = "w0001"; val b = "w0002"; val c = "w0003"
    val q = Q.Bool(
      should = Seq(Q.Bool(should = Seq(Q.Term(a), Q.Term(b))), Q.Term(c)),
      minShouldMatch = 2)
    val got = QueryCompiler.compile(spark, view, q, DoubleOracle)
      .collect().map(_.getLong(0)).toSet
    def docsWith(t: String) = MoreQueries.matchingDocs(spark, view, Seq(t))
      .collect().map(_.getLong(0)).toSet
    val expected = docsWith(c).intersect(docsWith(a) ++ docsWith(b))
    assert(got == expected)
    assert(got.nonEmpty)
    // and some doc matching a+b but not c exists, so the test can fail
    assert((docsWith(a).intersect(docsWith(b)) -- docsWith(c)).nonEmpty)
    // msm<=1 splice still applies (structural)
    assert(QueryCompiler.rewrite(view,
      Q.Bool(should = Seq(Q.Bool(should = Seq(Q.Term(a), Q.Term(b))), Q.Term(c))))
      == Q.Bool(should = Seq(Q.Term(a), Q.Term(b), Q.Term(c))))
    // msm>1 keeps the nested clause intact
    QueryCompiler.rewrite(view, q) match {
      case Q.Bool(sh, _, _, _, 2) => assert(sh.size == 2)
      case other => fail(s"unexpected: $other")
    }
  }

  test("MUST_NOT-only boolean matches nothing (no crash)") {
    val q = Q.Bool(mustNot = Seq(Q.Term("w0001")))
    assert(QueryCompiler.compile(spark, view, q, DoubleOracle).count() == 0)
  }

  test("QueryRequest front door: q + fq == Bool(must, filter)") {
    val req = QueryRequest(Q.Term("w0002"), Seq(Q.Prefix("w001")), 10)
    val viaReq = QueryCompiler.search(spark, view, req, DoubleOracle)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val viaBool = QueryCompiler.topK(spark, view,
      Q.Bool(must = Seq(Q.Term("w0002")), filter = Seq(Q.Prefix("w001"))),
      10, DoubleOracle)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(viaReq == viaBool)
    assert(viaReq.nonEmpty)
  }

  test("FILTER restricts without scoring; phrase clause is match-only") {
    val q = Q.Bool(must = Seq(Q.Term("w0002")), filter = Seq(Q.Prefix("w001")))
    val got = scoredMap(QueryCompiler.compile(spark, view, q, DoubleOracle))
    val base = scoredMap(ExactSearch.scored(spark, view, Seq("w0002"), DoubleOracle))
    val allow = MoreQueries.matchingDocs(spark, view,
      MoreQueries.prefixTerms(view, "w001")).collect().map(_.getLong(0)).toSet
    assert(got == base.filter { case (d, _) => allow(d) })
    assert(got.nonEmpty)

    // phrase in scoring position: BM25-weighted (phrase_tf through the
    // formula with summed slot idfs), added to the MUST score
    val pq = Q.Bool(must = Seq(Q.Term("w0002")),
      should = Seq(Q.Phrase(Seq("w0000", "w0001"))))
    val got2 = scoredMap(QueryCompiler.compile(spark, view, pq, DoubleOracle))
    val phr = scoredMap(MoreQueries.phraseScoredTopK(spark, view,
      Seq("w0000", "w0001"), 0, Int.MaxValue, DoubleOracle))
    assert(phr.nonEmpty && phr.values.forall(_ > 0.0))
    assert(got2.keySet == base.keySet)
    got2.foreach { case (d, s) =>
      val exp = base(d) + phr.getOrElse(d, 0.0)
      assert(close(s, exp), s"doc $d: $s vs $exp")
    }
  }

  test("span and interval clauses compose in the boolean tree") {
    import graft.search.{Interval => I, MoreQueries}
    // span as FILTER: restricts without scoring
    val q = Q.Bool(must = Seq(Q.Term("w0002")),
      filter = Seq(Q.SpanNear(Seq("w0000", "w0001"), slop = 4, ordered = false)))
    val got = scoredMap(QueryCompiler.compile(spark, view, q, DoubleOracle))
    val base = scoredMap(ExactSearch.scored(spark, view, Seq("w0002"), DoubleOracle))
    val allow = MoreQueries.spanNearUnordered(spark, view,
      Seq("w0000", "w0001"), 4).collect().map(_.getLong(0)).toSet
    assert(got == base.filter { case (d, _) => allow(d) })
    // interval clause in scoring position: constant 1.0 added
    val iq = Q.Bool(must = Seq(Q.Term("w0002")),
      should = Seq(Q.IntervalQ(I.MaxWidth(
        I.Unordered(Seq(I.Term("w0000"), I.Term("w0001"))), 6))))
    val got2 = scoredMap(QueryCompiler.compile(spark, view, iq, DoubleOracle))
    val ivDocs = graft.search.Interval.matches(spark, view,
      I.MaxWidth(I.Unordered(Seq(I.Term("w0000"), I.Term("w0001"))), 6))
      .collect().map(_.getLong(0)).toSet
    assert(got2.keySet == base.keySet)
    got2.foreach { case (d, s) =>
      assert(close(s, base(d) + (if (ivDocs(d)) 1.0 else 0.0)))
    }
  }

  test("filterCache: repeated fq reuses the cached doc set, results identical") {
    import graft.search.FilterCache
    val fq = Q.Prefix("w002")
    val q1 = Q.Bool(must = Seq(Q.Term("w0003")), filter = Seq(fq))
    val first = scoredMap(QueryCompiler.compile(spark, view, q1, DoubleOracle))
    val h0 = FilterCache.hits
    // same fq under a DIFFERENT main query: doc set must come from cache
    val q2 = Q.Bool(must = Seq(Q.Term("w0005")), filter = Seq(fq))
    val second = scoredMap(QueryCompiler.compile(spark, view, q2, DoubleOracle))
    assert(FilterCache.hits > h0, "second fq use should hit the cache")
    // and a repeat of the first query is value-identical
    val again = scoredMap(QueryCompiler.compile(spark, view, q1, DoubleOracle))
    assert(again == first)
    assert(second.nonEmpty && first.nonEmpty)
  }

  test("FILTER + SHOULD-only (msm=0): filter-only matches are hits, score 0") {
    // reference semantics (Boolean2ScorerSupplier/ReqOptSumScorer):
    // SHOULD becomes purely optional once a required clause exists
    val q = Q.Bool(should = Seq(Q.Term("w0005")), filter = Seq(Q.Prefix("w001")))
    val got = scoredMap(QueryCompiler.compile(spark, view, q, DoubleOracle))
    val allow = MoreQueries.matchingDocs(spark, view,
      MoreQueries.prefixTerms(view, "w001")).collect().map(_.getLong(0)).toSet
    val s5 = scoredMap(ExactSearch.scored(spark, view, Seq("w0005"), DoubleOracle))
    // every filter-passing doc is a hit; score = its should-score or 0
    assert(got.keySet == allow)
    got.foreach { case (d, s) => assert(close(s, s5.getOrElse(d, 0.0))) }
    // and some hits genuinely have score 0 (matched filter only)
    assert(got.exists(_._2 == 0.0))
    // msm >= 1 restores the SHOULD requirement
    val strict = scoredMap(QueryCompiler.compile(spark, view,
      q.copy(minShouldMatch = 1), DoubleOracle))
    assert(strict.keySet == allow.intersect(s5.keySet))
  }

  test("kernel routing: pure term trees lower to the block-max kernels") {
    import graft.search.QueryParser
    def choice(q: Q) = QueryCompiler.kernelChoice(QueryCompiler.rewrite(view, q))
    // pure distinct-term disjunction (incl. a parsed user string) → BMW
    assert(choice(Q.Bool(should = Seq(Q.Term("a"), Q.Term("b"))))
      == Some((Seq("a", "b"), false)))
    assert(choice(QueryParser.parse("a b c")) == Some((Seq("a", "b", "c"), false)))
    // single term → BMW (1-term disjunction)
    assert(choice(Q.Term("a")) == Some((Seq("a"), false)))
    // pure conjunction → block-max AND
    assert(choice(QueryParser.parse("a AND b")) == Some((Seq("a", "b"), true)))
    // mixed/complex trees keep the exact path
    assert(choice(Q.Bool(should = Seq(Q.Term("a"), Q.Phrase(Seq("b", "c"))))).isEmpty)
    assert(choice(Q.Bool(should = Seq(Q.Term("a"), Q.Boost(Q.Term("b"), 2.0)))).isEmpty)
    assert(choice(Q.Bool(must = Seq(Q.Term("a")), mustNot = Seq(Q.Term("b")))).isEmpty)
    assert(choice(Q.Bool(must = Seq(Q.Term("a")), filter = Seq(Q.Term("b")))).isEmpty)
    assert(choice(Q.Bool(should = Seq(Q.Term("a"), Q.Term("b")), minShouldMatch = 2)).isEmpty)
    // duplicate SHOULD term scores twice on the exact path — must NOT route
    assert(choice(Q.Bool(should = Seq(Q.Term("a"), Q.Term("a")))).isEmpty)
  }

  test("parsed front door through BMW == exact path, ranks AND scores") {
    import graft.search.QueryParser
    def routedTopK(q: Q) =
      QueryCompiler.topK(spark, view, q, 10, DoubleOracle)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    def exactTopK(terms: Seq[String], msm: Int) =
      ExactSearch.topK(spark, view, terms, 10, DoubleOracle, minShouldMatch = msm)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    val cases = Seq(
      ("w0001 w0010 w0100", Seq("w0001", "w0010", "w0100"), 1), // user OR string
      ("w0000 AND w0001", Seq("w0000", "w0001"), 2),            // user AND string
      ("w0005", Seq("w0005"), 1),                               // single term
      ("w0002 zzznotfound w0008",
        Seq("w0002", "zzznotfound", "w0008"), 1))               // missing term in OR
    cases.foreach { case (str, terms, msm) =>
      val q = QueryParser.parse(str)
      assert(QueryCompiler.kernelChoice(QueryCompiler.rewrite(view, q)).nonEmpty,
        s"expected kernel routing for '$str'")
      assert(routedTopK(q) == exactTopK(terms, msm), s"kernel != exact for '$str'")
    }
  }
}
