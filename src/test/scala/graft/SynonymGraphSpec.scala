package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, SynRule, SynonymGraph}
import graft.index.SynonymIndex

class SynonymGraphSpec extends AnyFunSuite {

  private val eq = SynonymGraph.equivalence("spark", "flame")
  private val mw = SynRule(List("big", "data"), List("bigdata"))

  private def termsOf(text: String, rules: Seq[SynRule]) =
    SynonymGraph.analyze(text, rules).terms.map(t => t.term -> t).toMap

  test("equivalence injects the variant at the source position") {
    val m = termsOf("fast spark join", eq)
    assert(m.keySet == Set("fast", "spark", "flame", "join"))
    assert(m("flame").positions.toSeq == m("spark").positions.toSeq)
    assert(m("flame").tf == 1)
  }

  test("equivalence is symmetric") {
    val m = termsOf("flame query", eq)
    assert(m("spark").positions.toSeq == m("flame").positions.toSeq)
  }

  test("dl counts only original surviving tokens (discountOverlaps)") {
    val a = SynonymGraph.analyze("fast spark join", eq)
    assert(a.dl == 3)
    val plain = Analyzer.analyze("fast spark join")
    assert(a.dl == plain.dl)
  }

  test("multi-token input matches adjacent tokens, injects at first pos") {
    val m = termsOf("the big data table", Seq(mw))
    assert(m.contains("bigdata"))
    // raw positions: the=0 big=1 data=2 table=3; injected at 1
    assert(m("bigdata").positions.toSeq == Seq(1))
    // originals kept
    assert(m.contains("big") && m.contains("data"))
  }

  test("non-adjacent input tokens do not match") {
    val m = termsOf("big slow data", Seq(mw))
    assert(!m.contains("bigdata"))
  }

  test("parse-then-jump: non-overlapping matches") {
    val m = termsOf("big data big data", Seq(mw))
    assert(m("bigdata").tf == 2)
    assert(m("bigdata").positions.toSeq == Seq(0, 2))
  }

  test("longest rule wins at a position") {
    val rules = Seq(
      SynRule(List("big"), List("large")),
      SynRule(List("big", "data"), List("bigdata")))
    val m = termsOf("big data", rules)
    assert(m.contains("bigdata"))
    assert(!m.contains("large"), "two-token match must shadow the one-token rule")
    // after the jump, 'data' alone matches nothing
  }

  test("stop filter drops stop-word outputs and originals after injection") {
    val rules = Seq(SynRule(List("spark"), List("the")))
    val a = SynonymGraph.analyze("spark join", rules)
    val terms = a.terms.map(_.term).toSet
    assert(terms == Set("spark", "join"), "injected stop word must be dropped")
  }

  test("no rules reduces to the standard analyzer") {
    val a = SynonymGraph.analyze("fast spark join the table", Nil)
    val b = Analyzer.analyze("fast spark join the table")
    assert(a.dl == b.dl)
    assert(a.terms.map(t => (t.term, t.tf, t.positions.toSeq)).toSeq ==
      b.terms.map(t => (t.term, t.tf, t.positions.toSeq)).toSeq)
  }

  test("sf0.001: injected variant's postings equal the source term's") {
    val s = SparkTestBase.spark
    val sf = "/root/testdata/sf0.001"
    val syn = SynonymIndex.synonymIndex(s, sf)
    val std = IndexCache.documentsIndex(s, sf)
    import org.apache.spark.sql.functions._
    def stats(v: graft.index.IndexView, t: String): (Long, Long) = {
      val r = v.terms.where(col("term") === t)
        .agg(coalesce(sum("df"), lit(0L)), coalesce(sum("ctf"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(stats(syn, "flame") == stats(std, "spark"))
    assert(stats(syn, "spark") == stats(std, "spark"))
    // norms unchanged: doc-length table identical
    val dlSyn = syn.docmeta.toDF().select("doc_id", "dl")
    val dlStd = std.docmeta.toDF().select("doc_id", "dl")
    assert(dlSyn.except(dlStd).isEmpty && dlStd.except(dlSyn).isEmpty)
  }
}
