package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.{Analyzer, Porter}
import graft.operators.AnalysisOps

/** Brute-force differentials for the dictionary-routed analysis-filter
  * entries added in round 4 (KeywordRepeat, StemmerOverride, Length,
  * PatternReplace, Truncate): each index-routed dataflow must equal a
  * driver-side re-tokenization of the sf0.001 corpus applying the same
  * filter rule directly. (Value-level parity with DuckDB is the
  * driver's oracle; this pins the Scala dataflows against an
  * independent in-process twin.)
  */
class AnalysisFilterEntriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  /** (doc_id, term) occurrences of the stop-filtered corpus. */
  private lazy val occurrences: Seq[(Long, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
      .flatMap { case (id, tx) =>
        tx.split(' ').iterator
          .filter(t => t.nonEmpty && !Analyzer.EnglishStopWords.contains(t))
          .map(t => (id, t))
      }
  }

  /** df/ctf per key after mapping each occurrence to 1..n output keys. */
  private def stats(f: String => Seq[String]): Map[String, (Long, Long)] =
    occurrences.flatMap { case (id, t) => f(t).map(k => (k, id)) }
      .groupBy(_._1)
      .map { case (k, rows) =>
        (k, (rows.map(_._2).distinct.size.toLong, rows.size.toLong)) }

  private def collect(name: String): Map[String, (Long, Long)] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap

  test("keyword_repeat_df equals brute-force surface+stem emission") {
    val expected = stats(t => Seq(t, Porter.stem(t)).distinct)
    assert(collect("keyword_repeat_df") == expected)
    // the repeat rule must bite: some token exists only as a stem
    assert(expected.keys.exists(k => !occurrences.exists(_._2 == k)))
  }

  test("stemmer_override_df equals brute-force override-then-Porter") {
    val expected = stats(t =>
      Seq(AnalysisOps.StemOverrides.getOrElse(t, Porter.stem(t))))
    assert(collect("stemmer_override_df") == expected)
    // both override lemmas must appear (the override bit is observable)
    assert(AnalysisOps.StemOverrides.values.forall(expected.contains))
  }

  test("length_filter_df equals brute-force length predicate") {
    val expected = stats(t => if (t.length >= 4 && t.length <= 6) Seq(t)
                              else Seq.empty)
    assert(collect("length_filter_df") == expected)
    assert(expected.nonEmpty)
  }

  test("pattern_replace_df equals brute-force vowel strip") {
    val expected = stats { t =>
      val r = t.replaceAll(AnalysisOps.PatternReplaceRegex, "")
      if (r.nonEmpty) Seq(r) else Seq.empty
    }
    assert(collect("pattern_replace_df") == expected)
    // the rewrite must bite: every vowel-bearing term changes form
    assert(expected.keys.exists(k => !occurrences.exists(_._2 == k)))
  }

  test("truncate_df equals brute-force first-4-chars merge") {
    val expected = stats(t => Seq(t.take(4)))
    assert(collect("truncate_df") == expected)
    // truncation must bite: some dictionary term is longer than 4 chars
    assert(expected.keys.exists(k => !occurrences.exists(_._2 == k)))
  }
}
