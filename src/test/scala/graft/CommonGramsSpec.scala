package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzer

/** Differential test of the CommonGrams postings (stop-adjacent bigram
  * tokens emitted at index time) vs brute-force recomputation from the
  * raw corpus text.
  */
class CommonGramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("gram postings == brute-force stop-adjacent pairs with per-doc tf") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val stop = Analyzer.EnglishStopWords
    val expect = docs.flatMap { case (id, text) =>
      text.split(' ').filter(_.nonEmpty).sliding(2).collect {
        case Array(a, b) if stop.contains(a) || stop.contains(b) =>
          (s"${a}_$b", id)
      }
    }.groupBy(identity)
      .map { case ((g, id), xs) => (g, id, xs.length.toLong) }.toSet
    val got = graft.index.CommonGrams.gramPostings(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("phrase-with-stopword docs come from ONE gram's postings") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val expect = docs.flatMap { case (id, text) =>
      val toks = text.split(' ').filter(_.nonEmpty)
      val tf = toks.sliding(2).count {
        case Array("the", "spark") => true
        case _ => false
      }
      if (tf > 0) Some((id, tf.toLong)) else None
    }.toSet
    val got = graft.index.CommonGrams.phraseDocs(spark, dir, "the", "spark")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "fixture phrase must occur at sf0.001")
  }
}
