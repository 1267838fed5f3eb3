package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer
import graft.codec.SmallFloat
import graft.search.MultiField

/** Cross-field dismax vs a driver-side brute-force recomputation of
  * per-field BM25 (field-local docCount/avgdl/df/norms) on sf0.001.
  */
class MultiFieldSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("multifield dismax equals brute-force per-field BM25") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val qTerms = Seq("spark", "merge")
    val tie = 0.3
    val got = MultiField.dismaxTopK(spark, dir, qTerms, tie, 10, 1024L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val stop = Analyzer.EnglishStopWords
    val fields = Seq("body", "title")
    def toks(text: String, f: String): Array[String] = {
      val ws = text.split(' ')
      (if (f == "title") ws.take(MultiField.TitleWords) else ws)
        .filter(t => t.nonEmpty && !stop(t))
    }
    // per-(doc, field) lengths
    val dls: Map[(Long, String), Int] = (for {
      (id, text) <- docs; f <- fields
      n = toks(text, f).length if n > 0
    } yield (id, f) -> n).toMap
    val n: Map[String, Long] =
      fields.map(f => f -> dls.count(_._1._2 == f).toLong).toMap
    val sttf: Map[String, Long] =
      fields.map(f => f -> dls.collect { case ((_, g), d) if g == f => d.toLong }.sum).toMap
    val df: Map[(String, String), Long] = (for {
      f <- fields; t <- qTerms
    } yield (f, t) -> docs.count { case (_, tx) => toks(tx, f).contains(t) }.toLong).toMap
    // per-TERM dismax across fields, summed over terms (DisMaxQParser:
    // one DisjunctionMaxQuery per query term)
    def score(id: Long, text: String): Option[Double] = {
      val perTerm = qTerms.sorted.flatMap { t =>
        val fieldScores = fields.flatMap { f =>
          val ts = toks(text, f)
          val tf = ts.count(_ == t)
          if (tf == 0) None
          else {
            val ldl = SmallFloat.byte4ToInt(SmallFloat.intToByte4(dls((id, f))))
            val idf = math.log(1d + (n(f) - df((f, t)) + 0.5) / (df((f, t)) + 0.5))
            val avg = sttf(f).toDouble / n(f)
            Some(idf * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * ldl / avg)))
          }
        }
        if (fieldScores.isEmpty) None
        else {
          val mx = fieldScores.max
          Some(mx + tie * (fieldScores.sum - mx))
        }
      }
      if (perTerm.isEmpty) None else Some(perTerm.sum)
    }
    val expected = docs.flatMap { case (id, tx) => score(id, tx).map(id -> _) }
      .sortBy { case (id, s) => (-s, id) }.take(10).toList
    assert(got == expected)
    assert(got.nonEmpty)
    // title field really contributes: some doc has a query term in its
    // first 4 tokens (otherwise the test is vacuous for 'title')
    assert(docs.exists { case (_, tx) => toks(tx, "title").exists(qTerms.contains) })
  }
}
