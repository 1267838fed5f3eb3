package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vectors

/** ANN operators: brute-force cosine vs driver embeddings table, LSH
  * variant recall against the brute-force baseline.
  */
class VectorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def topIds(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  test("brute-force cosine matches a driver-side recomputation") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val q = vecs(0L)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = vecs.iterator.filter(_._1 != 0L)
      .map { case (id, v) => (id, math.round(cos(q, v) * 1e6)) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = Vectors.annBruteTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("sketch-rerank recall@10 vs brute force meets the budgeted target") {
    val brute = topIds(Vectors.annBruteTopK(spark, dir)).toSet
    val lsh = topIds(Vectors.annLshTopK(spark, dir)).toSet
    // two-stage sketch+rerank at a 10% exact-scan budget: recall >= 0.8
    // for this query (corpus-average 0.94+ measured by graft.AnnRecall)
    assert(lsh.intersect(brute).size >= 8, s"recall too low: $lsh vs $brute")
  }

  test("sketch is deterministic and hamming is a plausible angle proxy") {
    val v = Array.tabulate(64)(i => (i % 7 - 3).toFloat / 3f)
    assert(Vectors.sketchOf(v).toSeq == Vectors.sketchOf(v.clone()).toSeq)
    val w = v.map(x => -x)
    assert(Vectors.hamming(Vectors.sketchOf(v), Vectors.sketchOf(v)) == 0)
    // antipodal vector flips every sign bit
    assert(Vectors.hamming(Vectors.sketchOf(v), Vectors.sketchOf(w)) == Vectors.SketchBits)
  }
}
