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

  test("LSH multi-probe recall@10 vs brute force is usable") {
    val brute = topIds(Vectors.annBruteTopK(spark, dir)).toSet
    val lsh = topIds(Vectors.annLshTopK(spark, dir)).toSet
    // approximate by design: require ≥ 40% overlap at sandbox scale
    // (multi-probe over 13 of 4096 buckets scans ~0.3% of the corpus)
    assert(lsh.intersect(brute).size >= 4, s"recall too low: $lsh vs $brute")
  }

  test("bucket assignment is deterministic") {
    val v = Array.tabulate(64)(i => (i % 7 - 3).toFloat / 3f)
    assert(Vectors.bucketOf(v) == Vectors.bucketOf(v.clone()))
  }
}
