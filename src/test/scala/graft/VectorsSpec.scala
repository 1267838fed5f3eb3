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

  test("IVF k-means centroids are scheduling-independent (integer sums)") {
    import spark.implicits._
    val ds = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
    // identical input under different partitionings must produce
    // byte-identical centroids — the exactly-associative quantized sums
    val c1 = Vectors.kmeansCentroids(spark, ds.repartition(3), 8)
    val c2 = Vectors.kmeansCentroids(spark, ds.repartition(17), 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("IVF probe recall is high on a clustered corpus at the 10% budget") {
    import spark.implicits._
    val dim = 32
    def h(a: Long, b: Long): Double = Vectors.hashUnit(a, b)
    val all: Array[(Long, Array[Float])] = Array.tabulate(600) { i =>
      val c = i % 12
      (i.toLong, Array.tabulate(dim)(d =>
        (h(100L + c, d) + 0.25 * h(5000L + i, d)).toFloat))
    }
    val idx = Vectors.ivfIndexOfDf(spark, "spec-clustered",
      all.toSeq.toDF("vec_id", "embedding"))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val recalls = Seq(0L, 5L, 11L, 100L, 307L).map { q =>
      val qi = q.toInt
      val brute = all.indices.filter(_ != qi)
        .map(j => (all(j)._1, math.round(cos(all(qi)._2, all(j)._2) * 1e6)))
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
      val ivf = topIds(Vectors.annIvfTopKOn(spark, idx, q, 10)).toSet
      ivf.intersect(brute).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"clustered IVF recall too low: $recalls")
  }

  test("sq8 ANN: high recall vs brute force at 4x oversample, deterministic") {
    val dir = "/root/testdata/sf0.01"
    val qids = Seq(0L, 7L, 42L)
    val recalls = qids.map { q =>
      val brute = Vectors.annBruteTopK(spark, dir, q, 10)
        .collect().map(_.getLong(0)).toSet
      val sq = Vectors.annSq8TopK(spark, dir, q, 10)
        .collect().map(_.getLong(0)).toSet
      brute.intersect(sq).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"sq8 recall too low: $recalls")
    // deterministic: identical result on a second run
    val a = Vectors.annSq8TopK(spark, dir, 0L, 10).collect().map(_.getLong(0)).toSeq
    val b = Vectors.annSq8TopK(spark, dir, 0L, 10).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("sketch is deterministic and hamming is a plausible angle proxy") {
    val v = Array.tabulate(64)(i => (i % 7 - 3).toFloat / 3f)
    assert(Vectors.sketchOf(v).toSeq == Vectors.sketchOf(v.clone()).toSeq)
    val w = v.map(x => -x)
    assert(Vectors.hamming(Vectors.sketchOf(v), Vectors.sketchOf(v)) == 0)
    // antipodal vector flips every sign bit
    assert(Vectors.hamming(Vectors.sketchOf(v), Vectors.sketchOf(w)) == Vectors.SketchBits)
  }

  test("stream kmeans equals a driver-side integer-grid Lloyd replay") {
    import spark.implicits._
    val k = 4
    // half-away-from-zero like SQL round() (math.round is half-to-+inf)
    def q1000(x: Double): Long =
      if (x >= 0) math.floor(x * 1000 + 0.5).toLong
      else -math.floor(-x * 1000 + 0.5).toLong
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(x => q1000(x.toDouble)) }
    val byId = vecs.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def assign(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      vecs.map { case (id, v) =>
        val (cid, d) = cents.map { case (c, cv) => (c, dist(v, cv)) }
          .minBy { case (c, d) => (d, c) }
        id -> ((cid, d))
      }.toMap
    val init = vecs.filter(_._1 < k).map { case (id, v) => (id, v) }.toSeq
    val a1 = assign(init)
    val c1 = a1.toSeq.groupBy(_._2._1).map { case (cid, members) =>
      val vs = members.map(m => byId(m._1))
      cid -> Array.tabulate(vs.head.length)(i =>
        math.floor(vs.map(_(i)).sum / vs.size.toDouble).toLong)
    }.toSeq
    val expect = assign(c1)
    val got = Vectors.streamKmeans(spark, dir, k, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).toSet.size > 1) // real multi-cluster split
  }
}
