package graft.spec

import graft.codec.SmallFloat

/**
 * Executable spec of the reference's BM25 scoring, 8.x formula shape
 * (LUCENE-8563: no (k1+1) numerator), float32 arithmetic throughout —
 * re-derived from the published formula of
 * `lucene/core/src/java/org/apache/lucene/search/similarities/BM25Similarity.java`
 * [8x] (SURVEY.md §2.4):
 *
 *   idf(df, N)    = ln(1 + (N - df + 0.5) / (df + 0.5))          (float)
 *   avgdl         = sumTotalTermFreq / docCount                  (float)
 *   cache[nb]     = 1 / (k1 * (1 - b + b * LENGTH_TABLE[nb] / avgdl))
 *   score(tf, nb) = weight - weight / (1 + tf * cache[nb])
 *   weight        = boost * idf
 *
 * where nb is the unsigned norm byte (lossy-encoded doc length,
 * [[graft.codec.SmallFloat]]), and the `w - w/(1 + tf*inv)` shape is the
 * algebraic rewrite of `w * tf / (tf + denom)` the reference evaluates.
 *
 * This object is the single source of truth used by BOTH execution paths
 * (exact Catalyst and the BMW kernel) in Float32 mode, and by the hand
 * fixtures in the test suite (SURVEY.md §5.2).
 */
object LuceneSpec {
  // double-precision masters (the DoubleOracle path and the DuckDB
  // oracles use EXACT double literals 1.2/0.75 — never widen the float
  // constants back to double: (1.2f).toDouble != 1.2d)
  val K1d: Double = 1.2d
  val Bd: Double  = 0.75d
  val K1: Float = K1d.toFloat
  val B: Float  = Bd.toFloat

  /** Lucene 8.x idf: computed in double, narrowed to float. */
  def idf(docFreq: Long, docCount: Long): Float =
    math.log(1d + (docCount - docFreq + 0.5d) / (docFreq + 0.5d)).toFloat

  /** avgdl: double division narrowed to float. */
  def avgFieldLength(sumTotalTermFreq: Long, docCount: Long): Float =
    (sumTotalTermFreq / docCount.toDouble).toFloat

  /** Per-query-term scorer with the 256-entry norm→1/denominator cache the
    * reference precomputes at Weight creation.
    */
  final class TermScorer(docFreq: Long, docCount: Long, sumTotalTermFreq: Long,
                         boost: Float = 1.0f, k1: Float = K1, b: Float = B) {
    val termIdf: Float = idf(docFreq, docCount)
    val weight: Float  = boost * termIdf
    private val avgdl  = avgFieldLength(sumTotalTermFreq, docCount)
    /** cache[normByte & 0xff] = 1 / (k1 * ((1 - b) + b * dl / avgdl)) */
    val cache: Array[Float] = Array.tabulate(256) { i =>
      1f / (k1 * ((1 - b) + b * SmallFloat.LengthTable(i) / avgdl))
    }
    def score(freq: Float, normByte: Int): Float = {
      val normInverse = cache(normByte & 0xff)
      weight - weight / (1f + freq * normInverse)
    }
    /** Upper bound of score for any (tf ≤ maxTf, dl ≥ minDl) — BM25 is
      * monotone increasing in tf and decreasing in dl, and IEEE rounding
      * is monotone, so this is a true float32 bound; used by block-max
      * skipping (the analog of the reference's impacts, SURVEY.md §2.2).
      * `minDl` is a decoded length (block impact column min_norm_len);
      * the expression shape matches the cache entry for that length.
      */
    def maxScore(maxTf: Int, minDl: Int): Float = {
      val inv = 1f / (k1 * ((1 - b) + b * minDl / avgdl))
      weight - weight / (1f + maxTf.toFloat * inv)
    }
  }

  /** Score-desc, docID-asc ordering — the reference's top-k tie-break
    * (`search/TopScoreDocCollector` / `HitQueue` [8x]). Used everywhere a
    * top-k is produced so exact, BMW and fixture ranks agree.
    */
  val hitOrdering: Ordering[(Long, Float)] = new Ordering[(Long, Float)] {
    def compare(x: (Long, Float), y: (Long, Float)): Int = {
      val c = java.lang.Float.compare(y._2, x._2) // score desc
      if (c != 0) c else java.lang.Long.compare(x._1, y._1) // docID asc
    }
  }
}
