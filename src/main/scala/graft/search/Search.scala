package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.IndexView
import graft.spec.LuceneSpec
import graft.stats.{CollectionStats, GlobalStats, TermStats}

/** Scoring arithmetic mode.
  *  - [[Float32Lucene]]: the reference's float32 arithmetic via
  *    [[graft.spec.LuceneSpec.TermScorer]] (rank-identity vs Lucene).
  *  - [[DoubleOracle]]: the same 8.x formula in float64 with a fixed
  *    expression shape that ANSI SQL (the DuckDB oracle) reproduces
  *    bit-for-bit up to round(…, 4).
  * Per-doc scores sum per-term contributions in ascending term order in
  * BOTH modes and BOTH execution paths, so exact and BMW agree exactly.
  */
sealed trait ScoreMode extends Serializable
case object Float32Lucene extends ScoreMode
case object DoubleOracle extends ScoreMode

/** Precomputed per-query-term scoring state, broadcast into tasks. */
final case class QueryTermInfo(term: String, df: Long, idfD: Double)

final class QueryScorers(val stats: CollectionStats,
                         val terms: Array[QueryTermInfo], // ascending term
                         val mode: ScoreMode) extends Serializable {
  // single source of truth for the constants: LuceneSpec (8.x K1/B)
  val k1d: Double = LuceneSpec.K1d
  val bd: Double = LuceneSpec.Bd
  val avgdlD: Double = stats.sumTotalTermFreq.toDouble / stats.docCount.toDouble
  @transient private lazy val f32: Map[String, LuceneSpec.TermScorer] =
    terms.map(t => t.term -> new LuceneSpec.TermScorer(
      t.df, stats.docCount, stats.sumTotalTermFreq)).toMap
  private val idfByTerm: Map[String, Double] = terms.map(t => t.term -> t.idfD).toMap

  /** Score one (term, tf, doc-length) in the active mode, as Double
    * (float32 results widened — widening is order-preserving).
    */
  def score(term: String, tf: Int, normByte: Int, lossyDl: Int): Double = mode match {
    case Float32Lucene => f32(term).score(tf.toFloat, normByte).toDouble
    case DoubleOracle =>
      val idf = idfByTerm(term)
      idf * tf / (tf + k1d * (1 - bd + bd * lossyDl / avgdlD))
  }

  /** idf of a query term (None when the term is absent from the index —
    * it then matches nothing, so its weight never applies).
    */
  def idfDOf(term: String): Option[Double] = idfByTerm.get(term)

  /** Phrase weight = sum of the slot terms' idfs (duplicated slots count
    * twice — the reference builds one TermStatistics entry PER SLOT
    * [8x search/PhraseQuery.java createWeight → Similarity.scorer with
    * the termStats array; BM25Similarity.idfExplain sums]).
    */
  def phraseWeightD(slotTerms: Seq[String]): Double =
    slotTerms.flatMap(idfByTerm.get).sum

  /** Float32 phrase score: weight narrowed to float, then the 8.x score
    * shape with the SmallFloat norm cache arithmetic (same expression as
    * [[graft.spec.LuceneSpec.TermScorer]] with the summed weight).
    */
  def phraseScoreF32(slotTerms: Seq[String], ptf: Int, normByte: Int): Double = {
    // duplicated slots: each occurrence contributes its idf again
    val weight = slotTerms.flatMap(st => f32.get(st).map(_.termIdf.toDouble))
      .sum.toFloat
    val avgdlF = LuceneSpec.avgFieldLength(stats.sumTotalTermFreq, stats.docCount)
    val inv = 1f / (LuceneSpec.K1 * ((1 - LuceneSpec.B) +
      LuceneSpec.B * graft.codec.SmallFloat.LengthTable(normByte & 0xff) / avgdlF))
    (weight - weight / (1f + ptf.toFloat * inv)).toDouble
  }

  /** Upper bound for a block with impacts (maxTf, minLen): BM25 is
    * monotone ↑tf and ↓len, and IEEE rounding is monotone, so this is a
    * true bound in both modes.
    */
  def maxScore(term: String, maxTf: Int, minLen: Int): Double = mode match {
    case Float32Lucene => f32(term).maxScore(maxTf, minLen).toDouble
    case DoubleOracle =>
      val idf = idfByTerm(term)
      idf * maxTf / (maxTf + k1d * (1 - bd + bd * minLen / avgdlD))
  }
}

object QueryScorers {
  def apply(view: IndexView, queryTerms: Seq[String], mode: ScoreMode): QueryScorers = {
    val cs = GlobalStats.collectionStats(view)
    val ts: Map[String, TermStats] = GlobalStats.termStats(view, queryTerms)
    val infos = queryTerms.distinct.sorted.flatMap { t =>
      ts.get(t).map { s =>
        QueryTermInfo(t, s.df,
          math.log(1d + (cs.docCount - s.df + 0.5d) / (s.df + 0.5d)))
      }
    }.toArray
    new QueryScorers(cs, infos, mode)
  }
}

/**
 * Exact BM25 top-k — pure Catalyst dataflow (the differential oracle for
 * the BMW fast path, SURVEY.md §3.2): semi-filter posting blocks on query
 * terms (Parquet row-group stats prune on disk-backed indexes), decode,
 * score, hash-aggregate per doc, `TakeOrderedAndProject` top-k with the
 * reference tie-break (score desc, docID asc).
 */
object ExactSearch {

  /** Decoded per-(term, doc) entries for the query terms. */
  private[search] def decodedPostings(spark: SparkSession, view: IndexView,
                                      queryTerms: Seq[String]): DataFrame = {
    import spark.implicits._
    view.postings
      .filter($"term".isin(queryTerms.distinct: _*))
      .flatMap { b =>
        val d = graft.codec.PostingCodec.decode(b.docs, b.freqs, b.norms)
        Iterator.tabulate(d.docIds.length) { i =>
          (b.term, d.docIds(i), d.freqs(i),
            d.norms(i).toInt & 0xff,
            graft.codec.SmallFloat.byte4ToInt(d.norms(i)))
        }
      }.toDF("term", "doc_id", "tf", "norm_byte", "lossy_dl")
  }

  /** All matching docs with their BM25 scores (no ranking cut) —
    * building block for boolean composition (MUST_NOT/FILTER wrap it).
    */
  def scored(spark: SparkSession, view: IndexView, queryTerms: Seq[String],
             mode: ScoreMode = DoubleOracle, minShouldMatch: Int = 1): DataFrame =
    scoredWith(spark, view, queryTerms, QueryScorers(view, queryTerms, mode),
      minShouldMatch)

  /** Like [[scored]] but with caller-supplied scorers — the query
    * compiler gathers collection/term stats ONCE for a whole query tree
    * and shares them across clauses (one stats pass per query, not per
    * clause — at scale each stats gather is a job).
    */
  def scoredWith(spark: SparkSession, view: IndexView, queryTerms: Seq[String],
                 scorers: QueryScorers, minShouldMatch: Int = 1,
                 candidates: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(scorers)
    // candidate restriction (QueryRescorer-style second pass): semi-join
    // the decoded postings with the candidate doc set BEFORE grouping —
    // a small candidate frame broadcasts, so the full posting lists are
    // filtered map-side and never flow into the aggregate
    val decoded0 = decodedPostings(spark, view, queryTerms)
    val decoded = candidates match {
      case None    => decoded0
      case Some(c) => decoded0.join(
        org.apache.spark.sql.functions.broadcast(c.select("doc_id").distinct()),
        Seq("doc_id"), "left_semi")
    }
    val entries = decoded.select("term", "doc_id", "tf", "norm_byte", "lossy_dl")
      .as[(String, Long, Int, Int, Int)]
    val perDoc = entries.groupByKey(_._2).mapGroups { (docId, it) =>
      val rows = it.toArray.sortBy(_._1) // ascending term order
      val s = bc.value
      var sumF: Float = 0f
      var sumD: Double = 0d
      rows.foreach { case (term, _, tf, nb, ldl) =>
        s.mode match {
          case Float32Lucene => sumF += s.score(term, tf, nb, ldl).toFloat
          case DoubleOracle  => sumD += s.score(term, tf, nb, ldl)
        }
      }
      val score = s.mode match {
        case Float32Lucene => sumF.toDouble
        case DoubleOracle  => sumD
      }
      (docId, score, rows.length)
    }.toDF("doc_id", "score", "n_matched")
    perDoc.filter($"n_matched" >= minShouldMatch)
      .select($"doc_id", $"score")
  }

  /** Disjunctive (OR) top-k. minShouldMatch>1 turns it into an
    * at-least-m query; m == #terms is the conjunctive (AND) case —
    * the reference's BooleanQuery SHOULD/MUST semantics (SURVEY.md §2.3).
    * Catalyst plans the cut as TakeOrderedAndProject: per-partition
    * partial top-k + driver merge, exactly the reference's per-leaf
    * collect + TopDocs.merge.
    */
  def topK(spark: SparkSession, view: IndexView, queryTerms: Seq[String],
           k: Int, mode: ScoreMode = DoubleOracle,
           minShouldMatch: Int = 1): DataFrame = {
    import spark.implicits._
    scored(spark, view, queryTerms, mode, minShouldMatch)
      .orderBy($"score".desc, $"doc_id".asc)
      .limit(k)
  }
}
