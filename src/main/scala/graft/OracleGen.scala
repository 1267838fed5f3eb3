package graft

import graft.analysis.Analyzer
import graft.codec.SmallFloat

/** Generators for the DuckDB oracle SQL of the full-text entries: the
  * analysis chain and the BM25 formula are re-expressed in ANSI SQL over
  * the same `documents` parquet table, with the lossy SmallFloat norm
  * reproduced via an inline lookup table generated from the codec itself
  * (single source of truth; SURVEY.md §5.2.3).
  */
object OracleGen {

  /** DuckDB list of quoted stopwords. */
  val stopList: String =
    Analyzer.EnglishStopWords.toSeq.sorted.map(w => s"'$w'").mkString(", ")

  private def termList(terms: Seq[String]): String =
    terms.map(t => s"'$t'").mkString(", ")

  /** Tokenized, stop-filtered (doc_id, term) stream. The documents corpus
    * is space-separated lowercase [a-z0-9]+ words, on which the reference
    * StandardAnalyzer chain coincides with string_split (FIXTURES.md §1).
    */
  val tokCte: String =
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
       |), tokf AS (
       |  SELECT doc_id, term FROM tok
       |  WHERE length(term) > 0 AND term NOT IN ($stopList)
       |)""".stripMargin

  /** Inline table of all decoded values representable by the SmallFloat
    * byte4 norm encoding; decode(encode(dl)) = max representable ≤ dl.
    */
  val normValues: String =
    SmallFloat.representableValues.map(v => s"($v)").mkString(", ")

  val dlCtes: String =
    s"""dl AS (
       |  SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id
       |), norm AS (
       |  SELECT doc_id, dl,
       |    (SELECT max(v) FROM (VALUES $normValues) AS nv(v) WHERE nv.v <= dl.dl) AS ldl
       |  FROM dl
       |), st AS (
       |  SELECT count(*) AS n, sum(dl) AS sttf FROM dl
       |)""".stripMargin

  def tokenizeCountsSql: String =
    s"WITH $tokCte SELECT doc_id, count(*) AS dl FROM tokf GROUP BY doc_id"

  def termDfSql: String =
    s"""WITH $tokCte
       |SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ctf
       |FROM tokf GROUP BY term""".stripMargin

  /** BM25 top-k (Lucene 8.x formula shape, float64): disjunctive when
    * minShouldMatch=1, conjunctive when = #terms.
    */
  def bm25TopKSql(terms: Seq[String], k: Int, minShouldMatch: Int = 1): String = {
    val qs = termList(terms.distinct)
    s"""WITH $tokCte, $dlCtes, df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokf
       |  WHERE term IN ($qs) GROUP BY term
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokf
       |  WHERE term IN ($qs) GROUP BY doc_id, term
       |), sc AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
       |         * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * norm.ldl / (st.sttf / CAST(st.n AS DOUBLE)))) ) AS score,
       |    count(*) AS n_matched
       |  FROM tf JOIN df USING (term) JOIN norm ON tf.doc_id = norm.doc_id CROSS JOIN st
       |  GROUP BY tf.doc_id
       |)
       |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q
       |FROM sc WHERE n_matched >= $minShouldMatch
       |ORDER BY score DESC, doc_id ASC LIMIT $k""".stripMargin
  }
}
