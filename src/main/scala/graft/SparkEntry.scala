package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.{BmwSearch, DoubleOracle, ExactSearch}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator is a named entry in [[queries]]; where the
  * semantics are ANSI-SQL-expressible the matching DuckDB oracle is in
  * [[oracleSql]] (column names aligned; floats quantized to integers via
  * round(x*10000) so the driver's hash compare is robust).
  */
object SparkEntry {

  private def quantize(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"),
      round(col("score") * 10000).cast("long").as("score_q"))

  /** Flagship: end-to-end index build + BM25 BMW top-10 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val view = IndexCache.documentsIndex(spark, "/root/testdata/sf0.001")
    BmwSearch.topK(spark, view, Seq("spark", "join"), 10, DoubleOracle)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — Plane A: analysis chain + index + BM25 (SURVEY.md §2.1–2.4) —
    "tokenize_counts" -> ((s, dir) => {
      IndexCache.documentsIndex(s, dir).docmeta.toDF()
        .select(col("doc_id"), col("dl"))
    }),
    "term_df" -> ((s, dir) => {
      IndexCache.documentsIndex(s, dir).terms
        .groupBy("term").agg(sum("df").as("df"), sum("ctf").as("ctf"))
    }),
    "bm25_topk_exact" -> ((s, dir) => {
      val v = IndexCache.documentsIndex(s, dir)
      quantize(ExactSearch.topK(s, v, Seq("spark", "join"), 10, DoubleOracle), 10)
    }),
    "bm25_topk_bmw" -> ((s, dir) => {
      val v = IndexCache.documentsIndex(s, dir)
      quantize(BmwSearch.topK(s, v, Seq("merge", "dup", "scan"), 10, DoubleOracle), 10)
    }),
    "bm25_topk_and" -> ((s, dir) => {
      val v = IndexCache.documentsIndex(s, dir)
      quantize(ExactSearch.topK(s, v, Seq("vector", "window"), 10, DoubleOracle,
        minShouldMatch = 2), 10)
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "tokenize_counts" -> OracleGen.tokenizeCountsSql,
    "term_df" -> OracleGen.termDfSql,
    "bm25_topk_exact" -> OracleGen.bm25TopKSql(Seq("spark", "join"), 10),
    "bm25_topk_bmw" -> OracleGen.bm25TopKSql(Seq("merge", "dup", "scan"), 10),
    "bm25_topk_and" -> OracleGen.bm25TopKSql(Seq("vector", "window"), 10, minShouldMatch = 2),
  )
}
