package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index integrity checker — the reference's `CheckIndex` admin tool
  * [8x lucene/core/src/java/org/apache/lucene/index/CheckIndex.java:
  * "basic tool and API to check the health of an index and write a new
  * segments file that removes reference to problematic segments"]. The
  * Spark shape: the three segment tables cross-checked against each
  * other in one pass of dictionary-sized aggregates —
  *
  *   - Σ posting-block doc_counts per segment  == Σ dictionary df
  *   - Σ posting-block sum_tf per segment      == Σ dictionary ctf
  *   - Σ dictionary ctf per segment            == Σ docmeta dl
  *     (every analyzed occurrence is indexed exactly once)
  *   - every block's doc range is sane (first ≤ last)
  *
  * Any divergence flips the segment's status to BROKEN. The checks read
  * only block METADATA columns and the dictionary (payload byte columns
  * pruned at the parquet scan), so the report costs far less than a
  * search — the same property the reference's `-fast` checksum mode has.
  */
object CheckIndex {

  /** Per-segment report: (segment_id, n_docs, n_terms, sum_df, sum_ctf,
    * status OK|BROKEN).
    */
  def report(view: IndexView): DataFrame = {
    val dict = view.terms.where(col("field") === Indexer.Field)
      .groupBy("segment_id")
      .agg(countDistinct("term").as("n_terms"), sum("df").as("sum_df"),
        sum("ctf").as("sum_ctf"))
    val meta = view.docmeta.toDF().groupBy("segment_id")
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val post = view.postings.toDF()
      .where(col("field") === Indexer.Field)
      .groupBy("segment_id")
      .agg(sum("doc_count").as("p_df"), sum("sum_tf").as("p_ctf"),
        min((col("first_doc_id") <= col("last_doc_id")).cast("int"))
          .as("blocks_ok"))
    // full_outer: a segment entirely MISSING from dictionary, docmeta or
    // postings must surface in the report — an inner join would silently
    // drop it (round-4 ADVICE finding). Absent-side aggregates coalesce
    // to 0 BEFORE the cross-checks, so a legitimately empty side (e.g. a
    // segment whose docs all analyze to zero tokens: docmeta present,
    // dictionary/postings rightly absent, all sums 0) checks out OK,
    // while a side missing opposite NONZERO counterparts (dropped
    // dictionary rows, vanished postings, lost docmeta) fails the
    // equalities and reports BROKEN.
    dict.join(meta, Seq("segment_id"), "full_outer")
      .join(post, Seq("segment_id"), "full_outer")
      .select(col("segment_id").cast("long"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        coalesce(col("sum_df"), lit(0L)).as("sum_df"),
        coalesce(col("sum_ctf"), lit(0L)).as("sum_ctf"),
        when(coalesce(col("p_df"), lit(0L)) === coalesce(col("sum_df"), lit(0L)) &&
             coalesce(col("p_ctf"), lit(0L)) === coalesce(col("sum_ctf"), lit(0L)) &&
             coalesce(col("p_ctf"), lit(0L)) === coalesce(col("sum_dl"), lit(0L)) &&
             coalesce(col("blocks_ok"), lit(1)) === 1, lit("OK"))
          .otherwise(lit("BROKEN")).as("status"))
  }
}
