package graft.index

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.{DoubleOracle, ExactSearch, ScoreMode}

/**
 * Deletes as tombstones — the analog of the reference's live-docs
 * bitset + `IndexWriter#deleteDocuments` [8x index/IndexWriter.java,
 * codecs/lucene50/Lucene50LiveDocsFormat.java], Spark-first:
 *
 *  - A tombstone table `(doc_id)` is persisted as write-once parquet
 *    batch dirs under `dir/deletes/` (same write-once discipline as
 *    segment batches; publishing a batch dir is the commit).
 *  - Search-time: scored candidates are ANTI-JOINED against the
 *    tombstones BEFORE the top-k cut. Collection/term statistics are
 *    deliberately NOT adjusted — the reference's docFreq/docCount also
 *    keep counting deleted docs until the segment is merged away.
 *  - Merge-time: [[Merger.merge]] purges tombstoned docs physically
 *    (the reference's "deletes are reclaimed on merge"), after which
 *    stats genuinely shrink.
 *
 * Scale note: the anti-join shuffles only the candidate result set
 * (query-term postings), never the corpus; the tombstone side is
 * broadcast when small (Catalyst decides via AQE/size). The BMW path
 * takes the deleted set as a broadcast hash set inside the kernel —
 * the same memory class as the reference's per-segment live-docs
 * bitset held in RAM.
 */
object Deletes {

  private def deletesRoot(dir: String) = s"$dir/deletes"

  /** Commit one batch of deletions (write-once; batch n = next free). */
  def write(spark: SparkSession, dir: String, docIds: DataFrame): Unit = {
    val root = Paths.get(deletesRoot(dir))
    Files.createDirectories(root)
    val next = Iterator.from(0)
      .find(n => !Files.exists(root.resolve(f"batch-$n%05d"))).get
    docIds.select(col("doc_id").cast("long").as("doc_id"))
      .write.mode("errorifexists")
      .parquet(root.resolve(f"batch-$next%05d").toString)
  }

  /** All tombstoned doc_ids of an index dir (empty frame when none). */
  def load(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = Paths.get(deletesRoot(dir))
    if (!Files.isDirectory(root)) return spark.emptyDataset[Long].toDF("doc_id")
    val stream = Files.list(root)
    val dirs =
      try scala.jdk.CollectionConverters.IteratorHasAsScala(stream.iterator())
        .asScala.filter(p => p.getFileName.toString.startsWith("batch-"))
        .map(_.toString).toSeq.sorted
      finally stream.close() // Files.list holds an open fd until closed
    if (dirs.isEmpty) spark.emptyDataset[Long].toDF("doc_id")
    else spark.read.parquet(dirs: _*).select("doc_id").distinct()
  }

  /** Exact BM25 top-k excluding tombstoned docs (anti-join BEFORE the
    * cut; stats untouched — reference semantics until merge).
    */
  def topKExcluding(spark: SparkSession, view: IndexView,
                    queryTerms: Seq[String], tombstones: DataFrame, k: Int,
                    mode: ScoreMode = DoubleOracle): DataFrame =
    ExactSearch.scored(spark, view, queryTerms, mode)
      .join(tombstones.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
}
