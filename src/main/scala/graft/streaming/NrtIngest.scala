package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.{DocInput, IndexStore, IndexWriter, Indexer, Snapshot}

/**
 * Near-real-time ingestion — the analog of the reference's NRT
 * soft-commit + `DirectoryReader.openIfChanged` segment-set refresh
 * [8x index/DirectoryReader.java, Solr DirectUpdateHandler2] and of
 * Solr's checkpointed continuous streams (`TopicStream`/`DaemonStream`,
 * SURVEY.md §2.9), Spark-first:
 *
 *   readStream → foreachBatch { build mini-segment batch; snapshot++ }
 *
 * Each micro-batch is committed through EXACTLY the bulk-build batch
 * path ([[IndexWriter.writeBatch]]): write-once batch dirs keyed by a
 * stable batch number, manifest by atomic rename, snapshot publish.
 * Streaming checkpoint (offsets) + idempotent batch commit = the
 * reference's transaction-log replay semantics: a restarted query
 * re-delivers the last micro-batch, `writeBatch` sees its manifest and
 * skips, converging to the identical index.
 *
 * Readers refresh by re-reading the latest snapshot
 * ([[graft.index.IndexReader.load]]) — `openIfChanged`.
 */
object NrtIngest {

  /** Base offset so streaming batch numbers never collide with bulk
    * build batch numbers in the same index dir.
    */
  val StreamBatchBase = 1000000

  /** Commit one micro-batch as an index batch + snapshot bump.
    * Exposed for tests and for `foreachBatch` wiring.
    */
  def ingestBatch(spark: SparkSession, batch: Dataset[DocInput], dir: String,
                  batchId: Long, segSize: Long,
                  stopWords: Set[String]): Option[Snapshot] = {
    if (batch.isEmpty) return None
    val b = StreamBatchBase + batchId.toInt
    val range = batch.agg(min("doc_id"), max("doc_id")).head()
    val (lo, hi) = (range.getLong(0), range.getLong(1) + 1)
    IndexWriter.writeBatch(spark, batch, dir, b, segSize, stopWords, lo, hi)
    // optimistic read-merge-publish loop: snapshot versions are
    // write-once, so a concurrent writer can't be overwritten — on a
    // lost race we re-read (seeing THEIR batches), merge and retry
    var published: Option[Snapshot] = None
    while (published.isEmpty) {
      val prev = IndexStore.currentSnapshot(dir)
      val batches = (prev.map(_.batches).getOrElse(Seq.empty) :+ b).distinct.sorted
      val snap = Snapshot(prev.map(_.version + 1).getOrElse(1), segSize, batches)
      if (IndexStore.tryPublishSnapshot(dir, snap)) published = Some(snap)
    }
    published
  }

  /** Start the continuous ingestion query over a streaming corpus. */
  def start(spark: SparkSession, stream: Dataset[DocInput], dir: String,
            checkpoint: String,
            segSize: Long = Indexer.DefaultSegmentSize,
            stopWords: Set[String] = graft.analysis.Analyzer.EnglishStopWords,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[DocInput], batchId: Long) =>
        ingestBatch(batch.sparkSession, batch, dir, batchId, segSize, stopWords)
        ()
      }
      .start()
}
