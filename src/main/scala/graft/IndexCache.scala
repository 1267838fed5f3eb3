package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.{IndexView, Indexer}

/** Per-JVM cache of built indexes keyed by corpus dir, so each
  * SparkEntry.queries entry (driver runs them one by one) reuses the
  * same persisted segment tables instead of rebuilding.
  */
object IndexCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, IndexView]()

  /** Segment size for the sandbox corpora: small enough that sf0.1
    * (5k docs) spans multiple doc-range segments, exercising per-leaf
    * BMW + merge; production target is [[Indexer.DefaultSegmentSize]].
    */
  val TestSegmentSize = 1024L

  def documentsIndex(spark: SparkSession, sfDir: String): IndexView =
    cache.computeIfAbsent(s"$sfDir/documents.parquet", { _ =>
      val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("doc_id").cast("string").as("url"), col("text"))
      val view = Indexer
        .buildTables(spark, Indexer.asDocInput(spark, corpus), TestSegmentSize)
        .persisted()
      view.postings.count(); view.docmeta.count() // materialize
      view
    })
}
