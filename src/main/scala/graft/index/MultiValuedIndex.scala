package graft.index

import org.apache.spark.sql.SparkSession

/** Multivalued-field index — Solr's `multiValued="true"` with the
  * schema-default `positionIncrementGap="100"` [8x solr/core schema
  * FieldType positionIncrementGap, lucene Analyzer
  * #getPositionIncrementGap]: each source document ingests as a
  * 2-value field (the deterministic half split also used by
  * [[NestedBlocks]]), values separated by a 100-position gap so a
  * phrase or span query can never match across the value boundary.
  *
  * Build path: the values compose via [[graft.analysis.Analyzer
  * .joinValues]] — property-tested position/dl-identical to the
  * reference multivalued analysis ([[graft.analysis.Analyzer
  * .tokenizeValues]]) — so the ordinary fused index kernel produces
  * the gapped postings with no second code path.
  */
object MultiValuedIndex {

  /** Solr's schema-default gap. */
  val Gap = 100

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexView]()

  def index(spark: SparkSession, sfDir: String): IndexView = {
    val got = cache.computeIfAbsent(sfDir, { _ =>
      import spark.implicits._
      val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
          org.apache.spark.sql.functions.col("text").cast("string"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val toks = text.split(' ')
          val half = (toks.length + 1) / 2
          DocInput(id, id.toString, graft.analysis.Analyzer.joinValues(
            Seq(toks.take(half).mkString(" "), toks.drop(half).mkString(" ")),
            Gap))
        }
      val v = Indexer.buildTables(spark, corpus,
        graft.IndexCache.TestSegmentSize).persisted()
      v.postings.count() // materialize once
      v
    })
    if (got.postings.sparkSession.sparkContext.isStopped) {
      cache.remove(sfDir, got)
      index(spark, sfDir)
    } else got
  }
}
