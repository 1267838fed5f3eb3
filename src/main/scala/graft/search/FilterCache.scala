package graft.search

import org.apache.spark.sql.DataFrame

/** Solr's filterCache [Solr search/SolrIndexSearcher.java filterCache]:
  * non-scoring filter queries (`fq`) resolve to a doc set that is
  * independent of the main query, so repeated requests reuse the
  * materialized set instead of recomputing it. Spark-first realization:
  * the doc-set DataFrame is persisted and keyed by (index identity,
  * canonical query form); an LRU cap bounds executor memory and evicted
  * entries are unpersisted (Solr's cache is likewise size-bounded).
  */
object FilterCache {

  /** Max cached filter doc sets (Solr's filterCache size analog). */
  val MaxEntries = 128

  private val lock = new Object
  private val cache = new java.util.LinkedHashMap[String, DataFrame](
    16, 0.75f, /* accessOrder = */ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, DataFrame]): Boolean = {
      val evict = size() > MaxEntries
      if (evict) e.getValue.unpersist()
      evict
    }
  }
  private val hitCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Cache hits so far (observability + tests). */
  def hits: Long = hitCounter.get

  /** The cached doc set for `q` against the index identified by
    * `viewKey`, computing (and persisting) it on first use.
    */
  def getOrCompute(viewKey: String, q: Query)(compute: => DataFrame): DataFrame =
    lock.synchronized {
      val key = viewKey + "#" + q.toString
      val existing = cache.get(key)
      if (existing != null) { hitCounter.incrementAndGet(); existing }
      else {
        val df = compute.persist()
        df.count() // materialize once, inside the caller's first request
        cache.put(key, df)
        df
      }
    }
}
