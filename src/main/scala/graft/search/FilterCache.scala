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
      // the evicted frame may belong to an already-stopped session
      if (evict) scala.util.Try(e.getValue.unpersist())
      evict
    }
  }
  private val hitCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Cache hits so far (observability + tests). */
  def hits: Long = hitCounter.get

  // Stable per-view cache-key prefix. A WeakHashMap (NOT
  // System.identityHashCode: identity hashes are recycled after GC, so
  // a later view could silently inherit a dead view's cached doc sets)
  // hands every live view a unique id and forgets it with the view.
  private val viewIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[AnyRef, String]())
  private val idGen = new java.util.concurrent.atomic.AtomicLong()

  /** Unique, stable key for a live index view instance. */
  def viewKey(view: AnyRef): String =
    viewIds.computeIfAbsent(view, _ => "v" + idGen.incrementAndGet())

  /** The cached doc set for `q` against the index identified by
    * `viewKey`, computing (and persisting) it on first use. The compute
    * runs OUTSIDE the cache lock (it is a full Spark job — holding the
    * lock would serialize every concurrent query, even pure hits);
    * racing threads may compute the same set twice, but only one result
    * is kept and the loser is unpersisted.
    */
  def getOrCompute(viewKey: String, q: Query)(compute: => DataFrame): DataFrame = {
    val key = viewKey + "#" + q.toString
    lock.synchronized {
      val existing = cache.get(key)
      if (existing != null) { hitCounter.incrementAndGet(); return existing }
    }
    val df = compute.persist()
    df.count() // materialize once, inside the caller's first request
    lock.synchronized {
      val won = cache.get(key)
      if (won != null) { // lost the race: keep the winner's frame
        hitCounter.incrementAndGet()
        scala.util.Try(df.unpersist())
        won
      } else {
        cache.put(key, df)
        df
      }
    }
  }
}
