package graft

/** Session-scoped build-once cache — the shared idiom behind the index,
  * doc-term, sketch and cluster caches: values are keyed by corpus dir,
  * built at most once per JVM, and evicted + rebuilt when the cached
  * value's SparkSession has stopped (a frame bound to a dead session
  * throws on use; the underlying data — on-disk index, re-derivable
  * frame — is still valid, only the handles died).
  */
final class SessionCache[V](live: V => Boolean) {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, V]()

  /** At most ONE rebuild attempt: if a freshly-built value fails the
    * liveness check (e.g. the caller passed an already-stopped
    * SparkSession so build() can only ever produce dead handles), fail
    * fast with a descriptive error instead of recursing forever
    * (round-4 ADVICE finding).
    */
  def getOrBuild(key: String)(build: => V): V = {
    val got = m.computeIfAbsent(key, _ => build)
    if (live(got)) got
    else {
      m.remove(key, got)
      val rebuilt = m.computeIfAbsent(key, _ => build)
      if (live(rebuilt)) rebuilt
      else {
        m.remove(key, rebuilt)
        throw new IllegalStateException(
          s"SessionCache('$key'): freshly built value is not live — " +
            "the input session is likely stopped; rebuild cannot succeed")
      }
    }
  }
}

object SessionCache {
  /** Cache of DataFrames: live while their session is not stopped. */
  def frames(): SessionCache[org.apache.spark.sql.DataFrame] =
    new SessionCache(df => !df.sparkSession.sparkContext.isStopped)
}
