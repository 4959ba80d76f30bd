package graft

import org.apache.spark.sql.DataFrame

/** Session-wide registry for intermediate caches that operators persist
  * across multi-use plans (dedup shingle tables, pagerank edge tables).
  *
  * MEMORY_AND_DISK entries are NOT LRU-evicted once spilled, so a
  * long-lived session calling a persisting operator per batch would leak
  * one corpus-scale cache entry per call unless something unpersists
  * them. Operators register every `.persist` here; callers (or the
  * [[Graft]] facade) call [[release]] once the action consuming the
  * result has completed. Harnesses `clearCache()` between queries, which
  * is equivalent — this registry exists for everyone else.
  */
object CacheRegistry {

  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a persisted frame for later release; returns it unchanged. */
  def track(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked frame registered since the last release
    * (no-op on never-materialized entries).
    */
  def release(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(blocking = false); df = tracked.poll() }
  }

  /** Number of currently tracked (unreleased) entries — for specs. */
  def trackedCount: Int = tracked.size()
}
