package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry pairing every query-scoped `persist` with a deterministic
  * release. Gate queries persist intermediates that feed multiple branches
  * of ONE returned (lazy) plan — the unpersist can only happen after the
  * CALLER materializes the result, so a local try/finally inside the query
  * builder can't express the pairing. Builders register here instead, and
  * the harness mains (Verify/Bench) call [[releaseAll]] in a finally after
  * each query's action: no dead cached frames accumulate across a
  * 140+-query session, and bench timings aren't muddied by another
  * query's leftover blocks. (`spark.catalog.clearCache()` stays as the
  * backstop for SQL-cache entries; this registry also covers what that
  * can't reach, e.g. RDD-level localCheckpoint storage.)
  */
object GateCache {

  private val releases =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Persist `df` MEMORY_AND_DISK and register its unpersist. */
  def cache(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    releases.add(() => { df.unpersist(); () })
    df
  }

  /** Register an arbitrary release action (e.g. freeing a localCheckpoint's
    * RDD blocks, which DataFrame.unpersist cannot reach). */
  def onRelease(f: () => Unit): Unit = { releases.add(f); () }

  /** Run and clear every registered release. Safe to call when a query
    * failed mid-build: releases are independent and exceptions are
    * swallowed (a failed unpersist must not mask the query's own error). */
  def releaseAll(): Unit = {
    var f = releases.poll()
    while (f != null) {
      try f() catch { case _: Throwable => () }
      f = releases.poll()
    }
  }
}
