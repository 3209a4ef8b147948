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

  // ---- session-lifetime temp dirs -----------------------------------
  // Gate queries stage data through Files.createTempDirectory (CDC
  // landing zones, checkpoint dirs, MV snapshots, ...). Their lifetime
  // is the SESSION, not the gate — several are memoized across gates by
  // lazy staging helpers — so they can't ride `releases`; but leaving
  // them behind let repeated suite/bench runs accumulate parquet dirs on
  // disk (r9 ADVICE). Every dir created through [[tempDir]] is deleted
  // recursively by one JVM shutdown hook instead.

  private val tempDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => cleanupTempDirs(), "graft-tempdir-cleanup"))
    ()
  }

  /** `Files.createTempDirectory` + registration for cleanup at JVM exit. */
  def tempDir(prefix: String): java.nio.file.Path = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(p)
    p
  }

  /** Best-effort recursive delete — the ONE implementation the gates,
    * the verify dump and the temp-dir hook share (`File.delete` returns
    * false rather than throwing, so failures are silently skipped).
    * Symlinks are deleted WITHOUT recursing: gates stage links into
    * read-only testdata inside their temp dirs, and `isDirectory`
    * follows links — recursing would walk into the shared tree. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory && !java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  /** Delete every registered temp dir now (what the shutdown hook runs;
    * callable directly so specs can pin the behavior). Deletion failures
    * are ignored — `File.delete` returns false rather than throwing. */
  def cleanupTempDirs(): Unit = {
    val rm = deleteRecursively _
    var p = tempDirs.poll()
    while (p != null) {
      try rm(p.toFile) catch { case _: Throwable => () }
      p = tempDirs.poll()
    }
  }
}
