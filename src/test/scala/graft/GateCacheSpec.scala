package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the session-lifetime temp-dir registry (r9 ADVICE: per-gate
  * staging dirs accumulated on disk across suite/bench runs). */
class GateCacheSpec extends AnyFunSuite {

  test("tempDir dirs are deleted recursively by cleanupTempDirs") {
    val d1 = GateCache.tempDir("graft_spec_tmp")
    val d2 = GateCache.tempDir("graft_spec_tmp")
    // nested content — cleanup must be recursive, not rmdir-on-empty
    val sub = java.nio.file.Files.createDirectory(d1.resolve("nested"))
    java.nio.file.Files.writeString(sub.resolve("part-0.parquet"), "x")
    java.nio.file.Files.writeString(d2.resolve("f"), "y")
    assert(java.nio.file.Files.exists(d1) && java.nio.file.Files.exists(d2))
    GateCache.cleanupTempDirs()
    assert(!java.nio.file.Files.exists(d1), s"$d1 survived cleanup")
    assert(!java.nio.file.Files.exists(d2), s"$d2 survived cleanup")
    // idempotent: a second run over the drained queue is a no-op
    GateCache.cleanupTempDirs()
  }

  test("releaseAll swallows a failing release and still runs the rest") {
    var ran = false
    GateCache.onRelease(() => throw new RuntimeException("boom"))
    GateCache.onRelease(() => { ran = true })
    GateCache.releaseAll()
    assert(ran, "release after the failing one never ran")
  }
}
