package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins for the multi-table transactional apply: a torn batch (crash
  * between the table writes and the commit marker) is INVISIBLE to
  * readers and becomes visible atomically on the committed replay; a
  * consistent cut needs no lock — just one pinned version. */
class MultiTableCdcSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tables = Seq("orders", "lineitem")

  private def env(rows: (String, Long, Long, Long)*) =
    rows.toDF("tbl", "k0", "k1", "v")

  test("torn batch invisible; committed replay atomically visible") {
    val root = Files.createTempDirectory("graft_mtc_torn").toString
    val b0 = env(("orders", 1L, 0L, 100L), ("lineitem", 1L, 1L, 5L),
      ("lineitem", 1L, 2L, 7L))
    // crash before the marker: deltas on disk, no commit
    MultiTableCdc.foldBatch(b0, tables, root, 0L, commit = false)
    assert(MultiTableCdc.committed(root).isEmpty)
    intercept[IllegalArgumentException] {
      MultiTableCdc.readAt(spark, root, "lineitem", 0L).count()
    }
    // the replayed batch overwrites its own deltas and commits
    MultiTableCdc.foldBatch(b0, tables, root, 0L)
    assert(MultiTableCdc.committed(root) == Seq(0L))
    assert(MultiTableCdc.readAt(spark, root, "orders", 0L).count() == 1L)
    assert(MultiTableCdc.readAt(spark, root, "lineitem", 0L).count() == 2L)
  }

  test("pinning one version across tables is a consistent cut; a mixed " +
      "read orphans exactly the later batch's lineitems") {
    val root = Files.createTempDirectory("graft_mtc_cut").toString
    MultiTableCdc.foldBatch(env(("orders", 1L, 0L, 100L),
      ("lineitem", 1L, 1L, 5L)), tables, root, 0L)
    MultiTableCdc.foldBatch(env(("orders", 2L, 0L, 200L),
      ("lineitem", 2L, 1L, 9L), ("lineitem", 2L, 2L, 4L)),
      tables, root, 1L)
    def orphans(vLi: Long, vO: Long): Long = {
      val ord = MultiTableCdc.readAt(spark, root, "orders", vO)
        .select($"k0".as("_ok"))
      MultiTableCdc.readAt(spark, root, "lineitem", vLi)
        .join(ord, $"k0" === $"_ok", "left_anti").count()
    }
    assert(orphans(0L, 0L) == 0L && orphans(1L, 1L) == 0L)
    assert(orphans(1L, 0L) == 2L, "mixed read must orphan batch-1's items")
  }
}
