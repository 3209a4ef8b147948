package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Versioned dirs: monotonically numbered, independently readable, and a
  * later write never mutates an earlier pinned version. */
class TimeTravelSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("writes append versions; pinned reads are isolated from later writes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ttspec").toString
    assert(TimeTravel.versions(root).isEmpty)

    assert(TimeTravel.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), root) == 0L)
    val v0 = TimeTravel.readAt(spark, root, 0)
    assert(TimeTravel.write(Seq((1, "a2")).toDF("k", "v"), root) == 1L)

    assert(TimeTravel.versions(root) == Seq(0L, 1L))
    // the v0 frame read BEFORE v1 existed still sees the old rows
    assert(v0.count() == 2)
    assert(TimeTravel.readAt(spark, root, 0).count() == 2)
    assert(TimeTravel.readLatest(spark, root).count() == 1)
  }

  test("expire keeps the newest versions and leaves survivors readable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ttexp").toString
    (0 until 3).foreach(i =>
      TimeTravel.write(Seq((i, s"v$i")).toDF("k", "v"), root))
    assert(TimeTravel.expire(root, keep = 2) == Seq(0L))
    assert(TimeTravel.versions(root) == Seq(1L, 2L))
    assert(TimeTravel.readAt(spark, root, 1).count() == 1)
    assert(TimeTravel.readLatest(spark, root)
      .as[(Int, String)].head() == ((2, "v2")))
  }
}
