package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.model.SchemaModel.{DeletedCol, SeqCol, VersionCol}

/** Semantic pins for CollapsingMergeTree FINAL: the sign-changelog
  * derivation, the additive collapse, and — the point of the family —
  * exact agreement with the ReplacingMergeTree live view over the same
  * stream. */
class CollapsingSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val payload = Seq("state")

  /** (key, version, seq, deleted, state) rows → stamped-shaped frame. */
  private def stream(rows: (Long, Long, Long, Int, String)*) =
    rows.toDF("k", VersionCol, SeqCol, DeletedCol, "state")

  private def collapse(df: org.apache.spark.sql.DataFrame) =
    Collapsing.collapseFinal(
      Collapsing.changelog(df, Seq("k"), payload), Seq("k"), payload)

  test("crafted lifecycles: update chains, deletes, reinsert, delete-first") {
    val df = stream(
      // k=1: insert → update → update: survivor = v3 state
      (1L, 1L, 1L, 0, "a"), (1L, 2L, 2L, 0, "b"), (1L, 3L, 3L, 0, "c"),
      // k=2: insert → delete: nothing survives
      (2L, 1L, 4L, 0, "x"), (2L, 2L, 5L, 1, "x"),
      // k=3: insert → delete → reinsert: survivor = the reinsert
      (3L, 1L, 6L, 0, "p"), (3L, 2L, 7L, 1, "p"), (3L, 3L, 8L, 0, "q"),
      // k=4: delete with no prior state (and a second delete): nothing
      (4L, 1L, 9L, 1, "z"), (4L, 2L, 10L, 1, "z"))
    val got = collapse(df).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "c", 3L -> "q"))
  }

  test("changelog balance: signs net to 1 (live) or 0 (tombstoned) per key") {
    val df = stream(
      (1L, 1L, 1L, 0, "a"), (1L, 2L, 2L, 0, "b"),
      (2L, 1L, 3L, 0, "x"), (2L, 2L, 4L, 1, "x"),
      (3L, 1L, 5L, 1, "z"))
    val cl = Collapsing.changelog(df, Seq("k"), payload)
    val nets = cl.groupBy("k").agg(sum(Collapsing.SignCol).as("net"))
      .as[(Long, Long)].collect().toMap
    assert(nets == Map(1L -> 1L, 2L -> 0L)) // k=3 emits no rows at all
    // every −1 cancels a state that was previously emitted as +1
    val plus = cl.filter(col(Collapsing.SignCol) === 1)
      .select("k", "state", VersionCol).as[(Long, String, Long)].collect().toSet
    val minus = cl.filter(col(Collapsing.SignCol) === -1)
      .select("k", "state", VersionCol).as[(Long, String, Long)].collect()
    assert(minus.forall(plus.contains))
  }

  test("gate ≡ w1_live_view on real sf0.001 data (cross-engine-family pin)") {
    val live = graft.queries.ReferenceOps
      .queries("w1_live_view")(spark, TestSpark.Sf0001)
    val collapsed = graft.queries.ReferenceOps
      .queries("x_collapsing_final")(spark, TestSpark.Sf0001)
    assert(collapsed.count() == live.count())
    assert(collapsed.exceptAll(live).isEmpty && live.exceptAll(collapsed).isEmpty)
  }
}
