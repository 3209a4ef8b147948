package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** o16_full_resync: the reconciling disaster-recovery re-sync
  * (reference `README.md:478-497,556+` — at-least-once duplicates are
  * healed by the merge engine, lost events only by a periodic full
  * re-sync). Pins (1) healed-target ≡ source-truth equivalence including
  * the ghost-delete case the reference's insert-only re-sync misses, and
  * (2) that sf0.001 actually exercises both healing paths (lost updates
  * AND lost tombstones), so the gate can't go vacuous under data drift. */
class FullResyncSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Tables.events(spark, TestSpark.Sf0001)
  private lazy val w = Window.partitionBy($"user_id").orderBy($"event_id".desc)

  test("healed target equals independently-derived source truth") {
    val out = PipelineOps.fullResync(spark, TestSpark.Sf0001)
      .select("user_id", "event_type", "value", "props")
    val truth = events.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .select("user_id", "event_type", "value", "props")
    assert(out.exceptAll(truth).isEmpty && truth.exceptAll(out).isEmpty)
  }

  test("sf0.001 exercises both healing paths (lost update, ghost delete)") {
    val latest = events.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
    // a user whose truth-latest ALIVE event was lost in flight → the
    // re-sync's version-2 append is what heals them
    assert(latest.filter($"event_type" =!= "error" &&
      $"event_id" % 5 === 0).count() > 0, "no lost-update case in data")
    // a user whose truth-latest is a DELETE that was lost, while an older
    // alive row survived delivery → only the reconciling anti-join
    // tombstone removes the ghost
    val lostDeletes = latest.filter($"event_type" === "error" &&
      $"event_id" % 5 === 0).select("user_id")
    val survivedAlive = events.filter($"event_id" % 5 =!= 0)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .select("user_id")
    assert(lostDeletes.join(survivedAlive, "user_id").count() > 0,
      "no ghost-delete case in data — tombstone path untested")
  }
}
