package graft.queries

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins that the stream-stream join matches ACROSS micro-batches (through
  * the join's keyed state store), not just within one batch, and that the
  * event-time range condition bounds the match window. */
class StreamStreamJoinSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("view and purchase in different micro-batches join; out-of-window purchase doesn't") {
    val srcDir = Files.createTempDirectory("graft_ssjs_src").toString
    val t0 = 1700000000000000L // µs
    def land(rows: Seq[(Long, Long, String, Long)]): Unit =
      rows.toDF("user_id", "event_id", "event_type", "ts_us")
        .select(col("user_id"), col("event_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts_ev"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    // three separate files → three micro-batches (maxFilesPerTrigger=1)
    land(Seq((1L, 10L, "view", t0)))
    land(Seq((1L, 20L, "purchase", t0 + 30L * 60 * 1000000), // in window
      (2L, 21L, "purchase", t0 + 10L * 60 * 1000000))) // other user
    land(Seq((1L, 30L, "purchase", t0 + 2L * 3600 * 1000000))) // > 1 hour

    val out = PipelineOps.runStreamStreamJoin(spark, srcDir)
      .select(col("v_event"), col("p_event"))
      .as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 20L)),
      s"expected exactly the cross-batch in-window pair, got $out")
  }

  test("outer join: unmatched view emits a null row via watermark eviction across batches") {
    val srcDir = Files.createTempDirectory("graft_sojs_src").toString
    val t0 = 1700000000000000L // µs
    var seq = 0
    def land(rows: Seq[(Long, Long, String, Long)]): Unit = {
      val tmp = Files.createTempDirectory("graft_sojs_tmp").toString
      rows.toDF("user_id", "event_id", "event_type", "ts_us")
        .select(col("user_id"), col("event_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts_ev"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(srcDir, f"b$seq%02d.parquet")
      java.nio.file.Files.copy(part.toPath, dst.toPath)
      require(dst.setLastModified(1600000000000L + seq * 600000L))
      seq += 1
    }
    val hourUs = 3600L * 1000000; val dayUs = 86400L * 1000000
    land(Seq((1L, 10L, "view", t0), (2L, 11L, "view", t0)))
    land(Seq((1L, 20L, "purchase", t0 + hourUs / 2))) // in window, later batch
    land(Seq((2L, 21L, "purchase", t0 + 2 * hourUs))) // out of window
    land(Seq((-1L, -1L, "view", t0 + 10 * dayUs), // watermark flush 1
      (-2L, -2L, "purchase", t0 + 10 * dayUs)))
    land(Seq((-1L, -3L, "view", t0 + 20 * dayUs), // watermark flush 2
      (-2L, -4L, "purchase", t0 + 20 * dayUs)))
    val out = PipelineOps.runStreamOuterJoin(spark, srcDir)
      .filter(col("v_user") >= 0)
      .select(col("v_event"), col("p_event"))
      .as[(Long, Option[Long])].collect().toSet
    // u1's view matched from a later micro-batch's purchase; u2's view
    // null-emitted ONLY because the watermark evicted its state — the
    // out-of-window purchase never joins
    assert(out == Set((10L, Some(20L)), (11L, None)), s"got $out")
  }
}
