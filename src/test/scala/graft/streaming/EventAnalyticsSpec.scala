package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Windowed/sessionized event-time aggregation (T5 extension): the same
  * declarative plan runs batch AND as a watermarked stream. */
class EventAnalyticsSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchEvents = graft.queries.Tables
    .events(spark, TestSpark.Sf0001)
    .withColumn("ts_ev", timestamp_micros($"ts_us"))

  test("tumbling window counts partition time correctly (batch)") {
    val out = EventAnalytics.windowedTypeCounts(batchEvents, "ts_ev", "1 hour")
    val total = out.agg(sum($"n_events")).head().getLong(0)
    assert(total == batchEvents.count()) // every event in exactly one window
    // window starts are hour-aligned
    val misaligned = out.filter(
      (unix_micros($"window_start") % (3600L * 1000000L)) =!= 0).count()
    assert(misaligned == 0)
  }

  test("sliding window double-counts by overlap factor") {
    val tumble = EventAnalytics.windowedTypeCounts(batchEvents, "ts_ev", "1 hour")
      .agg(sum($"n_events")).head().getLong(0)
    val slide = EventAnalytics.windowedTypeCounts(batchEvents, "ts_ev",
      "1 hour", slide = Some("30 minutes"))
      .agg(sum($"n_events")).head().getLong(0)
    assert(slide == 2 * tumble) // each event lands in exactly 2 windows
  }

  test("session_window groups by inactivity gap") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:02:00"), // session A
      (1L, "2024-01-01 01:00:00"),                              // session B
      (2L, "2024-01-01 00:00:00"))                              // session C
      .toDF("user_id", "t")
      .withColumn("ts_ev", to_timestamp($"t"))
    val out = EventAnalytics.sessionCounts(ev, "ts_ev", "10 minutes")
    assert(out.count() == 3)
    assert(out.filter($"user_id" === 1 && $"n_events" === 2).count() == 1)
  }

  test("same watermarked plan runs as a stream (append mode after watermark)") {
    val (src, ckp) = (java.nio.file.Files.createTempDirectory("ea_src"),
      java.nio.file.Files.createTempDirectory("ea_ckp"))
    Seq(("a", "2024-01-01 00:10:00", 1.0), ("b", "2024-01-01 02:10:00", 2.0))
      .toDF("event_type", "t", "value")
      .withColumn("ts_ev", to_timestamp($"t")).drop("t")
      .coalesce(1).write.parquet(s"$src/seg1")
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_type STRING, value DOUBLE, ts_ev TIMESTAMP"))
      .parquet(s"$src/*")
    val agg = EventAnalytics.windowedTypeCounts(stream, "ts_ev", "1 hour",
      watermark = Some("30 minutes"))
    val q = agg.writeStream
      .outputMode("append")
      .format("memory").queryName("ea_out")
      .option("checkpointLocation", ckp.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // watermark advanced to 01:40 → the 00:00 window is final and emitted;
    // the 02:00 window is still open (not emitted in append mode)
    val rows = spark.sql("SELECT event_type FROM ea_out").as[String].collect()
    assert(rows.toSeq == Seq("a"))
  }
}
