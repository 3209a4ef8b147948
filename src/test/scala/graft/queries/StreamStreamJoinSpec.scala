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
}
