package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Pins the x_ohlc_bars gate's claim: the OHLC expression is a plain
  * declarative aggregation, so the identical call runs as a watermarked
  * stream and (complete mode, fully replayed) produces exactly the batch
  * result. */
class OhlcStreamSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed OHLC bars equal the batch result on a full replay") {
    val batchIn = graft.queries.Tables.events(spark, TestSpark.Sf0001)
      .withColumn("ts_ev", timestamp_micros($"ts_us"))
    val expected = EventAnalytics.ohlcBars(batchIn, "ts_ev", "6 hours")
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().sortBy(r => (r._1, r._2))

    val src = java.nio.file.Files.createTempDirectory("ohlc_src")
    val ckp = java.nio.file.Files.createTempDirectory("ohlc_ckp")
    // three micro-batch files so open/close merge across batches
    batchIn.select($"ts_us", $"event_id", $"event_type", $"value", $"ts_ev")
      .repartition(3).write.mode("overwrite").parquet(src.toString)
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "ts_us BIGINT, event_id BIGINT, event_type STRING, " +
          "value DOUBLE, ts_ev TIMESTAMP"))
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    val q = EventAnalytics.ohlcBars(stream, "ts_ev", "6 hours",
        watermark = Some("1 hour"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_out")
      .option("checkpointLocation", ckp.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT * FROM ohlc_out")
      .as[(Long, String, Double, Double, Double, Double, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == expected.toSeq)
  }
}
