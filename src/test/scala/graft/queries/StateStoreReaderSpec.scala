package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the `statestore` batch source behind the t17 gate: the
  * checkpoint of a streaming aggregation, opened WITHOUT replaying the
  * stream, exposes per-key aggregation buffers — and the `batchId`
  * option time-travels the state to any committed micro-batch, the
  * debugging move that matters when a production total went wrong at a
  * known point in the run. */
class StateStoreReaderSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("statestore reads per-batch state snapshots: final equals batch agg, batchId=0 equals the first batch alone") {
    val src = java.nio.file.Files.createTempDirectory("ssr_src").toString
    val ckp = java.nio.file.Files.createTempDirectory("ssr_ckp").toString
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      val base = 1600000000000L
      val b0 = Seq((1L, 10L), (1L, 5L), (2L, 7L))
      val b1 = Seq((1L, 100L), (3L, 1L))
      PipelineOps.stageReplayFile(src)(
        b0.toDF("user_id", "cents"), "b0.parquet", base)
      PipelineOps.stageReplayFile(src)(
        b1.toDF("user_id", "cents"), "b1.parquet", base + 60000L)
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.format("noop").mode("overwrite").save()
        }
        .option("checkpointLocation", ckp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      def state(opts: Map[String, String]): Seq[(Long, Long, Long)] = {
        val r = opts.foldLeft(spark.read.format("statestore"))(
          (b, kv) => b.option(kv._1, kv._2))
        r.load(ckp)
          .select(col("key.user_id"), col("value.count"), col("value.sum"))
          .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      }
      // final state = the full batch aggregate over both replay files
      assert(state(Map.empty) ==
        Seq((1L, 3L, 115L), (2L, 1L, 7L), (3L, 1L, 1L)))
      // time-travel: batch 0's committed state knows nothing of b1
      assert(state(Map("batchId" -> "0")) ==
        Seq((1L, 2L, 15L), (2L, 1L, 7L)))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }
}
