package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

// top-level: Spark encoders can't instantiate suite-inner case classes
case class Change(user_id: Long, name: String,
                  _version: Long, _ingest_seq: Long, _deleted: Int)

/** The stateful write-path live view: state survives micro-batches, late
  * rows lose to the stored winner, tombstones propagate. */
class StatefulLiveViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incremental survivor per key across batches (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Change]
    val out = StatefulLiveView.materializedLive(
      src.toDF(), pks = Seq("user_id"),
      versionCol = "_version", seqCol = "_ingest_seq",
      deletedCol = "_deleted")
    val ckp = java.nio.file.Files.createTempDirectory("slv_ckp").toString
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("slv_out")
      .option("checkpointLocation", ckp)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    src.addData(
      Change(1L, "alice", 100L, 1L, 0),
      Change(2L, "bob", 100L, 2L, 0))
    q.processAllAvailable()
    src.addData(
      Change(1L, "alice2", 200L, 3L, 0), // genuine update
      Change(2L, "bob_old", 50L, 0L, 0), // LATE: must lose to state
      Change(3L, "carol", 100L, 4L, 1))  // tombstone insert
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("slv_out").as[Change].collect().toSeq
    // batch1: both inserts; batch2: u1 update, u2 re-emits stored winner
    // (late row lost), u3 tombstone
    assert(emitted.size == 5)
    val lastByKey = emitted.zipWithIndex
      .groupBy(_._1.user_id).view.mapValues(_.maxBy(_._2)._1).toMap
    assert(lastByKey(1L).name == "alice2" && lastByKey(1L)._version == 200L)
    assert(lastByKey(2L).name == "bob" && lastByKey(2L)._version == 100L)
    assert(lastByKey(3L)._deleted == 1)
  }
}
