package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

// top-level: Spark encoders can't instantiate suite-inner case classes
case class Doc(doc_id: Long, text: String, lang: String, ts: Timestamp)

/** StreamDedup contract: first arrival survives, duplicates are dropped
  * across micro-batches while inside the watermark horizon, and a key
  * re-arriving after its state aged out is re-admitted (bounded state —
  * the documented trade vs. batch global dedup). */
class StreamDedupSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // +1 day: the initial watermark is epoch(0) and rows at event time ≤
  // watermark are dropped as late — times must stay clear of the epoch
  private def ts(min: Int) = new Timestamp(86400000L + min * 60000L)

  test("cross-batch dedup inside the horizon; re-admission after eviction") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Doc]
    val out = StreamDedup.byFingerprint(src.toDF(), textCol = "text",
      keyCols = Seq("lang"), tsCol = "ts", delay = "10 minutes")
    val ckp = java.nio.file.Files.createTempDirectory("sdd_ckp").toString
    val emitted = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def drain(): Unit = {
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckp)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) =>
            emitted.synchronized {
              emitted ++= b.collect().map(r =>
                (r.getLong(r.fieldIndex("doc_id")),
                  r.getString(r.fieldIndex("lang"))))
            }
            ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // batch 1: two distinct texts + an in-batch duplicate
    src.addData(
      Doc(1, "Hello  World", "en", ts(0)),
      Doc(2, "hello world", "en", ts(1)), // dup of 1 after normalize
      Doc(3, "guten tag", "de", ts(1)))
    drain()
    // batch 2 (watermark still behind the horizon): cross-batch duplicate
    // dropped via checkpointed state; same text in ANOTHER lang survives
    // (key = fingerprint + lang)
    src.addData(
      Doc(4, "HELLO   world", "en", ts(2)), // dup of 1, different batch
      Doc(5, "hello world", "de", ts(2)))   // other-lang twin: kept
    drain()
    // batch 3: a duplicate at ts(30). The batch is processed under the
    // PREVIOUS watermark (ts(2) − 10min), so the original's state
    // (expiry = ts(0) + 10min) is still live → doc 6 is dropped. At
    // batch END the watermark advances to ts(30) − 10min = ts(20),
    // evicting every key from batches 1-2.
    src.addData(Doc(6, "hello world", "en", ts(30)))
    drain()
    // batch 4: the same text again — its state was evicted, so this is
    // the re-admission the bounded-state contract implies
    src.addData(Doc(7, "hello world", "en", ts(31)))
    drain()

    val ids = emitted.map(_._1).toSet
    // within one micro-batch the surviving copy is partition-order
    // dependent — exactly ONE of the in-batch twins 1/2 must remain
    assert(ids.intersect(Set(1L, 2L)).size == 1, s"in-batch dedup: $ids")
    assert(Set(3L, 5L).subsetOf(ids), s"survivors missing: $ids")
    assert(!ids.contains(4L), s"cross-batch dup emitted: $ids")
    assert(!ids.contains(6L), s"doc 6 arrived pre-eviction, must dedup: $ids")
    assert(ids.contains(7L), s"re-admission after eviction failed: $ids")
    assert(emitted.count(_._2 == "en") == 2 && // docs 1, 7
      emitted.count(_._2 == "de") == 2)        // docs 3, 5
  }

  test("dedup runs on the RocksDB state store (the spillable 100 TB provider)") {
    // The default HDFS-backed store keeps every live key on the executor
    // heap — memory-bound at 100 TB key cardinality. This pins that the
    // SAME dedup pipeline runs unchanged on the spillable RocksDB
    // provider (the t2_stream_dedup gate sets the same conf), and proves
    // engagement from the checkpoint artifacts: RocksDB writes zip/
    // changelog files where the HDFS store writes .delta.
    implicit val sqlCtx = spark.sqlContext
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[Doc]
      val out = StreamDedup.byFingerprint(src.toDF(), textCol = "text",
        keyCols = Seq("lang"), tsCol = "ts", delay = "10 minutes")
      val ckp = java.nio.file.Files.createTempDirectory("sdd_rdb_ckp").toString
      val emitted = scala.collection.mutable.ArrayBuffer[Long]()
      def drain(): Unit = {
        val q = out.writeStream.outputMode("append")
          .option("checkpointLocation", ckp)
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              emitted.synchronized {
                emitted ++= b.collect().map(_.getLong(0))
              }
              ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      src.addData(Doc(1, "Hello  World", "en", ts(0)))
      drain()
      src.addData(Doc(2, "hello world", "en", ts(1))) // cross-batch dup
      drain()
      assert(emitted.toSet == Set(1L), s"RocksDB-backed dedup: $emitted")
      val stateFiles = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(ckp, "state")).map(_.getName)
      }
      assert(stateFiles.exists(n =>
          n.endsWith(".zip") || n.endsWith(".changelog")),
        s"no RocksDB snapshot/changelog artifacts in state dir: $stateFiles")
      assert(!stateFiles.exists(_.endsWith(".delta")),
        s"HDFS-store .delta files present — RocksDB did not engage")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }
}
