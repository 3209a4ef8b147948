package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming progress reporting — O6 parity with the reference's periodic
  * structured logs (every 100 CDC events, `src/cdc_replicator.py:358-364`;
  * every 10 snapshot batches, `src/replicator.py:59-61`). Spark's
  * micro-batch progress events carry strictly more (rows/s, batch
  * durations, state metrics); this listener surfaces them as one log line
  * per batch and keeps a bounded in-memory history for tests/inspection.
  */
final class ProgressLogger(maxHistory: Int = 100)
    extends StreamingQueryListener {

  final case class BatchProgress(
      queryName: String, batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double)

  private val history = new ConcurrentLinkedQueue[BatchProgress]()

  def batches: Seq[BatchProgress] = {
    import scala.jdk.CollectionConverters._
    history.asScala.toSeq
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    println(s"[graft-stream] started name=${e.name} id=${e.id}")

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val bp = BatchProgress(Option(p.name).getOrElse(""), p.batchId,
      p.numInputRows, p.processedRowsPerSecond)
    history.add(bp)
    while (history.size() > maxHistory) history.poll()
    println(s"[graft-stream] name=${bp.queryName} batch=${bp.batchId} " +
      s"rows=${bp.numInputRows} rows/s=${bp.processedRowsPerSecond}")
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    println(s"[graft-stream] terminated id=${e.id} " +
      s"error=${e.exception.getOrElse("none")}")

  override def onQueryIdle(e: QueryIdleEvent): Unit = ()
}

object ProgressLogger {
  /** Attach a fresh logger to the session's stream manager. */
  def attach(spark: SparkSession, maxHistory: Int = 100): ProgressLogger = {
    val l = new ProgressLogger(maxHistory)
    spark.streams.addListener(l)
    l
  }
}
