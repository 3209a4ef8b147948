package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed streaming analytics — extension surface (the
  * reference has no event-time windows, SURVEY.md §2.9 T5; this is the
  * capability a training-data/event pipeline adds on top).
  *
  * Works on both a streaming and a batch frame (same declarative plan):
  * tumbling/sliding window aggregation with a watermark for state cleanup.
  * In production: `readStream → windowedCounts → writeStream` with
  * append-mode emission once the watermark passes the window end; state
  * size is bounded by (watermark horizon / slide) × key cardinality.
  */
object EventAnalytics {

  /** Tumbling (or sliding, if `slide` given) window counts + value sums
    * per event type. `tsCol` must be a TimestampType column. */
  def windowedTypeCounts(events: DataFrame, tsCol: String,
                         windowLen: String, slide: Option[String] = None,
                         watermark: Option[String] = None): DataFrame = {
    val base = watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
      case None => events
    }
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None => window(col(tsCol), windowLen)
    }
    base.groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Sessionization by inactivity gap (session_window) — the stateful
    * shape `mapGroupsWithState` would otherwise hand-roll. */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
                    watermark: Option[String] = None): DataFrame = {
    val base = watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
      case None => events
    }
    base.groupBy(session_window(col(tsCol), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("user_id"), col("n_events"))
  }
}
