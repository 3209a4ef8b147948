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

  /** OHLC downsampling: per (bar, event_type) open/high/low/close +
    * count. Open/close are `min_by`/`max_by` over a zero-padded
    * `(ts_us, event_id)` string key — a totally-ordered scalar tie-break
    * that is (a) portable to the oracle's `arg_min`/`arg_max` and (b) a
    * plain declarative aggregate, so the SAME expression runs under
    * `readStream` + watermark (rank-window formulations don't stream).
    * Input needs `ts_us`/`event_id` columns plus the TimestampType
    * `tsCol`. One exchange on the (bar, type) key; partial aggregation
    * map-side like any min/max. */
  def ohlcBars(events: DataFrame, tsCol: String, barLen: String,
               watermark: Option[String] = None): DataFrame = {
    val base = watermark match {
      case Some(w) => events.withWatermark(tsCol, w)
      case None => events
    }
    val key = format_string("%020d|%012d", col("ts_us"), col("event_id"))
    base.groupBy(window(col(tsCol), barLen).as("w"), col("event_type"))
      .agg(min_by(col("value"), key).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), key).as("close"),
        count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("bar_us"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n_events"))
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
