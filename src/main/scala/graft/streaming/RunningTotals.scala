package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key running totals on the `transformWithState` API — Spark 4's
  * arbitrary-state operator (SPARK-46815) that supersedes
  * `flatMapGroupsWithState` (which [[StatefulLiveView]] still demonstrates):
  * state is a named, typed, schema-evolvable variable on a handle rather
  * than one opaque blob, so a processor can hold several state vars, add
  * more later without breaking old checkpoints, and attach per-var TTL.
  *
  * The processor keeps one `ValueState` (event count, exact value cents)
  * per user and emits the updated running totals once per key per
  * micro-batch — update-mode semantics, an incrementally-maintained
  * aggregate. Values are quantized to integer cents BEFORE entering state
  * (`cents` column) so replay order and batch boundaries cannot perturb a
  * float sum — the emitted totals are bit-exact regardless of batching,
  * which is what lets a relational oracle adjudicate the landed output.
  *
  * Scale shape: state is hash-partitioned by user across executors (the
  * same exchange a batch groupBy pays once) and maintained incrementally
  * in RocksDB — per batch the cost is the delta, not the history. TTL
  * (`TTLConfig`) is the production guard against unbounded key cardinality;
  * this runner replays with `Trigger.AvailableNow`, where processing-time
  * TTL would keep the drain from terminating (same caveat as
  * [[StatefulLiveView]]'s tombstone GC), so the drain path runs without it.
  */
object RunningTotals {

  /** (n_events, total_cents) per user, updated per batch. */
  class Processor extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update((n, cents))
      Iterator.single((key, n, cents))
    }
  }

  /** `changes` must carry `user_id` (long) and `cents` (long). Returns the
    * per-batch emissions as (user_id, n_events, total_cents) — in a
    * multi-batch replay a user appears once per batch that touched them,
    * with monotonically growing totals; the LAST emission per user is the
    * full aggregate. */
  def totalsStream(changes: DataFrame): Dataset[(Long, Long, Long)] = {
    import changes.sparkSession.implicits._
    changes.select(col("user_id"), col("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor,
        TimeMode.None(), OutputMode.Update())
  }
}
