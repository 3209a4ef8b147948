package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Composite typed state on `transformWithState`: where [[RunningTotals]]
  * pins the single-`ValueState` shape, this processor carries TWO
  * differently-shaped state variables on one handle — a
  * `MapState[String, Long]` (per-event-type counts: point lookups and
  * point updates, no read-modify-write of a whole blob) and a
  * `ListState[Long]` (the append-only cents log: appends are O(1) writes
  * to RocksDB, not rewrite-the-value) — which is exactly the reason the
  * API supersedes `flatMapGroupsWithState`'s one opaque value per key.
  *
  * Determinism contract: every emitted field is an order-independent
  * reduction (counts and integer-cent sums) over the state, so shuffle
  * arrival order and micro-batch boundaries cannot perturb the final
  * emission — the same quantize-before-state argument as
  * [[RunningTotals]], which is what lets a relational oracle adjudicate
  * the landed output.
  *
  * Scale shape: state hash-partitioned by user; per batch the map gets
  * O(types-touched) point updates and the list O(rows) appends — cost of
  * the delta, never of the history.
  */
object TypedStateProfile {

  /** One row per touched user per batch — running per-type counts (from
    * the map), the all-type total, and the cents-log length + sum (from
    * the list). */
  case class Profile(user_id: Long, n_click: Long, n_error: Long,
                     n_purchase: Long, n_signup: Long, n_view: Long,
                     n_total: Long, n_cents: Long, total_cents: Long)

  private val KnownTypes =
    Seq("click", "error", "purchase", "signup", "view")

  class Processor extends StatefulProcessor[Long, (Long, String, Long), Profile] {
    @transient private var byType: MapState[String, Long] = _
    @transient private var centsLog: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      byType = getHandle.getMapState[String, Long]("byType",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      centsLog = getHandle.getListState[Long]("centsLog",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
                                 timerValues: TimerValues): Iterator[Profile] = {
      rows.foreach { case (_, tpe, cents) =>
        val prev = if (byType.containsKey(tpe)) byType.getValue(tpe) else 0L
        byType.updateValue(tpe, prev + 1)
        centsLog.appendValue(cents)
      }
      val counts = KnownTypes.map { t =>
        if (byType.containsKey(t)) byType.getValue(t) else 0L
      }
      // n_total sums EVERY map entry, not just the five projected
      // columns: an unrecognized event_type still counts toward the
      // all-type total (and keeps n_total consistent with n_cents,
      // which logs every row)
      var total = 0L
      byType.iterator().foreach { kv => total += kv._2 }
      var n = 0L
      var sum = 0L
      centsLog.get().foreach { c => n += 1; sum += c }
      Iterator.single(Profile(key, counts(0), counts(1), counts(2),
        counts(3), counts(4), total, n, sum))
    }
  }

  /** `changes` must carry `user_id` (long), `event_type` (string) and
    * `cents` (long). Update-mode emissions; the last emission per user
    * (max `n_total`) is the full profile. */
  def profileStream(changes: DataFrame): Dataset[Profile] = {
    import changes.sparkSession.implicits._
    changes.select(col("user_id"), col("event_type"), col("cents"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .transformWithState(new Processor,
        TimeMode.None(), OutputMode.Update())
  }
}
