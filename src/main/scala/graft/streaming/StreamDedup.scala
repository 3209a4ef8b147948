package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Streaming exact-dedup stage for a document ingest pipeline — the
  * at-ingest counterpart of [[graft.functions.DedupOps.exactDedup]]
  * (which dedups at rest).
  *
  * Built on `dropDuplicatesWithinWatermark`: the first arrival of each
  * key survives, later arrivals are dropped, and a key's state is
  * evicted once the watermark passes its event time plus the delay —
  * so state is bounded by the watermark horizon (keys/interval), never
  * by corpus history. The trade is explicit: a duplicate arriving AFTER
  * its original's state was evicted is re-admitted. That is the correct
  * contract for continuous ingest at 100 TB — exact global dedup over
  * all history belongs to the batch operator (or a downstream
  * [[graft.operators.LiveView]]-style read-path dedup); unbounded
  * streaming state is how such jobs die.
  *
  * Spark-first note: `dropDuplicatesWithinWatermark` (not plain
  * streaming `dropDuplicates`, whose state never ages out; not
  * `flatMapGroupsWithState`, which would re-implement exactly this).
  */
object StreamDedup {

  /** Dedup `stream` on (content fingerprint of `textCol`) + `keyCols`.
    * `tsCol` must be the event-time column the caller's watermark policy
    * applies to; `delay` is the dedup horizon (how long a key is
    * remembered). Adds no output columns: `_fp` is internal. */
  def byFingerprint(stream: DataFrame, textCol: String,
                    keyCols: Seq[String], tsCol: String,
                    delay: String): DataFrame = {
    require(!stream.columns.contains("_fp"),
      "_fp is reserved by StreamDedup")
    stream.withColumn("_fp", Text.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("_fp" +: keyCols)
      .drop("_fp")
  }
}
