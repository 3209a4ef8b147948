package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coalescing apply for binlog_row_image=MINIMAL change streams — the
  * apply mode the reference CANNOT run: its processors null absent
  * columns into the upsert row (`/root/reference/src/cdc_replicator.py:
  * 157-212` take the event's row dict as-is), so under MINIMAL images a
  * ReplacingMergeTree survivor loses every column the update didn't
  * touch. Here a minimal update MERGES onto the prior row state: per key
  * and per column, the surviving value is the one carried by the LAST
  * change that actually INCLUDED the column (the `_present` bitmap
  * [[graft.sources.BinlogSource.changes]] surfaces — the only thing
  * distinguishing "not included" from an explicit SQL NULL, which IS a
  * set and does overwrite).
  *
  * Correctness of the single-pass form: a key is live iff its last
  * change is not a DELETE. A live key's last INSERT post-dates its last
  * DELETE, and an INSERT includes every column (MySQL inserts are
  * always full rows even under MINIMAL), so for a live key the
  * latest-including change of EVERY column post-dates the last delete —
  * `max_by` over include-events needs no delete-fencing. Delete images
  * (the BEFORE image, old values) never count as includes.
  *
  * Scale: ONE hash aggregation on the PK — map-side partial `max_by`
  * per column, no window, no per-key iterator state; the same shuffle
  * shape as [[LiveView]]'s aggregate form. At 100 TB this is the apply
  * you want for MINIMAL fleets: the alternative (join every update to
  * current state) shuffles the full table per batch.
  */
object MinimalImage {

  /** Coalesce a decoded change frame (row-image columns + `opCol` +
    * `seqCol` + `presentCol`) into the live table. `payload` columns
    * must appear in TABLE_MAP order at the FRONT of the frame (the
    * [[graft.sources.BinlogSource.changes]] layout) — the `_present`
    * array is positional. */
  def coalesce(changes: DataFrame, pks: Seq[String],
               opCol: String = "op", seqCol: String = "_seq",
               presentCol: String = "_present"): DataFrame = {
    val meta = Set(opCol, seqCol, presentCol, "_tbl")
    val payload = changes.columns.filterNot(meta.contains).toIndexedSeq
    require(pks.forall(payload.contains), s"pks $pks missing from $payload")
    payload.foreach { c =>
      require(changes.columns.indexOf(c) < payload.size,
        s"payload column $c does not precede the meta columns — " +
          "the positional _present bitmap would misalign")
    }
    val valueCols = payload.filterNot(pks.contains)
    val aggs = valueCols.map { c =>
      val pos = changes.columns.indexOf(c) + 1 // element_at is 1-based
      // the value at the LAST change that included this column; delete
      // images (old values) are never includes. max_by keeps an
      // explicit NULL set (the include bit is on the ROW's seq, not on
      // the value) — pinned by MinimalImageSpec's null-vs-absent test
      max_by(col(c), when(element_at(col(presentCol), pos) &&
        col(opCol) =!= CdcTransform.Delete, col(seqCol))).as(c)
    } :+ max_by(col(opCol), col(seqCol)).as("_last_op")
    changes.groupBy(pks.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("_last_op") =!= CdcTransform.Delete)
      .select(payload.map(col): _*)
  }
}
