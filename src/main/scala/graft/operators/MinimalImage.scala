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

  /** Derive (and validate) the payload columns of a change frame: the
    * non-meta columns, which MUST lead the frame because the
    * `_present` bitmap is positional. Shared contract of [[coalesce]]
    * and [[partial]]. */
  private def payloadColumns(changes: DataFrame, pks: Seq[String],
                             opCol: String, seqCol: String,
                             presentCol: String): IndexedSeq[String] = {
    val meta = Set(opCol, seqCol, presentCol, "_tbl")
    val payload = changes.columns.filterNot(meta.contains).toIndexedSeq
    require(pks.forall(payload.contains), s"pks $pks missing from $payload")
    payload.foreach { c =>
      require(changes.columns.indexOf(c) < payload.size,
        s"payload column $c does not precede the meta columns — " +
          "the positional _present bitmap would misalign")
    }
    payload
  }

  /** Coalesce a decoded change frame (row-image columns + `opCol` +
    * `seqCol` + `presentCol`) into the live table. `payload` columns
    * must appear in TABLE_MAP order at the FRONT of the frame (the
    * [[graft.sources.BinlogSource.changes]] layout) — the `_present`
    * array is positional. Output columns keep that payload order. */
  def coalesce(changes: DataFrame, pks: Seq[String],
               opCol: String = "op", seqCol: String = "_seq",
               presentCol: String = "_present"): DataFrame = {
    val payload = payloadColumns(changes, pks, opCol, seqCol, presentCol)
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

  /** The STREAMING form's per-micro-batch state: for every value column
    * the (value, seq) of the batch's LAST include-event — `c` carries
    * the value, `_seq_c` its include seq (null when the batch never
    * included `c` for the key) — plus the batch-last op. Partials MERGE
    * associatively ([[merge]]'s `max_by(c, _seq_c)` picks the globally
    * latest include across any batch split), so a consumer lands one
    * partial frame per micro-batch (append-only, O(batch) rows) and
    * re-reduces at read — history is NEVER re-shuffled per batch, which
    * is the 100 TB point: the per-batch cost is one hash aggregation of
    * the BATCH, the read cost one hash aggregation of the landed
    * partials (≤ one row per touched key per batch, compacting like any
    * append table). A batch carrying only a key's partial update lands
    * null `_seq_` markers for the untouched columns, which the merge
    * IGNORES — columns landed by earlier batches survive (pinned by
    * `MinimalImageSpec`). */
  def partial(changes: DataFrame, pks: Seq[String],
              opCol: String = "op", seqCol: String = "_seq",
              presentCol: String = "_present"): DataFrame = {
    val payload = payloadColumns(changes, pks, opCol, seqCol, presentCol)
    val valueCols = payload.filterNot(pks.contains)
    valueCols.foreach(c => require(!c.startsWith("_seq_") &&
      c != "_last_op" && c != "_last_seq",
      s"payload column $c collides with the partial-state columns"))
    val aggs = valueCols.flatMap { c =>
      val pos = changes.columns.indexOf(c) + 1
      val includeSeq = when(element_at(col(presentCol), pos) &&
        col(opCol) =!= CdcTransform.Delete, col(seqCol))
      Seq(max_by(col(c), includeSeq).as(c), max(includeSeq).as(s"_seq_$c"))
    } ++ Seq(max_by(col(opCol), col(seqCol)).as("_last_op"),
      max(col(seqCol)).as("_last_seq"))
    changes.groupBy(pks.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Reduce landed [[partial]] frames to the live table — the same math
    * as [[coalesce]] over the original events, because per column the
    * globally-last include is the max over the per-batch last includes
    * (and seqs are a total order across batches). Delete fencing needs
    * no extra care for the same reason as [[coalesce]]: a live key's
    * last INSERT included every column. One hash aggregation on the PK,
    * map-side partial `max_by` per column.
    *
    * [[partial]] frames lose the change frame's payload INTERLEAVING
    * (their groupBy puts the pks first), so to be column-for-column
    * interchangeable with [[coalesce]] — whose output keeps TABLE_MAP
    * order — pass the original order as `payloadOrder` (positional
    * consumers like `exceptAll` silently misalign otherwise whenever a
    * pk is not the frame's first payload column). Left empty, primary
    * keys lead the output. */
  def merge(partials: DataFrame, pks: Seq[String],
            payloadOrder: Seq[String] = Nil): DataFrame = {
    val valueCols = partials.columns.filterNot(c => pks.contains(c) ||
      c.startsWith("_seq_") || c == "_last_op" || c == "_last_seq")
      .toIndexedSeq
    require(valueCols.forall(c => partials.columns.contains(s"_seq_$c")),
      s"not a partial frame: per-column seq markers missing in " +
        s"${partials.columns.mkString(",")}")
    val outCols =
      if (payloadOrder.isEmpty) pks ++ valueCols
      else {
        require(payloadOrder.sorted == (pks ++ valueCols).sorted,
          s"payloadOrder $payloadOrder is not a permutation of " +
            s"${pks ++ valueCols}")
        payloadOrder
      }
    val aggs = valueCols.map(c => max_by(col(c), col(s"_seq_$c")).as(c)) :+
      max_by(col("_last_op"), col("_last_seq")).as("_last_op")
    partials.groupBy(pks.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("_last_op") =!= CdcTransform.Delete)
      .select(outCols.map(col): _*)
  }
}
