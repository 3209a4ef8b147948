package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert + delete) of a CDC changeset into a snapshot
  * target — the set-based form of the reference's row-at-a-time CDC apply
  * (`/root/reference/src/cdc_replicator.py:229-264` routes INSERT/UPDATE/
  * DELETE per event; here one declarative plan applies a whole batch).
  *
  * Scale shape: ONE shuffle on the primary key (the anti join); the
  * changeset union is shuffle-free. With the target bucketed on the pk
  * ([[Bucketing]]) the anti join co-locates and the merge is exchange-free
  * on the target side — at 100 TB the cost is bounded by the changeset
  * size, not the table size, exactly what an incremental pipeline needs.
  * AQE broadcasts the anti join's build side when the changeset is small.
  */
object Merge {

  /** Apply `changes` to `target` by `pk`:
    *   - a change row with `deletedCol` = 1 deletes the matching pk;
    *   - any other change row replaces (or inserts) its pk's row.
    * `changes` must carry the target's columns plus `deletedCol`, and at
    * most one row per pk (enforce upstream with [[LiveView]] dedup —
    * last-writer-wins collapses a multi-event batch to one row per key).
    */
  def upsert(target: DataFrame, changes: DataFrame, pk: String,
             deletedCol: String = "_deleted"): DataFrame = {
    require(changes.columns.contains(deletedCol),
      s"changes must carry $deletedCol")
    val keep = target.join(changes.select(col(pk)), Seq(pk), "left_anti")
    val applied = changes.filter(col(deletedCol) === 0).drop(deletedCol)
    keep.unionByName(applied.select(target.columns.map(col).toSeq: _*))
  }

  /** Order-independent versioned merge (the ReplacingMergeTree LWW shape):
    * per pk the row with the highest `versionCol` wins, whether it came
    * from `state` or `changes` — so out-of-order batches and at-least-once
    * redelivery cannot regress a newer row, unlike [[upsert]] which
    * blindly trusts the changeset. Tombstone rows (`_deleted` = 1) are
    * RETAINED in the returned state so a late older event cannot
    * resurrect a deleted key; filter them at read time.
    *
    * Cost: one keyed shuffle of state + changes per call (vs [[upsert]]'s
    * changeset-bounded anti join) — the price of order independence.
    * State and changes must have identical columns.
    */
  def upsertVersioned(state: DataFrame, changes: DataFrame, pk: String,
                      versionCol: String): DataFrame = {
    require(state.columns.sorted.sameElements(changes.columns.sorted),
      "state and changes must have identical columns")
    val rest = state.columns.filterNot(_ == pk)
    state.unionByName(changes)
      .groupBy(col(pk))
      .agg(max_by(struct(rest.map(col).toSeq: _*), col(versionCol)).as("_w"))
      .select((col(pk) +: rest.map(c => col("_w." + c).as(c))).toSeq: _*)
  }
}
