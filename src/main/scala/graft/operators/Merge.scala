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
    // a NULL deletedCol (an un-stamped source) reads as NOT deleted:
    // without the coalesce the filter drops the row while the anti join
    // already removed its pk — a silent delete instead of a replace
    val applied = changes
      .filter(coalesce(col(deletedCol), lit(0)) === 0).drop(deletedCol)
    keep.unionByName(applied.select(target.columns.map(col).toSeq: _*))
  }

  /** Change data feed of [[upsert]]: the row-level diff a downstream
    * consumer (an incremental MV, a cache invalidator, a replica) needs to
    * follow the merge without rescanning the target. For each change key:
    *
    *   - insert           → one `insert` row (the after-image);
    *   - replace of an existing key → `update_preimage` + `update_postimage`;
    *   - delete of an existing key  → one `delete` row (the before-image);
    *   - delete of an absent key    → NOTHING (a no-op merge emits no change).
    *
    * Returned columns = target's columns + `_op`. Scale shape: the outer
    * join PRESERVES the changeset side, so Spark could not broadcast the
    * changeset into it — naively that shuffles the whole table. Instead
    * the target is first semi-join-PRUNED to the changeset's keys (build
    * side = broadcast keys, so the table streams map-side with no
    * exchange), and the outer join then runs over two changeset-sized
    * frames. Total cost: one table scan + O(changeset) joins — no
    * table-sized shuffle, same class as [[upsert]]'s anti join. Pair with
    * [[upsert]] on the same inputs: applying the feed's post-images/
    * deletes to `target` reproduces the merged table (MergeSpec pins
    * this). */
  def changeFeed(target: DataFrame, changes: DataFrame, pk: String,
                 deletedCol: String = "_deleted"): DataFrame = {
    require(changes.columns.contains(deletedCol),
      s"changes must carry $deletedCol")
    val tCols = target.columns.toSeq
    val tgt = target
      .join(broadcast(changes.select(col(pk)).distinct()), Seq(pk),
        "left_semi")
      .select(col(pk).as("_t_pk"), struct(tCols.map(col): _*).as("_before"))
    val chg = changes.select(
      col(pk).as("_c_pk"), col(deletedCol).as("_del"),
      struct(tCols.map(col): _*).as("_after"))
    val joined = chg.join(tgt, col("_c_pk") === col("_t_pk"), "left")
    val matched = col("_t_pk").isNotNull
    // NULL-safe: a NULL _del row is a replace (upsert's coalesce
    // contract) — a bare === would null every _keep flag and emit
    // NOTHING for a row upsert applied, breaking feed ≡ merge
    val isDel = coalesce(col("_del"), lit(0)) === 1
    val entries = array(
      struct(lit("delete").as("_op"), col("_before").as("_row"),
        (isDel && matched).as("_keep")),
      struct(lit("update_preimage").as("_op"), col("_before").as("_row"),
        (!isDel && matched).as("_keep")),
      struct(lit("update_postimage").as("_op"), col("_after").as("_row"),
        (!isDel && matched).as("_keep")),
      struct(lit("insert").as("_op"), col("_after").as("_row"),
        (!isDel && !matched).as("_keep")))
    joined
      .select(explode(filter(entries, e => e("_keep"))).as("_e"))
      .select(col("_e._op").as("_op") +: tCols.map(c =>
        col(s"_e._row.$c").as(c)): _*)
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
