package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.SchemaModel.{DeletedCol, SeqCol, VersionCol}

/** ClickHouse CollapsingMergeTree semantics re-expressed Spark-first.
  *
  * The reference syncs into ReplacingMergeTree and reads through `FINAL`
  * (`/root/reference/src/schema_converter.py:118-138` — the [[LiveView]]
  * surface). Collapsing is ClickHouse's sibling table-engine family for
  * the same job: instead of replace-on-merge, every state change carries a
  * `sign` column (+1 = state row, −1 = cancel of the previous state) and
  * the merge *adds signs* — a (+1, −1) pair annihilates, `FINAL` keeps the
  * last surviving +1 per key. A consumer of the reference that chose
  * Collapsing for its tables gets the exact same live rows; this module
  * pins that equivalence (the gate's oracle is byte-identical to
  * `w1_live_view`'s).
  *
  * Scale shape: the sign-changelog normally *arrives* from upstream (it is
  * what the application emits); [[changelog]] synthesizes it here from the
  * versioned upsert stream with ONE per-key window (single hash exchange +
  * in-partition sort, previous state recovered by `lag` over a packed
  * struct — no self-join). The collapse itself ([[collapseFinal]]) is the
  * payoff: ONE partial-agg'd shuffle (`sum(sign)` + `max_by` both combine
  * map-side), strictly cheaper at 100 TB than the ranking-window FINAL,
  * which must sort every key group. Signs are additive, so the collapse is
  * also incrementally mergeable across batches — the MergeTree property.
  */
object Collapsing {

  val SignCol = "_sign"

  /** Sign-changelog of a stamped upsert stream: per key in
    * (`_version`, seq) order, every live state (`_deleted = 0`) emits
    * `(+1, state)` and every transition *out of* a live state emits
    * `(−1, previous state)` — a delete row contributes only its cancel,
    * consecutive deletes contribute nothing. Per key the signs therefore
    * net to 1 when the latest row is live and 0 when it is a tombstone.
    */
  def changelog(
      df: DataFrame,
      pks: Seq[String],
      payload: Seq[String],
      seqCol: String = SeqCol): DataFrame = {
    require(pks.nonEmpty, "changelog needs at least one key column")
    val carried = payload ++ Seq(VersionCol, seqCol, DeletedCol)
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(VersionCol).asc, col(seqCol).asc)
    // previous row recovered through ONE lag over a packed struct — the
    // window is a single exchange + sort regardless of payload width
    val prev = df.withColumn("_prev",
      lag(struct(carried.map(col): _*), 1).over(w))
    val outCols: Seq[Column] =
      pks.map(col) ++ carried.map(col) :+ col(SignCol)
    val plus = prev.filter(col(DeletedCol) === 0)
      .withColumn(SignCol, lit(1)).select(outCols: _*)
    val minus = prev
      .filter(col("_prev").isNotNull && col(s"_prev.$DeletedCol") === 0)
      .select((pks.map(col) ++
        carried.map(c => col(s"_prev.$c").as(c)) :+
        lit(-1).as(SignCol)): _*)
    plus.unionByName(minus)
  }

  /** `FINAL` over a sign-changelog: per key, signs are summed (the merge)
    * and the latest +1 state — max (`_version`, seq) among sign = +1 rows,
    * the row ClickHouse's collapse keeps — survives iff the net sign is
    * positive. One partial-agg'd shuffle on the key: `sum` and `max_by`
    * both combine map-side, and `max_by`'s ordering key is NULL on cancel
    * rows, which the underlying Max ignores — no second pass, no window.
    * Meta columns are projected away, [[LiveView.live]]-style. */
  def collapseFinal(
      changelog: DataFrame,
      pks: Seq[String],
      payload: Seq[String],
      seqCol: String = SeqCol): DataFrame = {
    val survivor = changelog.groupBy(pks.map(col): _*)
      .agg(
        sum(col(SignCol)).as("_net"),
        max_by(struct(payload.map(col): _*),
          when(col(SignCol) === 1,
            struct(col(VersionCol), col(seqCol)))).as("_last_plus"))
      .filter(col("_net") > 0)
    survivor.select(
      (pks.map(col) ++ payload.map(c => col(s"_last_plus.$c").as(c))): _*)
  }
}
