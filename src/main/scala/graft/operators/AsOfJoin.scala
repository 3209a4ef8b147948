package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the most recent right row at or
  * before its timestamp, per key — the canonical event-stream enrichment
  * operator Spark has no built-in for (beyond-reference surface; the
  * custom-operator preference order says compose built-ins first, and the
  * composition here IS the scalable plan, so no custom `SparkStrategy` is
  * warranted).
  *
  * Implementation is the union + carry-forward-window trick, NOT a
  * key+range join: a range join explodes to O(|L|·|R|) pairs per key
  * before filtering, while this plan is sort-based —
  *
  *   union(tagged L, tagged R)
  *     → Window last_value(right payload, ignoreNulls) OVER
  *         (PARTITION BY key ORDER BY ts, isLeft  ROWS UNBOUNDED PRECEDING)
  *     → keep left rows
  *
  * — one hash exchange on the key and a per-partition sort, the same
  * shape (and cost) as the dedup live view. Right rows sort before left
  * rows at equal timestamps, so an exactly-simultaneous right row IS
  * visible to the left row ("at or before" semantics).
  */
object AsOfJoin {

  /** @param left       left relation (rows to enrich)
    * @param right      right relation (lookup stream)
    * @param keys       equi-join key column names (present in both)
    * @param leftTs     left event-time column (long or timestamp)
    * @param rightTs    right event-time column (same type)
    * @param rightPayload right columns to carry onto left rows
    *                     (renamed as-is in the output; must not collide)
    * @param forward    false (default): most recent right row AT OR
    *                   BEFORE the left timestamp; true: earliest right
    *                   row AT OR AFTER it (same plan, time reversed —
    *                   the carry-forward window runs over descending
    *                   timestamps; the equal-ts tie still puts the right
    *                   row first so an exactly-simultaneous right row is
    *                   visible in both directions)
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String], forward: Boolean = false): DataFrame = {
    // internal plumbing columns — a caller frame already using one of
    // these names would silently collide in the union layout below
    val reserved = Seq("_ts", "_isLeft", "_rp")
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty,
      s"asOf reserves column names ${reserved.mkString(", ")}; " +
        s"rename ${clash.mkString(", ")} in the input frames")
    val leftCols = left.columns.toSeq
    // common layout: keys ++ ts ++ left payload (null on right rows) ++
    // right payload (null on left rows) ++ side tag.
    // Determinism requires `right` be unique per (keys, rightTs) —
    // pre-aggregate (e.g. max_by on an ingest seq) if it isn't.
    val lp = leftCols.filterNot(c => keys.contains(c) || c == leftTs)
    // Right payload travels as ONE struct column: the whole struct is
    // null on left rows and non-null on right rows, so carry-forward
    // cannot mix columns from different right rows or skip a right row
    // whose payload legitimately contains NULLs.
    val rowStruct = struct(rightPayload.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        rightPayload.map(c => right.schema(c).copy(name = c))))
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("_ts"), lit(1).as("_isLeft")) ++
        lp.map(col) :+
        nullStruct.as("_rp"): _*)
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("_ts"), lit(0).as("_isLeft")) ++
        lp.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rowStruct.as("_rp"): _*)
    val tsOrder = if (forward) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_rp", last(col("_rp"), ignoreNulls = true).over(w))
    carried.filter(col("_isLeft") === 1)
      .select((keys.map(col) :+ col("_ts").as(leftTs)) ++
        lp.map(col) ++ rightPayload.map(c => col(s"_rp.$c").as(c)): _*)
  }
}
