package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join — beyond-reference extension surface.
  *
  * Spark plans a raw non-equi join (`a.s <= b.e AND b.s <= a.e`) as
  * BroadcastNestedLoopJoin: every left row against every right row. Fine
  * when one side is tiny, quadratic disaster at 100 TB. The standard scale
  * path is **banding**: quantize the (numeric) interval domain into bands
  * of width `bandWidth`, explode each interval into the bands it covers,
  * equi-join on the band id, then apply the exact overlap predicate.
  * The shuffle is on a dense integer key; cost is linear in rows ×
  * bands-per-interval instead of |L|·|R|.
  *
  * Duplicate suppression without a distinct: a pair overlapping across
  * several shared bands is emitted only in the band containing
  * `greatest(l_start, r_start)` — the canonical first band of the
  * intersection — so no post-join dedup shuffle is needed.
  *
  * Pick `bandWidth` ≈ the typical interval length: too small multiplies
  * the explode fan-out, too large degrades toward a cross join within a
  * band (same trade-off as any spatial grid index).
  */
object RangeJoin {

  private def band(c: Column, w: Int): Column =
    floor(c.cast("double") / w).cast("long")

  /** Inner overlap-join of `left` and `right` on
    * `[lStart, lEnd] ∩ [rStart, rEnd] ≠ ∅` (inclusive ends, integer
    * domain). Column SETS of the two sides must be disjoint — the result
    * carries all columns of both. */
  def bandedOverlap(left: DataFrame, lStart: String, lEnd: String,
                    right: DataFrame, rStart: String, rEnd: String,
                    bandWidth: Int): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"bandedOverlap requires disjoint column names; shared: $shared")
    require(!(left.columns ++ right.columns).contains("_band"),
      "_band is reserved by bandedOverlap")
    val lb = left.withColumn("_band",
      explode(sequence(band(col(lStart), bandWidth),
        band(col(lEnd), bandWidth))))
    val rb = right.withColumn("_band",
      explode(sequence(band(col(rStart), bandWidth),
        band(col(rEnd), bandWidth))))
    lb.join(rb,
        lb("_band") === rb("_band") &&
          col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
          lb("_band") === band(greatest(col(lStart), col(rStart)), bandWidth))
      .drop("_band")
  }
}
