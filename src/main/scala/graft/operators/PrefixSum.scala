package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum over a global total order — the building
  * block behind cumulative-coverage and shard-assignment operators.
  *
  * A naive `Window.orderBy` with no partitioning funnels the whole frame
  * through ONE reducer task; at a billion-row frame that single task is
  * the job. This is the standard two-pass alternative: range-partition on
  * the order key (`repartitionByRange` samples split bounds), cum-sum
  * WITHIN each partition (parallel), then add each partition's prefix
  * offset computed from the ≤`nRanges`-row per-partition totals frame
  * (broadcast back). The order key must be globally UNIQUE — uniqueness is
  * what makes the result independent of the sampled range bounds.
  *
  * Extracted from the round-5 `x_vocab_coverage` rewrite; also drives
  * `x_shard_assign`.
  */
object PrefixSum {

  /** `df` plus an INCLUSIVE running sum of `value` over the global order
    * `order`, as column `cumName`. Internally materializes the ranged
    * frame once (via [[graft.GateCache]]): `_ps_pid` comes from sampled
    * range bounds, and both the offsets branch and the output must see
    * the SAME assignment — bounds re-sampled per branch could differ. */
  def inclusive(df: DataFrame, order: Seq[Column], value: Column,
                nRanges: Int, cumName: String): DataFrame = {
    val ranged = df.repartitionByRange(math.max(1, nRanges), order: _*)
    val wIn = Window.partitionBy(col("_ps_pid"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = graft.GateCache.cache(
      ranged.withColumn("_ps_pid", spark_partition_id())
        .withColumn("_ps_lcum", sum(value).over(wIn)))
    // The offsets window is a plain Window.orderBy — over ≤nRanges rows
    // (one per partition), which is exactly the frame size where a
    // single-reducer window is the right plan.
    val wOff = Window.orderBy(col("_ps_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_ps_pid"))
      .agg(sum(value).as("_ps_psum"))
      .withColumn("_ps_off", coalesce(sum(col("_ps_psum")).over(wOff), lit(0L)))
    local.join(broadcast(offsets.select(col("_ps_pid"), col("_ps_off"))),
        "_ps_pid")
      .withColumn(cumName, col("_ps_lcum") + col("_ps_off"))
      .drop("_ps_pid", "_ps_lcum", "_ps_off")
  }
}
