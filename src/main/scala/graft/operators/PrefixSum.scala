package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed exact prefix sum over a global total order — the building
  * block behind cumulative-coverage, shard-assignment, and equi-depth
  * binning operators.
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
  * The within-partition pass is a single `mapPartitions` scan over the
  * range-sorted rows, NOT a `Window.partitionBy(spark_partition_id())`:
  * Catalyst cannot see that the range exchange already clusters rows by
  * their partition id, so the window form forces a SECOND full exchange
  * (hash by pid) of the corpus — the round-7 plan audit caught exactly
  * that. A sequential prefix scan inside an already-sorted partition is
  * the textbook case of genuine per-partition imperative logic; the plan
  * is now one range exchange + one tiny (≤nRanges-row) offsets aggregate.
  *
  * Extracted from the round-5 `x_vocab_coverage` rewrite; also drives
  * `x_shard_assign` and `x_equidepth_bins`.
  */
object PrefixSum {

  /** `df` plus an INCLUSIVE running sum of `value` over the global order
    * `order`, as column `cumName` (long). NULL values contribute 0 to the
    * running sum — the SQL `sum`-ignores-NULL convention (the r7-audited
    * form NPE'd on a null, undocumented). Internally materializes the
    * scanned frame once (via [[graft.GateCache]]): both the offsets
    * branch and the output must see the SAME sampled range bounds. */
  def inclusive(df: DataFrame, order: Seq[Column], value: Column,
                nRanges: Int, cumName: String): DataFrame = {
    // reserved internals (the AsOfJoin/RangeJoin convention): a caller
    // column with one of these names would be silently overwritten or
    // duplicated into an ambiguous reference
    val reserved = Seq("_ps_v", "_ps_pid", "_ps_lcum", "_ps_lmin", "_ps_off")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns clash with PrefixSum internals: ${clash.mkString(",")}")
    val withV = df.withColumn("_ps_v", value.cast("long"))
    val ranged = withV.repartitionByRange(math.max(1, nRanges), order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = ranged.schema.fieldIndex("_ps_v")
    val outSchema = StructType(ranged.schema.fields ++
      Seq(StructField("_ps_pid", IntegerType, nullable = false),
        StructField("_ps_lcum", LongType, nullable = false)))
    val local = graft.GateCache.cache(
      ranged.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var c = 0L
        it.map { r =>
          if (!r.isNullAt(vIdx)) c += r.getLong(vIdx)
          Row.fromSeq(r.toSeq :+ pid :+ c)
        }
      }(Encoders.row(outSchema)))
    // The offsets window is a plain Window.orderBy — over ≤nRanges rows
    // (one per partition), which is exactly the frame size where a
    // single-reducer window is the right plan. Range buckets are
    // assigned to ascending partition ids, so pid order IS range order.
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("_ps_pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_ps_pid"))
      .agg(sum(col("_ps_v")).as("_ps_psum"))
      .withColumn("_ps_off", coalesce(sum(col("_ps_psum")).over(wOff), lit(0L)))
    local.join(broadcast(offsets.select(col("_ps_pid"), col("_ps_off"))),
        "_ps_pid")
      .withColumn(cumName, col("_ps_lcum") + col("_ps_off"))
      .drop("_ps_pid", "_ps_lcum", "_ps_v")
  }

  /** `df` plus an EXCLUSIVE running minimum of `value` (double) over the
    * global order — NULL for the global first row. NULL values are
    * ignored by the running min (same convention as [[inclusive]]). Same two-pass shape as
    * [[inclusive]] with min as the combine: local exclusive running min
    * per range partition, merged with the exclusive prefix-min of the
    * per-partition minima (broadcast, ≤nRanges rows). The sort-order
    * prefix-min is the scalable 2-D skyline primitive: sorted by (x asc,
    * y asc), a point is Pareto-optimal iff every earlier point has a
    * strictly larger y — i.e. iff the exclusive prefix-min of y exceeds
    * its own. */
  def exclusiveMin(df: DataFrame, order: Seq[Column], value: Column,
                   nRanges: Int, outName: String): DataFrame = {
    val withV = df.withColumn("_ps_v", value.cast("double"))
    val ranged = withV.repartitionByRange(math.max(1, nRanges), order: _*)
      .sortWithinPartitions(order: _*)
    val vIdx = ranged.schema.fieldIndex("_ps_v")
    val outSchema = StructType(ranged.schema.fields ++
      Seq(StructField("_ps_pid", IntegerType, nullable = false),
        StructField("_ps_lmin", org.apache.spark.sql.types.DoubleType,
          nullable = true)))
    val local = graft.GateCache.cache(
      ranged.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var m = Double.NaN // NaN = "no prior row" sentinel, emitted as null
        it.map { r =>
          val excl: Any = if (m.isNaN) null else m
          // NULL values don't move the running min (min-ignores-NULL, the
          // same convention as inclusive's sum)
          if (!r.isNullAt(vIdx)) {
            val v = r.getDouble(vIdx)
            m = if (m.isNaN || v < m) v else m
          }
          Row.fromSeq(r.toSeq :+ pid :+ excl)
        }
      }(Encoders.row(outSchema)))
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("_ps_pid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("_ps_pid"))
      .agg(min(col("_ps_v")).as("_ps_pmin"))
      .withColumn("_ps_off", min(col("_ps_pmin")).over(wOff))
    // least() ignores NULLs in both engines — NULL stands for "no prior
    // row", the identity of min
    local.join(broadcast(offsets.select(col("_ps_pid"), col("_ps_off"))),
        "_ps_pid")
      .withColumn(outName, least(col("_ps_lmin"), col("_ps_off")))
      .drop("_ps_pid", "_ps_lmin", "_ps_off", "_ps_v")
  }
}
