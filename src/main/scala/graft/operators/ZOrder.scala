package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan pruning.
  *
  * Parquet row-group (and file) min/max statistics prune scans only when
  * the predicate column correlates with the physical row order. Sorting by
  * `(a, b)` prunes `a`-predicates perfectly and `b`-predicates not at all;
  * interleaving the bits of `a` and `b` into one Morton key and
  * range-partitioning + sorting by it gives BOTH columns locality — each
  * file covers a small rectangle of the (a, b) space, so point/range
  * predicates on either column touch only the files whose rectangle
  * intersects (the Delta/Iceberg `OPTIMIZE ZORDER BY` capability as a
  * plain Spark operator).
  *
  * The key is a pure bit-arithmetic expression chain (shifts/and/or —
  * whole-stage codegen, no UDF). `repartitionByRange` samples the key to
  * build balanced range bounds — one shuffle, the price of any re-layout.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral columns:
    * result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`. */
  def zkey2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(al, i).bitwiseAND(1L), 2 * i)
      val bbit = shiftleft(shiftright(bl, i).bitwiseAND(1L), 2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Bits needed to represent every observed key of both columns: one
    * scalar max pass (cheap next to the re-layout shuffle itself). A key
    * wider than the interleave width would silently collapse distant keys
    * into one Morton bucket and quietly lose the two-column pruning the
    * layout exists for — derive, don't guess. */
  def bitsFor(df: DataFrame, c1: String, c2: String): Int = {
    val r = df.agg(max(greatest(col(c1).cast("long"), col(c2).cast("long"))))
      .head()
    val mx = if (r.isNullAt(0)) 0L else math.max(r.getLong(0), 0L)
    val need = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(mx))
    require(need <= 31,
      s"keys up to $mx need $need bits — beyond the 31-bit interleave " +
        "range; pre-scale the columns or z-order a derived key")
    need
  }

  /** Re-layout `df` so files cover compact (c1, c2) rectangles:
    * range-partition on the Morton key (sampled balanced bounds), then
    * sort rows inside each partition so row-group stats are tight too.
    * `bits` defaults to the observed key width ([[bitsFor]]) so growing
    * key domains (l_partkey at sf≥1 runs into the millions) never
    * silently fall off the interleave; pass it explicitly to pin a
    * layout width across incremental runs. */
  def layoutBy2(df: DataFrame, c1: String, c2: String,
                numFiles: Int, bits: Int = -1): DataFrame = {
    val b = if (bits > 0) bits else bitsFor(df, c1, c2)
    val keyed = df.withColumn("_zkey", zkey2(col(c1), col(c2), b))
    keyed.repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
  }
}
