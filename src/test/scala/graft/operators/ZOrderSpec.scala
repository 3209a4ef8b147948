package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the Morton key's bit semantics against a straight-line JVM
  * reference and the layout's reason to exist: point predicates on EITHER
  * dimension intersect fewer file-rectangles than a linear (c1, c2) sort
  * gives the second dimension. */
class ZOrderSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zkey2 matches the JVM Morton reference over the small domain") {
    val rows = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("a", "b")
      .withColumn("z", ZOrder.zkey2($"a", $"b", bits = 6))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 6), s"($a,$b)") }
    // bijective on the domain → distinct keys
    assert(rows.map(_._3).distinct.length == rows.length)
  }

  test("z-order layout bounds point lookups on BOTH dims to a strict subset of partitions") {
    // a square 64×64 grid — both dims carry equal entropy, the shape
    // z-order exists for (the harness corpus has a 20:1 cardinality skew
    // between partkey and suppkey at small SF, which no layout can give
    // second-dim locality with only 8 files)
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("a", "b")
    val n = 8
    def touchedPartitions(df: org.apache.spark.sql.DataFrame,
                          c: String, v: Long): Long =
      df.withColumn("_pid", spark_partition_id())
        .groupBy("_pid")
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .filter(col("lo") <= v && col("hi") >= v)
        .count()
    val zed = ZOrder.layoutBy2(grid, "a", "b", numFiles = n, bits = 6).cache()
    val linear = grid.repartitionByRange(n, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b")).cache()
    try {
      // linear (a, b) sort prunes `a` perfectly but gives `b` nothing —
      // every partition spans b's full range
      assert(touchedPartitions(linear, "a", 7L) < n)
      assert(touchedPartitions(linear, "b", 7L) == n)
      // z-order prunes BOTH dims (each file covers a compact rectangle).
      // Exactly balanced bounds give n/2 for the worst dim, but
      // repartitionByRange's sampled bounds (seeded by the global RDD id,
      // so suite-order-dependent) can shift a boundary by a few rows —
      // allow that slack; the property under test is both-dims locality
      // vs linear's total miss on `b`, not the exact rectangle count.
      assert(touchedPartitions(zed, "a", 7L) <= n / 2 + 2)
      assert(touchedPartitions(zed, "b", 7L) <= n / 2 + 2)
    } finally { zed.unpersist(); linear.unpersist(); () }
  }

  test("range-partitioned sorted export: files cover disjoint ascending ranges") {
    val out = java.nio.file.Files.createTempDirectory("graft_sorted").toString
    spark.read.parquet(s"${graft.TestSpark.Sf0001}/orders.parquet")
      .repartitionByRange(4, $"o_totalprice")
      .sortWithinPartitions($"o_totalprice")
      .write.mode("overwrite").parquet(out)
    // per-file [min, max] of the sort column must not overlap — the
    // total order spans file boundaries, so a range predicate binary-
    // searches to a file and min/max stats prune the rest
    val ranges = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map { f =>
        val d = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"o_totalprice"), max($"o_totalprice")).head()
        (d.getDouble(0), d.getDouble(1))
      }
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: $hi > $lo")
    }
  }

  test("x_ddsketch_quantiles: estimates within (γ−1)/(γ+1) of exact rank values") {
    import org.apache.spark.sql.functions.col
    val g = graft.queries.Warehouse.DdGamma
    val bound = (g - 1) / (g + 1) + 1e-4 // + rounding slack (4 dp output)
    val got = graft.queries.Warehouse.queries("x_ddsketch_quantiles")(
      spark, TestSpark.Sf0001)
      .select(col("o_orderpriority"), col("n_rows"),
        col("p50_est").cast("double"), col("p90_est").cast("double"))
      .as[(String, Long, Double, Double)].collect()
    val orders = graft.queries.Tables.read(spark, TestSpark.Sf0001, "orders")
      .select($"o_orderpriority", $"o_totalprice").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.length == orders.size)
    got.foreach { case (prio, n, p50, p90) =>
      val v = orders(prio)
      assert(n == v.length)
      def exact(q: Double) = v(math.ceil(q * v.length).toInt - 1)
      assert(math.abs(p50 - exact(0.5)) / exact(0.5) <= bound,
        s"$prio p50 est=$p50 exact=${exact(0.5)}")
      assert(math.abs(p90 - exact(0.9)) / exact(0.9) <= bound,
        s"$prio p90 est=$p90 exact=${exact(0.9)}")
    }
  }

  test("x_approx_quantiles: sketch honors the ε-rank contract vs exact ranks") {
    // the raw sketch values (now internal to the gate — its output is the
    // adjudicable booleans), re-derived here and checked against exact
    // JVM ranks: the TIGHT statistical contract, vs the gate's loose one
    import org.apache.spark.sql.functions.{col, lit, percentile_approx}
    val approx = graft.queries.Tables.read(spark, TestSpark.Sf0001, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.9), lit(10000)).as("p90"))
      .as[(String, Double, Double)].collect()
    val orders = graft.queries.Tables.read(spark, TestSpark.Sf0001, "orders")
      .select($"o_orderpriority", $"o_totalprice").as[(String, Double)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (prio, p50, p90) =>
      val v = orders(prio); val n = v.length
      val eps = math.max(1, n / 10000) // accuracy=10000 → ε·n rank error
      def rankOf(x: Double) = v.count(_ <= x)
      assert(math.abs(rankOf(p50) - 0.5 * n) <= eps + 1, s"$prio p50")
      assert(math.abs(rankOf(p90) - 0.9 * n) <= eps + 1, s"$prio p90")
      assert(v.contains(p50) && v.contains(p90)) // sketch returns real values
    }
    // and the gate's own booleans (what the driver hashes) are all true
    val gate = graft.queries.Warehouse.queries("x_approx_quantiles")(
      spark, TestSpark.Sf0001)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(gate.length == orders.size)
    gate.foreach { case (prio, nRows, b50, b90) =>
      assert(nRows == orders(prio).length && b50 && b90, prio)
    }
  }
}
