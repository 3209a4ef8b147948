package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics pins for the round-9 analytics additions: the Q21-shaped
  * double-correlated-subquery decorrelation, RANGE window frames, and the
  * HLL set-operation gate. Cross-engine exactness is the DuckDB oracle's
  * job; these specs pin the Spark-side rewrites against literal forms. */
class AnalyticsGatesSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q21_sole_late_supplier: aggregate-then-join decorrelation equals the literal EXISTS/NOT EXISTS form") {
    val dir = TestSpark.Sf0001
    Tables.read(spark, dir, "lineitem").createOrReplaceTempView("q21_li")
    Tables.read(spark, dir, "orders").createOrReplaceTempView("q21_ord")
    Tables.read(spark, dir, "supplier").createOrReplaceTempView("q21_supp")
    Tables.read(spark, dir, "nation").createOrReplaceTempView("q21_nat")
    // the correlated form the oracle states, executed by Spark itself —
    // Catalyst rewrites the subqueries to semi/anti joins; our gate's
    // single-aggregate decorrelation must agree row-for-row
    val literal = spark.sql(
      """SELECT s_name, n_name, count(*) AS numwait
        |FROM q21_li l1
        |JOIN q21_ord ON o_orderkey = l1.l_orderkey
        |JOIN q21_supp ON s_suppkey = l1.l_suppkey
        |JOIN q21_nat ON n_nationkey = s_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM q21_li l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM q21_li l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 25""".stripMargin)
      .as[(String, String, Long)].collect().toSeq
    val gate = Analytics.queries("q21_sole_late_supplier")(spark, dir)
      .as[(String, String, Long)].collect().toSeq
    assert(gate == literal)
    assert(gate.nonEmpty, "lateness threshold selects no waiting supplier")
  }

  test("window_range_frame: one exchange; RANGE frame counts the value-band, positional family pins partition ends") {
    val df = Analytics.queries("window_range_frame")(spark, TestSpark.Sf0001)
    val nEx = "(?m)^.*Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(nEx == 1, "both windows must share the o_custkey exchange")
    val rows = df
      .select(col("o_custkey").cast("long"), col("o_orderkey").cast("long"),
        col("day_no").cast("long"), col("n_trailing_30d"),
        col("first_orderkey").cast("long"), col("last_orderkey").cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, part) =>
      val days = part.map(_._3)
      part.foreach { case (_, _, d, n30, firstK, lastK) =>
        assert(n30 == days.count(x => x >= d - 30 && x <= d),
          s"RANGE frame at day $d")
        // first/last over the full-partition frame: the (day_no, orderkey)
        // extremes of the partition, identical on every row
        val ord = part.sortBy(r => (r._3, r._2))
        assert(firstK == ord.head._2 && lastK == ord.last._2)
      }
    }
  }

  test("x_hll_audience_overlap: exact overlap matches set intersection; estimate within the tight statistical bound") {
    val dir = TestSpark.Sf0001
    val du = Tables.read(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .as[(String, Long)].collect()
    val sets = du.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val rows = EventOps.queries("x_hll_audience_overlap")(spark, dir)
      .as[(String, String, Long, Long, Boolean)].collect()
    val types = sets.keySet.toSeq.sorted
    assert(rows.length == types.combinations(2).length)
    rows.foreach { case (a, b, overlap, union, inBound) =>
      assert(a < b)
      assert(overlap == (sets(a) intersect sets(b)).size.toLong)
      assert(union == (sets(a) union sets(b)).size.toLong)
      assert(inBound) // the 15%-of-union gate bound
    }
  }

  test("setop_bag_priorities: bag intersect/except equal multiset min/difference arithmetic") {
    val dir = TestSpark.Sf0001
    val ord = Tables.read(spark, dir, "orders")
      .select(col("o_custkey").cast("long"), col("o_orderpriority"),
        year(col("o_orderdate")).cast("int"))
      .as[(Long, String, Int)].collect()
    def bag(yr: Int) = ord.filter(_._3 == yr)
      .groupBy(r => (r._1, r._2)).view.mapValues(_.length).toMap
    val b96 = bag(1996); val b97 = bag(1997)
    val expected = (
      b96.map { case (k, n) => ("both", k._2, math.min(n, b97.getOrElse(k, 0))) } ++
      Seq.empty).groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3.toLong).sum).toMap ++
      b96.map { case (k, n) => ("only_1996", k._2, math.max(n - b97.getOrElse(k, 0), 0)) }
        .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3.toLong).sum).toMap
    val rows = Analytics.queries("setop_bag_priorities")(spark, dir)
      .as[(String, String, Long)].collect()
      .map { case (op, pri, n) => (op, pri) -> n }.toMap
    expected.filter(_._2 > 0).foreach { case (k, v) =>
      assert(rows.getOrElse(k, 0L) == v, s"mismatch at $k")
    }
    rows.foreach { case (k, v) => assert(expected.getOrElse(k, 0L) == v) }
  }

  test("x_null_semantics: null group counted, skipped by count(col), and self-matching only under <=>") {
    val rows = Analytics.queries("x_null_semantics")(spark, TestSpark.Sf0001)
      .select(col("k"), col("n_rows"), col("n_nonnull"),
        col("n_nullsafe_pairs"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nullRow = rows.filter(_._1.isEmpty)
    assert(nullRow.length == 1, "exactly one null group")
    val (_, nr, nn, np) = nullRow.head
    assert(nn == 0L) // count(k) skips nulls
    assert(nr > 0L)
    assert(np == nr * nr) // <=> matches null to null: full cross of the group
    rows.filter(_._1.nonEmpty).foreach { case (_, r, n, p) =>
      assert(r == n)     // non-null groups: count(*) == count(k)
      assert(p == r * r)
    }
  }

  test("x_rolling_median: frame median equals a straight-line trailing-window reference") {
    val dir = TestSpark.Sf0001
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val expected = ev.groupBy(_._1).flatMap { case (_, es) =>
      val ord = es.sortBy(e => (e._3, e._2))
      ord.indices.map { i =>
        val frame = ord.slice(math.max(0, i - 4), i + 1).map(_._4)
        (ord(i)._1, ord(i)._2) -> median(frame)
      }
    }
    val rows = EventOps.queries("x_rolling_median")(spark, dir)
      .as[(Long, Long, Double)].collect()
    assert(rows.length == ev.length)
    rows.foreach { case (u, e, m) =>
      assert(m == expected((u, e)), s"user $u event $e")
    }
  }

  test("x_spatial_grid_join: gate ≡ brute-force within-radius pairs on real data; grid recall is total") {
    import graft.functions.PortableHash
    val dir = TestSpark.Sf0001
    val (span, r) = (Analytics.GeoSpanMicroDeg, Analytics.GeoRadiusMicroDeg)
    // brute force straight-line reference over the same hashed coords
    val pts = Tables.read(spark, dir, "customer")
      .select(col("c_custkey").as("id"),
        (PortableHash.hash32w(col("c_custkey").cast("string"), "geo|", 0)
          % span).as("x"),
        (PortableHash.hash32w(col("c_custkey").cast("string"), "geo|", 1)
          % span).as("y"))
      .as[(Long, Long, Long)].collect()
    val all = for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
    } yield (a._1, b._1, d2)
    val within = all.filter(_._3 <= r * r)
    // candidate set per the grid: adjacent (≤1 apart) cells on both axes
    val cand = all.filter { case (ai, bi, _) =>
      val a = pts.find(_._1 == ai).get; val b = pts.find(_._1 == bi).get
      math.abs(a._2 / r - b._2 / r) <= 1 && math.abs(a._3 / r - b._3 / r) <= 1
    }
    // total recall: cell size = radius ⇒ every within-pair is a candidate
    assert(within.map(p => (p._1, p._2)).toSet
      .subsetOf(cand.map(p => (p._1, p._2)).toSet))
    val got = Analytics.queries("x_spatial_grid_join")(spark, dir)
      .as[(Long, Long, Long)].collect().head
    assert(got._1 == cand.length.toLong, "candidate count differs from grid law")
    assert(got._2 == within.length.toLong)
    assert(got._3 == within.map(_._3).sum)
    // the data genuinely exercises both outcomes: candidates that fail the
    // exact check exist (grid is a superset), and some pairs are within
    assert(within.nonEmpty && cand.length > within.length)
    graft.GateCache.releaseAll()
  }
}
