package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The staged-partsupp contract behind the four partsupp TPC-H gates
  * (Q2/Q9/Q11/Q20 — queries/Procurement.scala). The DuckDB oracle rebuilds
  * partsupp from the same arithmetic, so these pin the Spark-side staging
  * invariants the oracle CTE assumes. */
class ProcurementSpec extends AnyFunSuite with graft.GateCacheHygiene {
  private lazy val s = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("partsupp domain = lineitem's distinct (partkey, suppkey); key unique") {
    val ps = Procurement.partsupp(s, dir)
    val pairs = Tables.read(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    assert(ps.count() == pairs.count())
    assert(ps.select(col("ps_partkey"), col("ps_suppkey")).distinct()
      .count() == ps.count())
    // referential integrity: every lineitem row joins to exactly one ps row
    val orphans = Tables.read(s, dir, "lineitem")
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"), "left_anti")
    assert(orphans.count() == 0)
  }

  test("attribute arithmetic matches the oracle CTE formula and ranges") {
    val rows = Procurement.partsupp(s, dir).collect()
    rows.foreach { r =>
      val pk = r.getAs[Long]("ps_partkey"); val sk = r.getAs[Long]("ps_suppkey")
      assert(r.getAs[Int]("ps_availqty") == ((pk * 7 + sk * 3) % 9999 + 1).toInt)
      assert(r.getAs[Long]("ps_supplycost") == (pk * 31 + sk * 17) % 1000 + 1)
      assert(r.getAs[Int]("ps_availqty") >= 1 && r.getAs[Int]("ps_availqty") <= 9999)
      assert(r.getAs[Long]("ps_supplycost") >= 1 && r.getAs[Long]("ps_supplycost") <= 1000)
    }
  }

  test("staging is memoized: second call reads the same files") {
    val a = Procurement.partsupp(s, dir).inputFiles.toSet
    val b = Procurement.partsupp(s, dir).inputFiles.toSet
    assert(a.nonEmpty && a == b)
  }

  test("q2 result rows carry the per-part min cost over EUROPE suppliers") {
    val res = Procurement.queries("q2_min_cost_supplier")(s, dir).collect()
    assert(res.nonEmpty)
    // recompute eligibility independently: for each output part, no
    // EUROPE-region supplier offers it cheaper
    val ps = Procurement.partsupp(s, dir)
    val eur = ps
      .join(Tables.read(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.read(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.read(s, dir, "region").filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("ps_partkey")).agg(min(col("ps_supplycost")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach { r =>
      assert(r.getAs[Long]("supplycost") == eur(r.getAs[Long]("p_partkey")))
    }
  }

  test("q11 keeps exactly the parts above 2x the average stock share") {
    val res = Procurement.queries("q11_important_stock")(s, dir)
    val kept = res.collect().map(_.getAs[Long]("ps_partkey")).toSet
    val ps = Procurement.partsupp(s, dir)
    val scoped = ps
      .join(Tables.read(s, dir, "supplier"), col("ps_suppkey") === col("s_suppkey"))
      .join(Tables.read(s, dir, "nation").filter(col("n_name") === "NATION_7"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("ps_partkey"),
        (col("ps_supplycost") * col("ps_availqty").cast("long")).as("v"))
    val per = scoped.groupBy(col("ps_partkey")).agg(sum(col("v")).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = per.values.sum
    val n = per.size
    val expect = per.filter { case (_, sv) => sv * n > total * 2 }.keySet
    assert(kept == expect)
  }

  test("q20 suppliers all sit in NATION_3 and hold a genuine excess position") {
    val res = Procurement.queries("q20_excess_suppliers")(s, dir).collect()
    val n3 = Tables.read(s, dir, "supplier")
      .join(Tables.read(s, dir, "nation").filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    assert(res.map(_.getAs[Long]("s_suppkey")).forall(n3.contains))
  }

  test("q12 ledger: only MAIL/SHIP rows, and every counted line is a " +
      "genuine late-commit receipt in the window") {
    val res = Procurement.queries("q12_shipmode_priority")(s, dir).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getAs[String]("l_shipmode")).toSet
      .subsetOf(Set("MAIL", "SHIP")))
    // total counted lines = independent recount from raw keys
    val total = res.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val li = Tables.read(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      to_date(col("l_shipdate")).as("ship"))
      .withColumn("mode", (col("l_orderkey") * 7 + col("l_linenumber")) % 5)
      .withColumn("cd", date_add(col("ship"),
        ((col("l_orderkey") * 3 + col("l_linenumber") * 5) % 60 - 30)
          .cast("int")))
      .withColumn("rd", date_add(col("ship"),
        ((col("l_orderkey") * 11 + col("l_linenumber") * 13) % 45 + 1)
          .cast("int")))
    val expect = li.filter(col("mode").isin(0, 1) &&
      col("cd") < col("rd") && col("ship") < col("cd") &&
      col("rd") >= lit("1996-01-01").cast("date") &&
      col("rd") < lit("1997-01-01").cast("date")).count()
    assert(total == expect)
  }

  test("q9 plan shape: pruned fact scan, broadcast dims, no nested-loop " +
      "or cartesian join anywhere in the family") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def flat(p: SparkPlan): Seq[SparkPlan] =
      Seq(p) ++ p.children.flatMap(flat) ++
        (p match { case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
                   case _ => p.subqueries.flatMap(flat) })
    for (g <- Seq("q9_product_profit", "q2_min_cost_supplier",
        "q11_important_stock", "q20_excess_suppliers",
        "q12_shipmode_priority")) {
      val df = Procurement.queries(g)(s, dir)
      df.count() // let AQE finalize
      val nodes = flat(df.queryExecution.executedPlan).map(_.nodeName)
      assert(!nodes.exists(_.contains("CartesianProduct")),
        s"$g has a cartesian product: ${nodes.distinct}")
      // q11's one BroadcastNestedLoopJoin is the deliberate scalar attach:
      // crossJoin(broadcast(1-row totals)) — bounded by construction.
      // Everywhere else a BNLJ means an equi-join degraded.
      if (g != "q11_important_stock")
        assert(!nodes.exists(_.contains("BroadcastNestedLoopJoin")),
          s"$g has a nested-loop join: ${nodes.distinct}")
      else
        assert(nodes.count(_.contains("BroadcastNestedLoopJoin")) == 1)
    }
    val q9 = Procurement.queries("q9_product_profit")(s, dir)
    q9.count()
    val plan = q9.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "q9 dims did not broadcast")
    // the fact scan reads exactly the six needed lineitem columns
    val scans = flat(q9.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString
          .contains("lineitem")) => f.requiredSchema.fieldNames.toSet
    }
    assert(scans.nonEmpty && scans.head == Set("l_orderkey", "l_partkey",
      "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"),
      s"lineitem scan not pruned: $scans")
  }

  test("q9 profit reconciles against a row-level recomputation") {
    val res = Procurement.queries("q9_product_profit")(s, dir)
    val totalProfit =
      res.agg(sum(col("profit")).cast("double")).collect()(0).getDouble(0)
    // independent recomputation without the groupBy: same join tree,
    // ungrouped decimal sum
    val ps = Procurement.partsupp(s, dir)
    val widget = Tables.read(s, dir, "part")
      .filter(col("p_name").like("%widget%")).select(col("p_partkey"))
    val flat = Tables.read(s, dir, "lineitem")
      .join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(widget, col("l_partkey") === col("p_partkey"))
      .join(Tables.read(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(22,6)")
        - (col("ps_supplycost") * col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(22,6)")).cast("decimal(38,6)").cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(totalProfit - flat) < 1e-6 * math.max(1.0, math.abs(flat)))
  }

  test("b4: the bucketed 6-way Q9 agrees with the shuffled Q9 row-for-row " +
      "(the layout changes the plan, never the result)") {
    val bucketed = Procurement.queries("b4_bucketed_q9_profit")(s, dir)
    val shuffled = Procurement.queries("q9_product_profit")(s, dir)
    assert(bucketed.count() == shuffled.count())
    // exact decimal equality both directions (profit is DECIMAL(38,6))
    assert(bucketed.exceptAll(shuffled).isEmpty &&
      shuffled.exceptAll(bucketed).isEmpty)
    // the gate's own requires already pinned: fact edge SMJ, zero
    // partkey/suppkey exchanges, dims broadcast — reaching here means
    // they held at spec scale too (the gate throws otherwise)
  }

  test("b4 leaves the shared session's broadcast thresholds untouched " +
      "(conf isolation via newSession — r11 ADVICE)") {
    val before = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => s.conf.getOption(k))
    Procurement.queries("b4_bucketed_q9_profit")(s, dir).count()
    val after = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => s.conf.getOption(k))
    assert(after == before, s"b4 mutated shared conf: $before -> $after")
    assert(!after.contains(Some("-1")))
  }
}
