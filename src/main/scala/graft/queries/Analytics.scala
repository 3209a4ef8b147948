package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beyond-reference analytics surface over the harness star schema
  * (SURVEY.md §7.2 step 7): real aggregations, joins, top-k, windows —
  * the query classes the reference delegates to ClickHouse, expressed as
  * declarative Spark plans.
  *
  * Determinism-for-oracle rules used throughout:
  *   - money/quantity sums cast to DECIMAL before aggregating (float sums
  *     are order-dependent; decimal sums are exact in both engines);
  *   - every top-k has a total-order tie-break on a key column;
  *   - no raw ns-precision timestamps in output (dates only).
  *
  * Scale notes per query in the Scaladoc of each entry.
  */
object Analytics {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Spatial grid join: the synthetic 1°×1° point box, micro-degrees. */
  val GeoSpanMicroDeg = 1000000L

  /** Spatial grid join: radius AND cell size (cell = radius ⇒ any pair
    * within r falls in adjacent cells — recall 1.0 by construction). */
  val GeoRadiusMicroDeg = 10000L

  /** The file's exact-money doctrine (header) as named idioms: per-row
    * cast to an exact DECIMAL, accumulate in DECIMAL(38) — one
    * definition instead of 13 hand-repeated cast chains (review find). */
  private def decSum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("decimal(38,2)")
  /** Σ extendedprice·(1−discount), the TPC-H discounted revenue. */
  private def discRevenueSum: Column =
    sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(22,6)")).cast("decimal(38,6)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: single scan + hash agg on low-cardinality keys.
    // Partial aggregation makes the shuffle tiny at any scale.
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          discRevenueSum.as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: 3-way join; `customer` is small → broadcast hint
    // keeps the big fact tables shuffle-free on the probe side at scale.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(discRevenueSum.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // TPC-H Q5 shape: star join through region→nation→customer→orders→
    // lineitem. All dims broadcast; only orders⋈lineitem shuffles.
    "q5_local_supplier_volume" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(discRevenueSum.as("revenue"))
    }),

    // TPC-H Q7 shape: date-range join + year extraction, volume by
    // (supplier nation would need partsupp; here customer-nation pairs).
    "q7_volume_by_year" -> ((s, dir) => {
      val nation = t(s, dir, "nation"); val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), year(col("l_shipdate")).as("ship_year"))
        .agg(discRevenueSum.as("volume"))
    }),

    // TPC-H Q17 shape: correlated aggregate (per-part average) consumed by
    // the outer scan — expressed aggregate-then-join (decorrelated form).
    "q17_small_quantity_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // "qty < 0.5 * avg(qty per part)" stated multiplicatively
      // (2·qty·n < Σqty) — exact decimal arithmetic, no division, so both
      // engines agree at boundaries.
      val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(decSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n_part_items"))
      li.join(perPart, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity").cast("decimal(18,2)") * 2 * col("n_part_items")
          < col("sum_qty"))
        .agg(decSum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape: EXISTS with a correlated non-equi condition —
    // planned as a left-semi join whose equi part (orderkey) drives the
    // shuffle and whose date inequality rides along as the join filter.
    // Orders with any line shipped > 30 days after the order date.
    "q4_late_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-06-30").cast("timestamp")))
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))),

    // TPC-H Q19 shape: disjunctive multi-table predicates. The per-branch
    // (brand, size, quantity) conjunctions only resolve after the join,
    // but Catalyst pushes the derived single-table residuals (brand IN
    // (...), size/quantity hull) into both scans — the pushdown pattern
    // this query exists to pin.
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val part = t(s, dir, "part")
      def branch(brand: String, szHi: Int, qLo: Int, qHi: Int) =
        col("p_brand") === brand && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#1", 15, 1, 11) ||
          branch("Brand#2", 25, 10, 20) ||
          branch("Brand#3", 35, 20, 30))
        .agg(discRevenueSum.as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q22 shape: scalar aggregate subquery (global average balance,
    // broadcast as a 1-row frame) consumed by a filter, then an anti join
    // against orders. The above-average test is stated multiplicatively
    // (bal·n > Σbal — exact decimal, no division) so both engines agree
    // at boundaries, the q17 trick.
    "q22_idle_customers" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val stats = cust.filter(col("c_acctbal") > 0)
        .agg(decSum(col("c_acctbal")).as("_sum"),
          count(lit(1)).as("_n"))
      cust.crossJoin(broadcast(stats))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("_n") > col("_sum"))
        // idle = no 1997 order (every customer has SOME order in this
        // dataset, so the classic "no orders at all" would be vacuous)
        .join(t(s, dir, "orders").filter(year(col("o_orderdate")) === 1997),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          decSum(col("c_acctbal")).as("total_bal"))
    }),

    // TPC-H Q21 shape: the double-correlated-subquery pattern — EXISTS
    // (another supplier in the order) AND NOT EXISTS (another LATE
    // supplier in the order) — adapted to the harness schema (no
    // l_receiptdate/l_commitdate: "late" = shipped >90 days after the
    // order date; no partsupp needed). Spark-first decorrelation: ONE
    // per-order aggregate (supplier count + late-supplier count) replaces
    // both correlated subqueries, turning two repeated fact-table probes
    // into a single shuffle reused by an equi-join — the classic Q21
    // rewrite, and the shape that survives 100 TB (the correlated form
    // re-scans lineitem twice per outer row). ONE lineitem pass: the
    // per-(order, supplier) aggregate carries both the late-line count
    // (the numwait contribution) and the any-late flag; per-order
    // supplier stats are a WINDOW over that already-reduced frame (one
    // row per order-supplier pair — tiny vs lineitem), so the fact table
    // is scanned and shuffled exactly once, with no recompute branch.
    "q21_sole_late_supplier" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val perOrdSupp = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(col("_late"), 1L).otherwise(0L)).as("_n_late_lines"),
          max(col("_late")).as("_any_late"))
      val wOrd = Window
        .partitionBy(col("l_orderkey"))
      perOrdSupp
        .withColumn("_n_supp", count(lit(1)).over(wOrd))
        .withColumn("_n_late",
          sum(when(col("_any_late"), 1L).otherwise(0L)).over(wOrd))
        .filter(col("_any_late") && col("_n_supp") > 1 && col("_n_late") === 1)
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_name"), col("n_name"))
        .agg(sum(col("_n_late_lines")).cast("long").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(25)
    }),

    // RANGE window frames (value-based, vs the ROWS frames of
    // window_running_sum): trailing-30-day order count/sum per customer
    // keyed on days-since-epoch — deterministic even with same-day ties
    // because RANGE frames are peer-inclusive by value. Plus the
    // first/last/nth_value positional family over a full-partition frame.
    // Single hash exchange on o_custkey; per-partition sort only.
    "window_range_frame" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
      val wRange = w.orderBy(col("day_no").asc).rangeBetween(-30, 0)
      val wFull = w.orderBy(col("day_no").asc, col("o_orderkey").asc)
        .rowsBetween(Long.MinValue, Long.MaxValue)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .as("day_no"),
          col("o_totalprice").cast("decimal(18,2)").as("_price"))
        .select(col("o_custkey"), col("o_orderkey"), col("day_no"),
          count(lit(1)).over(wRange).as("n_trailing_30d"),
          sum(col("_price")).over(wRange).cast("decimal(38,2)")
            .as("sum_trailing_30d"),
          first(col("o_orderkey")).over(wFull).as("first_orderkey"),
          last(col("o_orderkey")).over(wFull).as("last_orderkey"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_orderkey"))
    }),

    // SQL surface: the same engine through spark.sql over registered views.
    "sql_interface" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderpriority, count(*) AS n,
              |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total
              |FROM orders_v GROUP BY o_orderpriority""".stripMargin)
    }),

    // TPC-H Q18 shape: HAVING over an aggregated subquery, re-joined to
    // dims — aggregate-then-join keeps the heavy side small before the
    // (broadcast) customer join.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(decSum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast("decimal(18,2)").as("total_price"),
          col("total_qty"))
    }),

    // JSON scalar extraction (the reference passes JSON columns through as
    // strings — `src/schema_converter.py:36`; downstream parsing is ours):
    // bucket events by the numeric `k` field of the props JSON.
    "json_props_buckets" -> ((s, dir) =>
      Tables.events(s, dir)
        // integer division (`div`) — `/` + cast differs between engines
        // (Spark truncates the double, DuckDB's int cast rounds)
        .select(expr(
          "CAST(CAST(get_json_object(props, '$.k') AS INT) div 10 AS INT)")
          .as("k_bucket"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n_events"))),

    // Date arithmetic: shipping-delay histogram (datediff over the
    // order→ship interval); one join + small-key agg.
    "date_shipping_delay" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate"), col("o_orderdate")).as("delay_days"))
        .groupBy(col("delay_days"))
        .agg(count(lit(1)).as("n_items"))),

    // Set operations: INTERSECT / EXCEPT over derived key sets (customers
    // active in 1996 vs 1997) — both plan as aggregate-style dedup joins.
    "setop_retained_customers" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      def active(yr: Int) = ord
        .filter(year(col("o_orderdate")) === yr).select("o_custkey")
      active(1996).intersect(active(1997))
        .withColumn("status", lit("retained"))
        .unionByName(
          active(1996).except(active(1997))
            .withColumn("status", lit("churned")))
    }),

    // NULL-handling semantics surface: GROUP BY with a null group,
    // count(*) vs count(col) (the latter skips nulls), and the
    // null-safe equality join (`<=>` / IS NOT DISTINCT FROM — the one
    // equality under which the null group matches itself). A synthetic
    // nullable key (every 7th order) exercises all three against the
    // same frame; the null-safe self-join count for the null group is
    // n_null² while plain `=` would yield zero. The frame is a 1/29
    // key-slice: the self-join is quadratic PER KEY by design (that's
    // the semantics being pinned), so the input must stay bounded.
    "x_null_semantics" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .filter(pmod(col("o_orderkey"), lit(29)) === 0)
        .select(col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
          .otherwise(col("o_orderpriority")).as("k"))
      val counts = a.groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), count(col("k")).as("n_nonnull"))
      val selfPairs = a.select(col("k"))
        .join(a.select(col("k").as("k2")), col("k") <=> col("k2"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_nullsafe_pairs"))
      counts.as("c").join(selfPairs.as("p"),
          col("c.k") <=> col("p.k"))
        .select(col("c.k").as("k"), col("n_rows"), col("n_nonnull"),
          col("n_nullsafe_pairs"))
    }),

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL — the multiset
    // complement of setop_retained_customers' distinct forms): per
    // (customer, priority) multiplicities of 1996 vs 1997 orders. Both
    // plan as a multiplicity-tagged aggregate + join, not a distinct —
    // duplicates carry through with min/difference counts.
    "setop_bag_priorities" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      def pri(yr: Int) = ord.filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"), col("o_orderpriority"))
      pri(1996).intersectAll(pri(1997)).withColumn("op", lit("both"))
        .unionByName(pri(1996).exceptAll(pri(1997))
          .withColumn("op", lit("only_1996")))
        .groupBy(col("op"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"))
    }),

    // Pivot: orders per priority pivoted into columns by year — Spark's
    // groupBy().pivot() with explicit values (single pass, no re-scan).
    "pivot_orders_by_priority" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnRenamed("1-URGENT", "urgent")
        .withColumnRenamed("2-HIGH", "high")
        .withColumnRenamed("3-MEDIUM", "medium")
        .withColumnRenamed("4-NOT SPECIFIED", "unspecified")
        .withColumnRenamed("5-LOW", "low")),

    // Top-k with total order: driver-side k rows only; executors do a
    // per-partition top-k (TakeOrderedAndProject) — no global sort.
    "topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("total_price"))
        .orderBy(col("total_price").desc, col("o_orderkey").asc)
        .limit(25)),

    // Analytic window: rank orders per customer by value; single shuffle
    // on o_custkey, per-partition sort only.
    "window_order_rank" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("rk", row_number().over(
          Window
            .partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("total_price"))),

    // Window frames: running total + 3-row moving average per customer —
    // same single hash exchange + per-partition sort as the ranking form.
    "window_running_sum" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(Long.MinValue, 0)).cast("decimal(38,2)").as("running_total"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .over(w.rowsBetween(-2, 0)).cast("decimal(20,2)").as("mov_sum3"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
    }),

    // Distribution window functions: ntile quartiles, percent_rank,
    // cume_dist per customer — same single hash exchange + partition
    // sort as the ranking window; the ratios are exact small rationals
    // (identical doubles in both engines), rounded for the oracle.
    "window_ntile" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).cast("decimal(10,6)").as("pct_rank"),
        round(cume_dist().over(w), 6).cast("decimal(10,6)").as("cume"))
    }),

    // Semi/anti join surface: parts that never shipped (left_anti) and
    // customers with at least one purchase-priority order (left_semi).
    "anti_parts_never_ordered" -> ((s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 48),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")),

    "semi_customers_with_urgent" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    // ROLLUP: hierarchical totals (region→nation) in one pass — Spark
    // expands grouping sets without re-scanning the input.
    "rollup_revenue" -> ((s, dir) => {
      val nation = t(s, dir, "nation"); val region = t(s, dir, "region")
      val cust = t(s, dir, "customer"); val ord = t(s, dir, "orders")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(decSum(col("o_totalprice")).as("total"),
          count(lit(1)).as("n_orders"))
    }),

    // CUBE: all 2^k grouping sets in one pass (rollup's superset — adds
    // the nation-only marginal). Spark expands grouping sets without
    // re-scanning the joined input.
    "cube_orders" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      t(s, dir, "orders")
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          decSum(col("o_totalprice")).as("total"))
    }),

    // As-of join (union + carry-forward window — no range-join blowup):
    // each purchase enriched with the latest click/view at or before it.
    "x_asof_enrich" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      val seen = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), col("ts_us"))        // unique per (key, ts)
        .agg(max(col("event_id")).as("last_seen_event"))
      AsOfJoin.asOf(purchases, seen, keys = Seq("user_id"),
        leftTs = "ts_us", rightTs = "ts_us",
        rightPayload = Seq("last_seen_event"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("last_seen_event"))
    }),

    // Forward as-of: each purchase enriched with the NEXT click/view at
    // or after it (lookahead enrichment — e.g. "what did the user do
    // right after buying"). Same single-exchange carry-forward plan as
    // the backward form, time reversed.
    "x_asof_forward" -> ((s, dir) => {
      import graft.operators.AsOfJoin
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      val seen = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("next_seen_event"))
      AsOfJoin.asOf(purchases, seen, keys = Seq("user_id"),
        leftTs = "ts_us", rightTs = "ts_us",
        rightPayload = Seq("next_seen_event"), forward = true)
        .select(col("event_id"), col("user_id"), col("value"),
          col("next_seen_event"))
    }),

    // Two-phase salted aggregation (hot-key mitigation): result must be
    // identical to a plain GROUP BY — pinned by the oracle.
    "x_salted_agg" -> ((s, dir) => {
      import graft.operators.SkewOps
      SkewOps.saltedAgg(
        Tables.events(s, dir),
        keys = Seq("event_type"),
        aggs = scala.collection.immutable.ListMap(
          "n_events" -> (lit(1), SkewOps.CountAgg),
          "sum_value" -> (col("value").cast("decimal(18,2)"), SkewOps.SumAgg),
          "max_ts_us" -> (col("ts_us"), SkewOps.MaxAgg)),
        saltBuckets = 16)
    }),

    // Salted skew JOIN (hot-key mitigation for the non-broadcastable-dim
    // case): events is maximally skewed on event_type (5 values); the
    // salted join must equal the plain join — pinned by the oracle.
    "x_salted_join" -> ((s, dir) => {
      import graft.operators.SkewOps
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("value"))
      val dim = ev.select(col("event_type")).distinct()
        .withColumn("type_len", length(col("event_type")))
      SkewOps.saltedJoin(ev, dim, keys = Seq("event_type"), saltBuckets = 8)
        .groupBy(col("type_len"))
        .agg(count(lit(1)).as("n_events"),
          decSum(col("value"))
            .as("sum_value"))
    }),

    // T5 extension: event-time tumbling-window aggregation (same plan
    // serves readStream with a watermark — see streaming.EventAnalytics).
    "t5_windowed_counts" -> ((s, dir) =>
      graft.streaming.EventAnalytics.windowedTypeCounts(
        Tables.events(s, dir)
          .withColumn("ts_ev", timestamp_micros(col("ts_us"))),
        tsCol = "ts_ev", windowLen = "1 hour")),

    // Grouped distinct + conditional agg over the event stream.
    "events_daily_rollup" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(timestamp_micros(col("ts_us"))).as("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("decimal(38,2)").as("purchase_value"))),

    // Spatial radius join via grid bucketing — the geohash/S2-cell scale
    // pattern: points land in radius-sized integer cells, each point
    // probes its 3×3 cell neighborhood (the Hamming-multi-probe shape:
    // probe side explodes ×9, corpus side keeps its exact cell, so the
    // candidate stage is ONE equi-join shuffle, never the
    // BroadcastNestedLoop a raw distance predicate plans), and only
    // candidates pay the exact distance check. A pair matches through
    // exactly one probe offset ((dx,dy) = the cell delta), so no dedup
    // pass is needed. All-integer: micro-degree coordinates from the
    // portable hash, squared distance in int64 — bit-exact cross-engine,
    // no trig. Cell size = radius guarantees recall 1.0 (any pair within
    // r is in adjacent cells). At 100 TB the cells are the shuffle key
    // and skewed dense cells are AQE's skew-join case.
    "x_spatial_grid_join" -> ((s, dir) => {
      import graft.functions.PortableHash
      val (span, r) = (GeoSpanMicroDeg, GeoRadiusMicroDeg)
      val key = col("c_custkey").cast("string")
      val pts = graft.GateCache.cache(t(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          (PortableHash.hash32w(key, "geo|", 0) % span).as("x"),
          (PortableHash.hash32w(key, "geo|", 1) % span).as("y"))
        .withColumn("cx", expr(s"x div $r"))
        .withColumn("cy", expr(s"y div $r")))
      val probes = pts.select(col("id").as("aid"), col("x").as("ax"),
          col("y").as("ay"), col("cx"), col("cy"))
        .select(col("aid"), col("ax"), col("ay"), col("cx"), col("cy"),
          explode(expr("flatten(transform(sequence(-1, 1), " +
            "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))"))
            .as("_o"))
        .select(col("aid"), col("ax"), col("ay"),
          (col("cx") + col("_o.dx")).as("pcx"),
          (col("cy") + col("_o.dy")).as("pcy"))
      val cand = probes.join(pts,
          col("pcx") === col("cx") && col("pcy") === col("cy") &&
            col("aid") < col("id"))
        .select(((col("ax") - col("x")) * (col("ax") - col("x")) +
          (col("ay") - col("y")) * (col("ay") - col("y"))).as("d2"))
      cand.agg(count(lit(1)).as("n_candidates"),
        sum(when(col("d2") <= r * r, 1L).otherwise(0L)).as("n_within"),
        sum(when(col("d2") <= r * r, col("d2")).otherwise(0L))
          .as("sum_dist2_within"))
    }),

    // Range (interval-overlap) join via banding: delivery windows derived
    // from lineitem (ship date + quantity-dependent transit days) against
    // calendar months derived from orders; count deliveries in flight per
    // month. The operator equi-joins on a 16-day band id instead of the
    // BroadcastNestedLoopJoin a raw non-equi join would plan — the oracle
    // states the plain inequality join, checking that banding (+ canonical
    // first-band dedup) changes the plan, not the semantics.
    "range_overlap_monthly" -> ((s, dir) => {
      val epoch = to_date(lit("1970-01-01"))
      val li = t(s, dir, "lineitem").select(
        datediff(to_date(col("l_shipdate")), epoch).as("l_s"),
        (datediff(to_date(col("l_shipdate")), epoch) +
          pmod(col("l_quantity").cast("long"), lit(14))).as("l_e"))
      val mo = t(s, dir, "orders")
        .select(date_trunc("month", col("o_orderdate")).cast("date").as("_ms"))
        .distinct()
        .select(col("_ms"), datediff(col("_ms"), epoch).as("r_s"),
          datediff(last_day(col("_ms")), epoch).as("r_e"))
      graft.operators.RangeJoin.bandedOverlap(
          li, "l_s", "l_e", mo, "r_s", "r_e", bandWidth = 16)
        .groupBy(date_format(col("_ms"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_deliveries"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1996-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q5_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,

    "q7_volume_by_year" ->
      """SELECT n_name, CAST(year(l_shipdate) AS INT) AS ship_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS volume
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        |GROUP BY n_name, year(l_shipdate)""".stripMargin,

    "q17_small_quantity_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN (SELECT l_partkey AS ap_partkey,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |        count(*) AS n_part_items
        |      FROM lineitem GROUP BY l_partkey) p
        |  ON l.l_partkey = p.ap_partkey
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 2 * n_part_items < sum_qty""".stripMargin,

    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-06-30'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_idle_customers" ->
      """WITH stats AS (SELECT
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s,
        |    count(*) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer, stats
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND year(o_orderdate) = 1997)
        |GROUP BY c_nationkey""".stripMargin,

    "q21_sole_late_supplier" ->
      """SELECT s_name, n_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name, n_name
        |ORDER BY numwait DESC, s_name ASC
        |LIMIT 25""".stripMargin,

    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey, day_no,
        |  count(*) OVER wr AS n_trailing_30d,
        |  CAST(sum(price) OVER wr AS DOUBLE) AS sum_trailing_30d,
        |  first_value(o_orderkey) OVER wf AS first_orderkey,
        |  last_value(o_orderkey) OVER wf AS last_orderkey,
        |  nth_value(o_orderkey, 2) OVER wf AS second_orderkey
        |FROM (SELECT o_custkey, o_orderkey,
        |        CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS INT)
        |          AS day_no,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |      FROM orders)
        |WINDOW
        |  wr AS (PARTITION BY o_custkey ORDER BY day_no ASC
        |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW),
        |  wf AS (PARTITION BY o_custkey ORDER BY day_no ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "sql_interface" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM (SELECT l_orderkey,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300) b
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "json_props_buckets" ->
      """SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10 AS INT)
        |    AS k_bucket,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    "date_shipping_delay" ->
      """SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    CAST(l_shipdate AS DATE)) AS INT) AS delay_days,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "setop_retained_customers" ->
      """SELECT o_custkey, 'retained' AS status FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |UNION ALL
        |SELECT o_custkey, 'churned' FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997)""".stripMargin,

    "x_null_semantics" ->
      """WITH a AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE o_orderpriority END AS k
        |  FROM orders WHERE o_orderkey % 29 = 0),
        |c AS (SELECT k, count(*) AS n_rows, count(k) AS n_nonnull
        |  FROM a GROUP BY k),
        |p AS (SELECT x.k, count(*) AS n_nullsafe_pairs
        |  FROM a x JOIN a y ON x.k IS NOT DISTINCT FROM y.k
        |  GROUP BY x.k)
        |SELECT c.k AS k, n_rows, n_nonnull, n_nullsafe_pairs
        |FROM c JOIN p ON c.k IS NOT DISTINCT FROM p.k""".stripMargin,

    "setop_bag_priorities" ->
      """SELECT op, o_orderpriority, count(*) AS n_rows FROM (
        |  SELECT 'both' AS op, o_custkey, o_orderpriority FROM (
        |    SELECT o_custkey, o_orderpriority FROM orders
        |    WHERE year(o_orderdate) = 1996
        |    INTERSECT ALL
        |    SELECT o_custkey, o_orderpriority FROM orders
        |    WHERE year(o_orderdate) = 1997)
        |  UNION ALL
        |  SELECT 'only_1996' AS op, o_custkey, o_orderpriority FROM (
        |    SELECT o_custkey, o_orderpriority FROM orders
        |    WHERE year(o_orderdate) = 1996
        |    EXCEPT ALL
        |    SELECT o_custkey, o_orderpriority FROM orders
        |    WHERE year(o_orderdate) = 1997))
        |GROUP BY 1, 2""".stripMargin,

    "pivot_orders_by_priority" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |  count(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
        |  count(*) FILTER (o_orderpriority = '2-HIGH') AS high,
        |  count(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
        |  count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
        |  count(*) FILTER (o_orderpriority = '5-LOW') AS low
        |FROM orders GROUP BY 1""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM orders ORDER BY total_price DESC, o_orderkey ASC LIMIT 25""".stripMargin,

    "window_order_rank" ->
      """SELECT o_custkey, rk, o_orderkey, total_price FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,

    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate ASC, o_orderkey ASC
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS mov_sum3,
        |  lag(o_orderkey, 1) OVER w AS prev_orderkey
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "window_ntile" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  CAST(CAST(round(percent_rank() OVER w, 6) AS DECIMAL(10,6))
        |    AS DOUBLE) AS pct_rank,
        |  CAST(CAST(round(cume_dist() OVER w, 6) AS DECIMAL(10,6))
        |    AS DOUBLE) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,

    "anti_parts_never_ordered" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity > 48)""".stripMargin,

    "semi_customers_with_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""".stripMargin,

    "rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "cube_orders" ->
      """SELECT n_name, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, o_orderpriority)""".stripMargin,

    "x_asof_enrich" ->
      """SELECT p.event_id, p.user_id, p.value, r.last_seen_event
        |FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS last_seen_event
        |  FROM events WHERE event_type IN ('click','view')
        |  GROUP BY 1, 2) r
        |ON p.user_id = r.user_id AND p.ts_us >= r.ts_us""".stripMargin,

    "x_asof_forward" ->
      """SELECT p.event_id, p.user_id, p.value, r.next_seen_event
        |FROM (SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
        |      FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS next_seen_event
        |  FROM events WHERE event_type IN ('click','view')
        |  GROUP BY 1, 2) r
        |ON p.user_id = r.user_id AND p.ts_us <= r.ts_us""".stripMargin,

    "x_salted_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  max(epoch_us(ts)) AS max_ts_us
        |FROM events GROUP BY event_type""".stripMargin,

    "x_salted_join" ->
      """WITH dim AS (SELECT DISTINCT event_type,
        |    CAST(length(event_type) AS INT) AS type_len FROM events)
        |SELECT type_len, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events JOIN dim USING (event_type)
        |GROUP BY type_len""".stripMargin,

    "t5_windowed_counts" ->
      """SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "events_daily_rollup" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(CASE WHEN event_type='purchase'
        |      THEN CAST(value AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
        |FROM events GROUP BY 1""".stripMargin,

    "range_overlap_monthly" ->
      """WITH li AS (SELECT
        |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS ls,
        |    (CAST(l_shipdate AS DATE) - DATE '1970-01-01')
        |      -- trunc like Spark's long-cast (DuckDB CAST rounds); the
        |      -- value is positive so % matches pmod (review find)
        |      + (CAST(trunc(l_quantity) AS BIGINT) % 14) AS le
        |  FROM lineitem),
        |mo AS (SELECT DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)) AS ms
        |       FROM orders),
        |mw AS (SELECT ms, (ms - DATE '1970-01-01') AS rs,
        |         (last_day(ms) - DATE '1970-01-01') AS re
        |       FROM mo)
        |SELECT strftime(ms, '%Y-%m') AS month, count(*) AS n_deliveries
        |FROM li JOIN mw ON li.ls <= mw.re AND mw.rs <= li.le
        |GROUP BY 1""".stripMargin,

    // Same grid arithmetic: hash coords, radius-sized cells, the 3×3
    // probe cross, exact int64 distance check on candidates only.
    "x_spatial_grid_join" -> {
      import graft.functions.PortableHash
      val h0 = PortableHash.duckSqlW("CAST(c_custkey AS VARCHAR)", "geo|", 0)
      val h1 = PortableHash.duckSqlW("CAST(c_custkey AS VARCHAR)", "geo|", 1)
      val (span, r) = (GeoSpanMicroDeg, GeoRadiusMicroDeg)
      s"""WITH pts AS MATERIALIZED (SELECT c_custkey AS id,
         |    ($h0 % $span) AS x, ($h1 % $span) AS y
         |  FROM customer),
         |cells AS MATERIALIZED (SELECT id, x, y,
         |    x // $r AS cx, y // $r AS cy FROM pts),
         |probes AS (SELECT id, x, y, cx + dx AS pcx, cy + dy AS pcy
         |  FROM cells,
         |    (SELECT unnest(range(-1, 2)) AS dx),
         |    (SELECT unnest(range(-1, 2)) AS dy)),
         |cand AS (SELECT
         |    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
         |  FROM probes a JOIN cells b
         |    ON a.pcx = b.cx AND a.pcy = b.cy AND a.id < b.id)
         |SELECT count(*) AS n_candidates,
         |  CAST(sum(CASE WHEN d2 <= ${r * r} THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_within,
         |  CAST(sum(CASE WHEN d2 <= ${r * r} THEN d2 ELSE 0 END) AS BIGINT)
         |    AS sum_dist2_within
         |FROM cand""".stripMargin
    }
  )
}
