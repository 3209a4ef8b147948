package graft.queries

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Modern Spark-4 SQL-surface operators: VARIANT semi-structured
  * shredding, native batch session windows, correlated LATERAL
  * subqueries, null-aware NOT IN semantics, case-insensitive collation,
  * and zero-extra-pass observed metrics.
  *
  * Each gate exercises an engine capability the rest of the surface
  * doesn't: these are the features a user migrating a warehouse workload
  * (the reference's sync target is exactly such a warehouse —
  * /root/reference/src/schema_converter.py maps MySQL JSON columns to
  * String today) would reach for next. All gates are exactly
  * DuckDB-oracled; the oracles recompute the same answers from the raw
  * relational columns, so the JSON/VARIANT/collation roundtrips must be
  * semantics-preserving, not merely self-consistent.
  */
object SqlSurface {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Session gap for [[queries]] `x_session_windows_batch` (µs and SQL
    * literal must agree). Median per-user inter-event gap in the harness
    * events table is ~7.3 h with a 2.26 h minimum, so 6 h produces a
    * discriminative mix of merged multi-event sessions and singletons. */
  val SessionGapUs = 6L * 3600 * 1000000
  val SessionGap = "6 hours"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // VARIANT shredding (Spark 4 semi-structured type): each order is
    // wrapped into a nested JSON envelope (customer object + sorted
    // item-quantity array + item count), parsed to VARIANT once, and the
    // analysis runs entirely over typed `variant_get` paths — object
    // fields, an array index, and an int count. The oracle recomputes
    // the same aggregate from the raw relational columns with NO JSON in
    // the loop, so the envelope → VARIANT → typed-path roundtrip must
    // preserve semantics exactly. Scale shape: one lineitem shuffle to
    // build per-order arrays, broadcast customer, then a tiny
    // per-segment aggregate; the VARIANT path extraction is
    // expression-only and rides the scan.
    "x_variant_shred" -> ((s, dir) => {
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("qty"))).as("items"),
          count(lit(1)).as("n_items"))
      val env = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .select(to_json(struct(
          col("o_orderkey").as("id"),
          struct(col("c_name").as("name"),
            col("c_mktsegment").as("seg")).as("cust"),
          col("n_items"), col("items"))).as("doc"))
      env
        .select(parse_json(col("doc")).as("v"))
        .select(
          expr("variant_get(v, '$.cust.seg', 'string')").as("segment"),
          expr("variant_get(v, '$.cust.name', 'string')").as("_cn"),
          expr("variant_get(v, '$.items[0]', 'long')").as("_q0"),
          expr("variant_get(v, '$.n_items', 'long')").as("_ni"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("_cn")).as("n_customers"),
          sum(col("_q0")).as("sum_min_qty"),
          sum(col("_ni")).as("sum_items"))
    }),

    // Native batch session windows: `session_window(ts, gap)` merges a
    // user's events whose inter-event gap is < 6 h — the same dynamic
    // (non-aligned) windows the t5_sessionized streaming gate builds,
    // here planned as ONE aggregate with a session-merging buffer (no
    // self-join, no gaps-and-islands window cascade on the Spark side).
    // The oracle derives identical sessions the classical relational way
    // (lag → break flag → running island id), pinning Spark's merge
    // semantics: windows [t, t+gap] merge when they overlap OR touch —
    // an inter-event gap of exactly 6 h still merges; only strictly
    // greater starts a new session (pinned on crafted boundary data in
    // SqlSurfaceSpec). Partitioned by user — parallel and
    // shuffle-minimal at any scale.
    "x_session_windows_batch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("ts_ev", timestamp_micros(col("ts_us")))
      ev.groupBy(col("user_id"), session_window(col("ts_ev"), SessionGap))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)")
            .as("total_value"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("sess_start_us"),
          col("n_events"), col("total_value"))
    }),

    // Correlated LATERAL subquery with ORDER BY + LIMIT: top-2 customers
    // by balance per nation, written as the per-row subquery a SQL user
    // writes — and decorrelated by Catalyst into a window-ranked join
    // (ONE customer shuffle), not N per-nation executions. The oracle
    // runs the very same LATERAL SQL in DuckDB. Ties broken by c_name
    // for cross-engine determinism.
    "x_lateral_topn" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("lat_nation")
      t(s, dir, "customer").createOrReplaceTempView("lat_customer")
      s.sql(
        """SELECT n.n_name, t.c_name,
          |  CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
          |FROM lat_nation n,
          |LATERAL (SELECT c_name, c_acctbal FROM lat_customer c
          |         WHERE c.c_nationkey = n.n_nationkey
          |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
    }),

    // Null-aware NOT IN semantics, pinned three ways in one frame: the
    // clean NOT IN (null-free subquery — planned as a null-aware anti
    // join, equal to NOT EXISTS), the same subquery with ONE injected
    // NULL (ANSI three-valued logic: the result is provably EMPTY — the
    // classic silent-wrong-answer trap when migrating from engines that
    // treat NOT IN as anti-join), and the NOT EXISTS control. The
    // documents table of every SQL engine warns about this; the gate
    // makes both engines agree on all three counts.
    "x_not_in_semantics" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("nis_part")
      t(s, dir, "lineitem").createOrReplaceTempView("nis_lineitem")
      s.sql(
        """SELECT 'not_in_clean' AS variant, count(*) AS n FROM nis_part
          |  WHERE p_partkey NOT IN (SELECT l_partkey FROM nis_lineitem
          |    WHERE l_quantity > 40)
          |UNION ALL
          |SELECT 'not_in_with_null', count(*) FROM nis_part
          |  WHERE p_partkey NOT IN (SELECT l_partkey FROM nis_lineitem
          |    WHERE l_quantity > 40 UNION ALL SELECT CAST(NULL AS BIGINT))
          |UNION ALL
          |SELECT 'not_exists', count(*) FROM nis_part p
          |  WHERE NOT EXISTS (SELECT 1 FROM nis_lineitem l
          |    WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 40)""".stripMargin)
    }),

    // Case-insensitive collation (Spark 4 COLLATE): market segments are
    // deterministically case-mangled (even keys lowercased), then
    // re-unified by grouping on the UTF8_LCASE-collated value — the
    // engine's collation machinery does the case folding inside the hash
    // aggregate, no normalizing rewrite of the data. The displayed key is
    // lower()ed explicitly (a collated group's representative casing is
    // otherwise first-seen nondeterministic). Oracle: GROUP BY
    // lower(seg). One partial-agg'd shuffle.
    "x_collated_group" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("seg_m",
          when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
            .otherwise(col("c_mktsegment")))
      c.groupBy(expr("collate(seg_m, 'UTF8_LCASE')").as("_k"))
        .agg(max(lower(col("seg_m"))).as("segment"),
          count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("decimal(38,2)")
            .as("total_bal"))
        .select(col("segment"), col("n_customers"), col("total_bal"))
    }),

    // SQL-defined functions (Spark 4 CREATE FUNCTION … RETURN): the
    // pricing helpers every TPC-H query repeats, named once in the
    // catalog and reused — including one SQL UDF calling another. Unlike
    // a JVM/Python UDF, the body is INLINED into the plan at analysis
    // time, so codegen, pushdown and null-propagation all still apply
    // (SqlSurfaceSpec pins a ScalaUDF/BatchEvalPython-free physical
    // plan); at 100 TB that is the difference between an expression and
    // a per-row black-box call. Products of ≤2-decimal inputs are exact
    // at 6 decimals, so the DECIMAL(22,6) partial-sum pattern carries
    // over unchanged from q1.
    "x_sql_udf" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("udf_lineitem")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE,
              |d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)""".stripMargin)
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION charged(p DOUBLE,
              |d DOUBLE, t DOUBLE) RETURNS DOUBLE
              |RETURN disc_price(p, d) * (1 + t)""".stripMargin)
      s.sql(
        """SELECT l_returnflag,
          |  CAST(sum(CAST(disc_price(l_extendedprice, l_discount)
          |    AS DECIMAL(22,6))) AS DOUBLE) AS disc_revenue,
          |  CAST(sum(CAST(charged(l_extendedprice, l_discount, l_tax)
          |    AS DECIMAL(22,6))) AS DOUBLE) AS charged_revenue,
          |  count(*) AS n
          |FROM udf_lineitem GROUP BY l_returnflag""".stripMargin)
    }),

    // SQL pipe syntax (Spark 4 `|>`): the linear query form — each
    // operator consumes the previous result, in reading order. Pure
    // parser surface: the pipe form optimizes to the IDENTICAL plan as
    // the classic SQL (SqlSurfaceSpec pins optimized-plan equality), so
    // it costs nothing at any scale; the oracle is the classic form.
    "x_pipe_syntax" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("pipe_orders")
      s.sql(
        """FROM pipe_orders
          ||> WHERE o_orderstatus = 'F'
          ||> AGGREGATE count(*) AS n_orders,
          |     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
          |       AS DECIMAL(38,2)) AS total
          |   GROUP BY o_orderpriority
          ||> SELECT o_orderpriority, n_orders, total""".stripMargin)
    }),

    // SQL scripting (Spark 4 BEGIN…END): the procedural shape a
    // warehouse migration brings along — a script-local variable is
    // computed by one statement (the exact-decimal mean balance) and
    // parameterizes the next, with the table name resolved through
    // IDENTIFIER() from a session variable (the injection-safe dynamic
    // SQL path — SqlSurfaceSpec pins that a malicious "name" is rejected
    // at parse, never executed, and that EXECUTE IMMEDIATE … USING
    // binds parameters equivalently). Each statement is still a full
    // Catalyst-planned query — scripting is control flow, not a row
    // engine, so it costs nothing at scale.
    "x_sql_scripting" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("scr_customer")
      s.sql("DECLARE OR REPLACE VARIABLE scr_tab STRING DEFAULT 'scr_customer'")
      s.sql(
        """BEGIN
          |  DECLARE cutoff DOUBLE DEFAULT 0;
          |  SET cutoff = (SELECT
          |      CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
          |        AS DECIMAL(38,2)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
          |    FROM IDENTIFIER(scr_tab));
          |  SELECT c_mktsegment, count(*) AS n_above,
          |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
          |      AS DECIMAL(38,2)) AS bal_above
          |  FROM IDENTIFIER(scr_tab)
          |  WHERE c_acctbal > cutoff GROUP BY c_mktsegment;
          |END""".stripMargin)
    }),

    // Observed metrics (`Dataset.observe`): pipeline QA counters —
    // row count, purchase count, max value at the scan, and the row
    // count again after a filter stage — accumulated DURING the single
    // pass of the job (Spark's observation machinery aggregates them on
    // the executors as rows flow), not by re-running the pipeline per
    // metric. At 100 TB this is the difference between free telemetry
    // and doubling the read. The job lands in a noop sink; the gate
    // returns the observed values, which the oracle recomputes
    // relationally.
    "x_observe_metrics" -> ((s, dir) => {
      val pre = Observation()
      val post = Observation()
      val ev = Tables.events(s, dir)
        .observe(pre,
          count(lit(1)).as("n_rows"),
          count(when(col("event_type") === "purchase", lit(1))).as("n_purchase"),
          max(col("value")).as("max_value"))
        .filter(col("event_type") =!= "view")
        .observe(post, count(lit(1)).as("n_after_filter"))
      ev.write.format("noop").mode("overwrite").save()
      val (m1, m2) = (pre.get, post.get)
      import s.implicits._
      Seq((m1("n_rows").asInstanceOf[Long],
        m1("n_purchase").asInstanceOf[Long],
        m1("max_value").asInstanceOf[Double],
        m2("n_after_filter").asInstanceOf[Long]))
        .toDF("n_rows", "n_purchase", "max_value", "n_after_filter")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): hierarchy traversal, the
    // one query shape plain joins cannot express at unknown depth. The
    // contiguous customer keys (0-based in the harness data — shifted +1
    // to heap node ids so the walk is TOTAL) form an implicit binary-heap
    // org chart (parent of k = ⌊k/2⌋, root = 1), and the recursion walks
    // it to its data-dependent depth (⌊log2 N⌋ — 13 levels at sf0.1),
    // emitting per-depth node counts and node sums. Execution is Spark's
    // UnionLoop: each step equi-joins the previous FRONTIER (one level,
    // not the accumulated result) against the table — at 100 TB that is
    // O(depth) hash joins with partial aggregation, not a quadratic
    // self-join cascade, and the loop stops the first time a frontier
    // comes back empty. Identical SQL runs in DuckDB (floor-division
    // spelled portably); depth reaching every row and the closed-form
    // heap-shape law are pinned in SqlSurfaceSpec.
    "x_recursive_cte" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("rc_customer")
      s.sql(
        """WITH RECURSIVE tree AS (
          |  SELECT c_custkey + 1 AS node, 0 AS depth
          |  FROM rc_customer WHERE c_custkey + 1 = 1
          |  UNION ALL
          |  SELECT c.c_custkey + 1, t.depth + 1
          |  FROM rc_customer c JOIN tree t
          |    ON CAST(floor((c.c_custkey + 1) / 2.0) AS BIGINT) = t.node
          |)
          |SELECT depth, count(*) AS n_nodes, sum(node) AS key_sum
          |FROM tree GROUP BY depth""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(

    // no JSON anywhere: the same per-order (min qty, item count) pairs
    // straight from lineitem, segment/name from the joins
    "x_variant_shred" ->
      """WITH it AS (SELECT l_orderkey, min(CAST(l_quantity AS BIGINT)) AS q0,
        |    count(*) AS ni FROM lineitem GROUP BY l_orderkey)
        |SELECT c_mktsegment AS segment, count(*) AS n_orders,
        |  count(DISTINCT c_name) AS n_customers,
        |  CAST(sum(q0) AS BIGINT) AS sum_min_qty,
        |  CAST(sum(ni) AS BIGINT) AS sum_items
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN it ON o_orderkey = l_orderkey
        |GROUP BY c_mktsegment""".stripMargin,

    // gaps-and-islands derivation of the same sessions: break only at
    // gap > 6h (Spark's session windows merge when touching exactly)
    "x_session_windows_batch" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        |m AS (SELECT user_id, us, value,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > $SessionGapUs
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |g AS (SELECT user_id, us, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(us) AS sess_start_us, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid""".stripMargin,

    // the identical LATERAL SQL, run by DuckDB
    "x_lateral_topn" ->
      """SELECT n.n_name, t.c_name,
        |  CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin,

    "x_not_in_semantics" ->
      """SELECT 'not_in_clean' AS variant, count(*) AS n FROM part
        |  WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |    WHERE l_quantity > 40)
        |UNION ALL
        |SELECT 'not_in_with_null', count(*) FROM part
        |  WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |    WHERE l_quantity > 40 UNION ALL SELECT CAST(NULL AS BIGINT))
        |UNION ALL
        |SELECT 'not_exists', count(*) FROM part p
        |  WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 40)""".stripMargin,

    "x_collated_group" ->
      """SELECT lower(c_mktsegment) AS segment, count(*) AS n_customers,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))
        |    AS DOUBLE) AS total_bal
        |FROM customer GROUP BY lower(c_mktsegment)""".stripMargin,

    // the UDF bodies inlined — proving the named functions compute the
    // plain expressions
    "x_sql_udf" ->
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(22,6))) AS DOUBLE) AS disc_revenue,
        |  CAST(sum(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax)
        |    AS DECIMAL(22,6))) AS DOUBLE) AS charged_revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // the classic form of the pipe query
    "x_pipe_syntax" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin,

    // the script's two statements collapsed into one subquery — the
    // variable plumbing must be semantics-free
    "x_sql_scripting" ->
      """SELECT c_mktsegment, count(*) AS n_above,
        |  CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS DOUBLE) AS bal_above
        |FROM customer
        |WHERE c_acctbal > (SELECT
        |    CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |      AS DECIMAL(38,2)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM customer)
        |GROUP BY c_mktsegment""".stripMargin,

    "x_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  max(value) AS max_value,
        |  count(CASE WHEN event_type <> 'view' THEN 1 END) AS n_after_filter
        |FROM events""".stripMargin,

    // the very same recursion, run by DuckDB
    "x_recursive_cte" ->
      """WITH RECURSIVE tree AS (
        |  SELECT c_custkey + 1 AS node, 0 AS depth
        |  FROM customer WHERE c_custkey + 1 = 1
        |  UNION ALL
        |  SELECT c.c_custkey + 1, t.depth + 1
        |  FROM customer c JOIN tree t
        |    ON CAST(floor((c.c_custkey + 1) / 2.0) AS BIGINT) = t.node
        |)
        |SELECT depth, count(*) AS n_nodes,
        |  CAST(sum(node) AS BIGINT) AS key_sum
        |FROM tree GROUP BY depth""".stripMargin)
}
