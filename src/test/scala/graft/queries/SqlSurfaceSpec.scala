package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics pins for the modern-SQL-surface gates (queries/SqlSurface):
  * VARIANT shredding, batch session windows, LATERAL decorrelation,
  * null-aware NOT IN, collation, and observed metrics. Cross-engine
  * exactness is the DuckDB oracle's job; these pin the Spark-side
  * semantics and plans against independent in-engine derivations. */
class SqlSurfaceSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("x_variant_shred equals the JSON-free relational recompute; missing variant paths are null") {
    val dir = TestSpark.Sf0001
    val gate = SqlSurface.queries("x_variant_shred")(spark, dir)
      .select(col("segment"), col("n_orders"), col("n_customers"),
        col("sum_min_qty"), col("sum_items"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val it = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(col("l_quantity").cast("long")).as("q0"),
        count(lit(1)).as("ni"))
    val direct = Tables.read(spark, dir, "orders")
      .join(Tables.read(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(it, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_name")).as("n_customers"),
        sum(col("q0")).as("sum_min_qty"), sum(col("ni")).as("sum_items"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gate == direct)
    assert(gate.nonEmpty)
    // typed extraction of an absent path is null, not an error (the
    // schema-drift tolerance that makes VARIANT ingestion safe)
    val miss = spark.sql(
      "SELECT variant_get(parse_json('{\"a\":1}'), '$.missing', 'long') AS m")
      .as[Option[Long]].head()
    assert(miss.isEmpty)
  }

  test("x_session_windows_batch: an exactly-gap spacing still MERGES; only strictly greater breaks") {
    // crafted micro-frame around the 6h boundary — pins the semantics the
    // DuckDB oracle assumes (sessions merge when windows overlap OR
    // touch; break only at gap > 6h). Discovered on this data: Spark's
    // [t, t+gap] windows are adjacency-merging, NOT half-open.
    val gap = SqlSurface.SessionGapUs
    val ev = Seq(
      (1L, 0L, 1.0),              // session A
      (1L, gap - 1, 1.0),         // gap-1 after → merges into A
      (1L, 2 * gap - 1, 1.0),     // exactly `gap` after #2 → STILL merges
      (1L, 3 * gap, 1.0),         // gap+1 after #3 → breaks
      (2L, 0L, 1.0),
      (2L, gap, 1.0))             // exactly `gap` later → merges
      .toDF("user_id", "ts_us", "value")
      .withColumn("ts_ev", timestamp_micros(col("ts_us")))
    val sess = ev.groupBy(col("user_id"),
        session_window(col("ts_ev"), SqlSurface.SessionGap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"), col("n"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sess == Seq((1L, 0L, 3L), (1L, 3 * gap, 1L), (2L, 0L, 2L)))
  }

  test("x_session_windows_batch equals the in-engine gaps-and-islands derivation on real data") {
    val dir = TestSpark.Sf0001
    val gate = SqlSurface.queries("x_session_windows_batch")(spark, dir)
      .select(col("user_id"), col("sess_start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    Tables.events(spark, dir).createOrReplaceTempView("ssw_ev")
    val islands = spark.sql(
      s"""WITH m AS (SELECT user_id, ts_us,
         |    CASE WHEN lag(ts_us) OVER w IS NULL
         |           OR ts_us - lag(ts_us) OVER w > ${SqlSurface.SessionGapUs}
         |         THEN 1 ELSE 0 END AS brk
         |  FROM ssw_ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
         |g AS (SELECT user_id, ts_us,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
         |      ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         |SELECT user_id, min(ts_us) AS s, count(*) AS n
         |FROM g GROUP BY user_id, sid""".stripMargin)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(gate == islands)
    assert(gate.exists(_._3 > 1), "no multi-event session — gap too small to discriminate")
    assert(gate.size > islands.map(_._1).distinct.size,
      "every user collapsed to one session — gap too large to discriminate")
  }

  test("x_lateral_topn: decorrelated to a window rank (no nested-loop), at most 2 rows per nation, equals window recompute") {
    val dir = TestSpark.Sf0001
    val df = SqlSurface.queries("x_lateral_topn")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "LATERAL LIMIT must decorrelate via a window rank")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "decorrelation must not fall back to a nested-loop join")
    val rows = df.select(col("n_name"), col("c_name"), col("acctbal"))
      .as[(String, String, Double)].collect().toSeq
    assert(rows.groupBy(_._1).forall(_._2.size <= 2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name").asc)
    val direct = Tables.read(spark, dir, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables.read(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"),
        col("c_acctbal").cast("decimal(18,2)").cast("double"))
      .as[(String, String, Double)].collect().toSeq
    assert(rows.sorted == direct.sorted)
  }

  test("x_not_in_semantics: one NULL in the subquery empties NOT IN; the clean form is the anti join") {
    val dir = TestSpark.Sf0001
    val m = SqlSurface.queries("x_not_in_semantics")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(m("not_in_with_null") == 0L,
      "ANSI three-valued logic: NOT IN over a subquery containing NULL is empty")
    assert(m("not_in_clean") == m("not_exists"))
    assert(m("not_in_clean") > 0, "no never-ordered part — degenerate corpus")
    // the clean variant plans as a (null-aware) broadcast anti join, not
    // a nested loop over the subquery
    Tables.read(spark, dir, "part").createOrReplaceTempView("nis_part")
    Tables.read(spark, dir, "lineitem").createOrReplaceTempView("nis_lineitem")
    val plan = spark.sql(
      """SELECT count(*) FROM nis_part WHERE p_partkey NOT IN
        |  (SELECT l_partkey FROM nis_lineitem)""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected an anti join, got:\n$plan")
  }

  test("x_collated_group: UTF8_LCASE unifies the case-mangled segments back to the true groups") {
    val dir = TestSpark.Sf0001
    val gate = SqlSurface.queries("x_collated_group")(spark, dir)
      .select(col("segment"), col("n_customers"))
      .as[(String, Long)].collect().toMap
    val c = Tables.read(spark, dir, "customer")
    // the mangling genuinely creates more binary-distinct strings than
    // true segments — otherwise the collation has nothing to prove
    val mangled = c.withColumn("seg_m",
        when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
          .otherwise(col("c_mktsegment")))
    assert(mangled.select(col("seg_m")).distinct().count() >
      c.select(col("c_mktsegment")).distinct().count())
    val direct = c.groupBy(lower(col("c_mktsegment")).as("segment"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(gate == direct)
  }

  test("x_sql_udf: the SQL-defined functions inline — no black-box UDF node, codegen intact") {
    val dir = TestSpark.Sf0001
    val df = SqlSurface.queries("x_sql_udf")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "SQL UDFs must inline into expressions, not call out per row")
    // the function BODY shows up as a plain arithmetic expression inside
    // the aggregate (AQE's pre-execution plan string omits the codegen
    // stage markers, so pin the inlining itself)
    assert(plan.contains("* (1.0 - "),
      s"expected the inlined p * (1 - d) body in the plan:\n$plan")
    // and they compute the plain expressions (one-UDF-calls-another too)
    val direct = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(22,6)")).cast("double").as("disc_revenue"),
        sum(((col("l_extendedprice") * (lit(1) - col("l_discount"))) *
          (lit(1) + col("l_tax"))).cast("decimal(22,6)"))
          .cast("double").as("charged_revenue"),
        count(lit(1)).as("n"))
      .as[(String, Double, Double, Long)].collect().sortBy(_._1).toSeq
    val gate = df.as[(String, Double, Double, Long)]
      .collect().sortBy(_._1).toSeq
    assert(gate == direct)
  }

  test("x_pipe_syntax: the pipe form optimizes to the identical plan as classic SQL") {
    val dir = TestSpark.Sf0001
    val pipe = SqlSurface.queries("x_pipe_syntax")(spark, dir)
    val classic = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS total
        |FROM pipe_orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority""".stripMargin)
    // compare the optimized plans canonically — pipe syntax must be
    // parser sugar with zero plan cost
    assert(pipe.queryExecution.optimizedPlan.canonicalized.toString ==
      classic.queryExecution.optimizedPlan.canonicalized.toString)
    assert(pipe.count() > 0)
  }

  test("x_sql_scripting: EXECUTE IMMEDIATE binds parameters equivalently; IDENTIFIER rejects injection at parse") {
    val dir = TestSpark.Sf0001
    Tables.read(spark, dir, "customer").createOrReplaceTempView("scr_customer")
    // parameterized dynamic SQL ≡ the literal query
    val bound = spark.sql(
      """EXECUTE IMMEDIATE
        |'SELECT count(*) AS n FROM scr_customer WHERE c_mktsegment = ?'
        |USING 'AUTOMOBILE'""".stripMargin).as[Long].head()
    val direct = spark.sql(
      "SELECT count(*) FROM scr_customer WHERE c_mktsegment = 'AUTOMOBILE'")
      .as[Long].head()
    assert(bound == direct && bound > 0)
    // a malicious "table name" through IDENTIFIER is a parse/analysis
    // error, never an executed statement — the injection-safe contract
    spark.sql("DECLARE OR REPLACE VARIABLE scr_evil STRING")
    spark.sql("SET VAR scr_evil = 'scr_customer; DROP VIEW scr_customer'")
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count(*) FROM IDENTIFIER(scr_evil)").collect()
    }
    assert(spark.catalog.tableExists("scr_customer"),
      "the view must survive the rejected injection attempt")
    // and the gate's script equals its collapsed single-query form
    val gate = SqlSurface.queries("x_sql_scripting")(spark, dir)
      .select(col("c_mktsegment"), col("n_above"))
      .as[(String, Long)].collect().toMap
    val collapsed = spark.sql(
      """SELECT c_mktsegment, count(*) AS n FROM scr_customer
        |WHERE c_acctbal > (SELECT
        |    CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)))
        |      AS DECIMAL(38,2)) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |  FROM scr_customer)
        |GROUP BY c_mktsegment""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(gate == collapsed)
  }

  test("x_observe_metrics equals the direct aggregates (metrics ride the single pass)") {
    val dir = TestSpark.Sf0001
    val row = SqlSurface.queries("x_observe_metrics")(spark, dir)
      .as[(Long, Long, Double, Long)].head()
    val ev = Tables.events(spark, dir)
    val direct = ev.agg(
      count(lit(1)), count(when(col("event_type") === "purchase", lit(1))),
      max(col("value")),
      count(when(col("event_type") =!= "view", lit(1))))
      .as[(Long, Long, Double, Long)].head()
    assert(row == direct)
    assert(row._4 < row._1, "filter stage removed nothing — observation points indistinct")
  }

  test("x_recursive_cte: the recursion reaches every customer and matches the closed-form heap shape") {
    val dir = TestSpark.Sf0001
    val got = SqlSurface.queries("x_recursive_cte")(spark, dir)
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    val n = Tables.read(spark, dir, "customer").count()
    // the shifted node ids 1..N under parent(k)=⌊k/2⌋ form a complete
    // binary heap: depth d holds exactly the nodes in
    // [2^d, min(2^{d+1}-1, N)] — closed-form counts and node sums, no
    // recursion in the reference
    val expect = Iterator.from(0)
      .map { d =>
        val lo = 1L << d
        val hi = math.min((1L << (d + 1)) - 1, n)
        (d, lo, hi)
      }
      .takeWhile { case (_, lo, _) => lo <= n }
      .map { case (d, lo, hi) =>
        (d, hi - lo + 1, (lo + hi) * (hi - lo + 1) / 2)
      }
      .toSeq
    assert(got == expect)
    assert(got.map(_._2).sum == n, "recursion must visit every key exactly once")
  }
}
