package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.{PipelineOps, Tables}

/** Pins the static-stats planning path: ANALYZE TABLE populates catalog
  * rowCount + column distinctCount, the optimizer sees them on the plan,
  * and the stats-informed join broadcasts its small filtered side with no
  * hint anywhere in the code. */
class CboStatsSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("x_cbo_stats_join: cataloged stats on the plan; hint-free broadcast") {
    // keepTables: the GATE drops its managed tables on exit (catalog
    // hygiene); this spec needs them alive to inspect the cataloged
    // stats, and drops them itself at the end
    val got = PipelineOps.cboStatsJoin(spark, TestSpark.Sf0001,
        keepTables = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    try {

    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("graft_cbo_customer"))
    val stats = meta.stats.getOrElse(fail("no catalog stats after ANALYZE"))
    val nCust = Tables.read(spark, TestSpark.Sf0001, "customer").count()
    assert(stats.rowCount.contains(BigInt(nCust)), s"rowCount ${stats.rowCount}")
    val custKeyStats = stats.colStats.getOrElse("c_custkey",
      fail(s"no c_custkey column stats in ${stats.colStats.keySet}"))
    assert(custKeyStats.distinctCount.exists(_ > 0))

    // with CBO on, the optimized plan carries the cataloged rowCount and
    // the filtered dimension broadcasts without any hint in the query
    val cboKey = "spark.sql.cbo.enabled"
    val prev = spark.conf.get(cboKey)
    spark.conf.set(cboKey, "true")
    try {
      val q = spark.table("graft_cbo_orders")
        .join(spark.table("graft_cbo_customer")
            .filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val planStats = q.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.rowCount)
      assert(planStats.forall(_.isDefined),
        s"leaf missing cataloged rowCount: $planStats")
      // CBO's row-count estimation propagates to the ROOT of the plan —
      // the size-only estimator leaves non-leaf rowCount undefined, so
      // this pins that the cataloged stats actually drive the estimate
      // (a BroadcastHashJoin alone would not: at this SF the dimension
      // broadcasts on file size with or without CBO)
      assert(q.queryExecution.optimizedPlan.stats.rowCount.isDefined,
        "no CBO row-count estimate at the plan root")
      val exec = q.queryExecution.executedPlan.toString
      assert(exec.contains("BroadcastHashJoin"), s"no broadcast in:\n$exec")
    } finally spark.conf.set(cboKey, prev)
    // the same plan WITHOUT CBO: root row-count estimate disappears —
    // proves the assert above is pinning CBO, not a default behavior
    val qOff = spark.table("graft_cbo_orders")
      .join(spark.table("graft_cbo_customer")
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(qOff.queryExecution.optimizedPlan.stats.rowCount.isEmpty,
      "row-count estimate present without CBO — pin is vacuous")

    // values match an independent plain-parquet composition
    val expect = Tables.read(spark, TestSpark.Sf0001, "orders")
      .join(Tables.read(spark, TestSpark.Sf0001, "customer")
          .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    } finally Seq("graft_cbo_customer", "graft_cbo_orders")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // the gate's default path leaves no catalog state behind
    PipelineOps.cboStatsJoin(spark, TestSpark.Sf0001).collect()
    assert(!spark.catalog.tableExists("graft_cbo_customer"))
    assert(!spark.catalog.tableExists("graft_cbo_orders"))
  }
}
