package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.{PipelineOps, Tables}

/** Pins incremental MV maintenance: the refreshed view equals a full
  * recompute, and the refresh plan reads the materialized base aggregate
  * (|groups| rows) plus the delta — not the pre-cutoff event history. */
class IncrementalMvSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("x_incremental_mv_refresh: merge ≡ full recompute; plan reads the MV") {
    val merged = PipelineOps.incrementalMvRefresh(spark, TestSpark.Sf0001)

    // the refresh plan's scans: the materialized view dir + events (for
    // the delta) — the base history is consumed only through the MV
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("graft_mv"), s"no MV scan in refresh plan:\n$plan")

    val got = merged.as[(String, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    val full = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_type"),
        to_date(timestamp_micros(col("ts_us"))).cast("string").as("day"),
        round(col("value") * 1000000d, 0).cast("bigint").as("vq"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("vq")).cast("long").as("s"))
      .as[(String, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == full.toSeq)
    // the delta actually contributed (cutoff splits the event span)
    val cutoffGroups = Tables.events(spark, TestSpark.Sf0001)
      .filter(col("ts_us") >= graft.queries.Warehouse.DiffCutoffUs).count()
    assert(cutoffGroups > 0, "cutoff left an empty delta — vacuous merge")

    // merge algebra holds at the boundaries: empty MV (everything is
    // delta) and empty delta (MV is already final) both ≡ full recompute
    Seq(0L, Long.MaxValue).foreach { cutoff =>
      val edge = PipelineOps
        .incrementalMvRefresh(spark, TestSpark.Sf0001, cutoff)
        .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
      assert(edge.toSeq == full.toSeq, s"cutoff $cutoff diverged")
    }
  }

  test("x_join_ivm: delta-rule union ≡ full join recompute; old⋈old comes " +
      "from the stored MV; terms partition the pairs") {
    val got = PipelineOps.joinIvm(spark, TestSpark.Sf0001)
    got.count() // force the AQE final plan
    // the maintenance plan reads the materialized old⋈old — and performs
    // exactly the three delta joins, never a fourth for the stored term
    def joinCount(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          joinCount(a.executedPlan)
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          1 + j.children.map(joinCount).sum
        case other => other.children.map(joinCount).sum
      }
    val plan = got.queryExecution.executedPlan
    assert(plan.toString.contains("graft_jivm"),
      s"no MV scan in maintenance plan")
    val joins = joinCount(plan)
    assert(joins == 3, s"$joins joins in the maintenance plan — expected " +
      "exactly the three delta terms (old⋈old must come from the MV)")

    // term-summed result ≡ full recompute, and the term labels partition
    // the full join by the split predicates
    val byTerm = got.as[(String, String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(rs => (rs.map(_._3).sum, rs.map(_._4).sum)).toMap
    val full = spark.read
      .parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .join(spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).cast("long").as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byTerm == full)
    // all four delta-rule terms genuinely occur at this split
    val terms = got.as[(String, String, Long, Long)].collect()
      .map(_._2).toSet
    assert(terms == Set("oo", "no", "on", "nn"),
      s"missing delta terms: $terms")
  }
}
