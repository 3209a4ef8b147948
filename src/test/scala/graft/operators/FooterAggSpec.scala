package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.queries.PipelineOps

/** Pins the parquet footer-statistics aggregate path: with the DSv2
  * source and `parquet.aggregatePushdown` on, COUNT/MIN/MAX must appear
  * as `PushedAggregation` on the scan (metadata-only — no data pages
  * decoded), and the values must equal the v1 full-scan aggregate. */
class FooterAggSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("x_footer_agg_pushdown: PushedAggregation on the scan; values equal full scan") {
    val listKey = "spark.sql.sources.useV1SourceList"
    val pushKey = "spark.sql.parquet.aggregatePushdown"
    val prevList = spark.conf.get(listKey)
    val prevPush = spark.conf.get(pushKey)
    spark.conf.set(listKey, prevList.split(",").map(_.trim)
      .filterNot(_ == "parquet").mkString(","))
    spark.conf.set(pushKey, "true")
    try {
      val agg = spark.read
        .parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
        .agg(expr("count(*)"), min(col("l_quantity")),
          max(col("l_quantity")), min(col("l_extendedprice")),
          max(col("l_extendedprice")))
      // pushdown rewrites the V2 scan relation to OUTPUT the aggregates
      // (its attributes become count(*)/min/max) — the full-scan shape
      // would show the raw lineitem columns under an Aggregate instead
      val opt = agg.queryExecution.optimizedPlan.toString
      assert(opt.contains("RelationV2[count(*)"), s"no pushed count:\n$opt")
      assert(opt.contains("min(l_quantity)") &&
        opt.contains("max(l_extendedprice)"), s"incomplete pushdown:\n$opt")
      val exec = agg.queryExecution.executedPlan.toString
      assert(exec.contains("PushedAggregation"), s"no marker:\n$exec")
    } finally {
      spark.conf.set(listKey, prevList); spark.conf.set(pushKey, prevPush)
    }

    // the gate (scopes its own confs) vs the default v1 full scan
    val got = PipelineOps.footerAggPushdown(spark, TestSpark.Sf0001)
      .collect()(0)
    val full = spark.read
      .parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .agg(expr("count(*)"), min(col("l_quantity")), max(col("l_quantity")),
        min(col("l_extendedprice")), max(col("l_extendedprice")))
      .collect()(0)
    assert((0 until 5).forall(i => got.get(i) == full.get(i)),
      s"footer stats $got != full scan $full")
    // the scoped confs were restored
    assert(spark.conf.get("spark.sql.sources.useV1SourceList")
      .split(",").map(_.trim).contains("parquet"))
  }
}
