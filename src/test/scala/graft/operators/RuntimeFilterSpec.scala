package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime bloom-filter injection: the shuffle join's fact side must be
  * pre-filtered by a bloom filter built from the dim's surviving keys —
  * the row-level analog of x_dpp_join's directory-level pruning. */
class RuntimeFilterSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("AQE splits a skewed join partition (skew=true on the SMJ)") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val prev = keys.map(k => k -> conf.getOption(k))
    // thresholds scaled to harness size: one key holds ~97% of the rows,
    // so its post-shuffle partition dwarfs the advisory size and AQE
    // must split it across tasks (the automatic path; SkewOps.saltedJoin
    // is the explicit one)
    conf.set(keys(0), "-1")
    conf.set(keys(1), "-1")
    conf.set(keys(2), "20000")
    conf.set(keys(3), "10000")
    conf.set(keys(4), "false")
    try {
      val big = spark.range(0, 200000)
        .select(when(col("id") % 100 =!= 0, lit(0L))
          .otherwise(col("id") % 99 + 1).as("k"), col("id").as("payload"))
      val dim = (0L until 100L).map(k => (k, s"d$k")).toDF("k", "tag")
      val joined = big.join(dim, Seq("k"))
      // collect() executes THIS queryExecution — skew=true only exists on
      // the final adaptive plan, and count() would plan a separate query
      assert(joined.collect().length == 200000) // every row matches a dim key
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("x_bloom_join: fact scan carries bloom_filter_might_contain") {
    val df = graft.queries.Warehouse.queries("x_bloom_join")(
      spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
    val plan = df.queryExecution.executedPlan.toString
    // physical rendering: a might_contain(bloom subquery) filter on the
    // fact side, fed by a bloom_filter_agg over the dim's keys
    assert(plan.contains("might_contain"), plan.take(4000))
    assert(plan.contains("bloom_filter_agg"), plan.take(4000))
  }
}
