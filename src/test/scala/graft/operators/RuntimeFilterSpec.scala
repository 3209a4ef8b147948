package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime bloom-filter injection: the shuffle join's fact side must be
  * pre-filtered by a bloom filter built from the dim's surviving keys —
  * the row-level analog of x_dpp_join's directory-level pruning. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
