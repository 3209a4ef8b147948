package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's smoke contract: `SparkEntry.entry` must work in a
  * session we didn't pre-configure (it self-sets the nanos-timestamp conf
  * via Tables) and return rows on sf0.001. */
class EntrySmokeSpec extends AnyFunSuite with graft.GateCacheHygiene {
  test("entry returns rows in a fresh session") {
    val fresh = TestSpark.spark.newSession()
    assert(SparkEntry.entry(fresh).count() > 0)
  }

  test("every query has either an oracle or is documented rows-only") {
    // Sketch outputs have no exact cross-engine oracle by construction;
    // the driver records a weaker rows-only check for these (their error
    // bounds are pinned by ScalaTest specs instead).
    val documentedRowsOnly = Set("x_hll_distinct_users", "x_approx_quantiles")
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    assert((q diff o) == documentedRowsOnly,
      s"undocumented rows-only queries: ${q diff o diff documentedRowsOnly}")
  }
}
