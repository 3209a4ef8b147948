package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cluster-default deployment path: with
  * `spark.sql.extensions=graft.GraftExtensions` (set by TestSpark's
  * builder), the native SQL functions resolve in ANY session of the
  * context — including fresh ones — without a `GraftFunctions.register`
  * call. */
class GraftExtensionsSpec extends AnyFunSuite with graft.GateCacheHygiene {

  test("graft_dot / graft_shingles resolve via extensions in a fresh session") {
    val fresh = TestSpark.spark.newSession()
    val dot = fresh.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(dot == 9.0)
    val sh = fresh.sql("SELECT graft_shingles('a b c d', 3)")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }
}
