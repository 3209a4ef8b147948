package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The distributed two-pass prefix sum against scanLeft, across range
  * counts — including ranges ≫ rows and a single range (degenerate to the
  * plain window). */
class PrefixSumSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("inclusive prefix sum matches scanLeft for any range count") {
    // unique order key (k), non-uniform values, deliberately unsorted input
    val rows = (0 until 257).map(i => ((i * 131) % 257, (i % 7).toLong + 1))
    val expected = rows.sortBy(_._1)
      .scanLeft((0, 0L)) { case ((_, c), (k, v)) => (k, c + v) }.tail.toMap
    for (n <- Seq(1, 3, 32, 1000)) {
      val df = rows.toDF("k", "v").repartition(5)
      val got = PrefixSum.inclusive(df, Seq(col("k").asc), col("v"), n, "cum")
        .select(col("k"), col("cum")).as[(Int, Long)].collect().toMap
      assert(got == expected, s"nRanges=$n")
      graft.GateCache.releaseAll()
    }
  }
}
