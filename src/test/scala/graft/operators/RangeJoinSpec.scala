package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The banded interval-overlap join must be a pure plan rewrite: same
  * result set as the naive non-equi join for any band width, with no
  * duplicated pairs (the canonical-first-band trick replaces a distinct). */
class RangeJoinSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("lid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val left = Seq(
    // (id, start, end) — point intervals, touching ends, negatives,
    // band-straddling spans
    (1L, 0L, 10L), (2L, 5L, 5L), (3L, -8L, -2L), (4L, 95L, 210L),
    (5L, 7L, 9L), (6L, -1L, 1L))
    .toDF("lid", "l_s", "l_e")
  private val right = Seq(
    (10L, 10L, 20L), (11L, -3L, 0L), (12L, 100L, 100L), (13L, 6L, 8L),
    (14L, 300L, 400L))
    .toDF("rid", "r_s", "r_e")

  private val naive = left.join(right,
    col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))

  test("bandedOverlap ≡ naive non-equi join for any band width") {
    val expected = pairs(naive)
    assert(expected.nonEmpty)
    for (w <- Seq(1, 3, 16, 1000)) {
      val got = RangeJoin.bandedOverlap(left, "l_s", "l_e",
        right, "r_s", "r_e", w)
      assert(pairs(got) == expected, s"bandWidth=$w")
      // canonical-first-band emission: exactly one row per matching pair
      assert(got.count() == expected.size, s"duplicates at bandWidth=$w")
    }
  }

  test("testdata-scale equivalence (lineitem delivery windows × months)") {
    val epoch = to_date(lit("1970-01-01"))
    val li = graft.queries.Tables.read(spark, TestSpark.Sf0001, "lineitem")
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("lid"),
        datediff(to_date(col("l_shipdate")), epoch).cast("long").as("l_s"))
      .withColumn("l_e", col("l_s") + 6)
    val mo = graft.queries.Tables.read(spark, TestSpark.Sf0001, "orders")
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("_m"))
      .distinct()
      .select(datediff(col("_m"), epoch).cast("long").as("rid"),
        datediff(col("_m"), epoch).cast("long").as("r_s"),
        datediff(last_day(col("_m")), epoch).cast("long").as("r_e"))
    val expected = li.join(mo,
      col("l_s") <= col("r_e") && col("r_s") <= col("l_e")).count()
    val got = RangeJoin.bandedOverlap(li, "l_s", "l_e",
      mo, "r_s", "r_e", 16).count()
    assert(got == expected && got > 0)
  }

  test("guards: shared column names and reserved _band are rejected") {
    val l = Seq((1L, 2L)).toDF("s", "e")
    val r = Seq((1L, 2L)).toDF("s", "r_e")
    intercept[IllegalArgumentException] {
      RangeJoin.bandedOverlap(l, "s", "e", r, "s", "r_e", 10)
    }
    val lb = Seq((1L, 2L, 0L)).toDF("l_s", "l_e", "_band")
    val rr = Seq((1L, 2L)).toDF("r_s", "r_e")
    intercept[IllegalArgumentException] {
      RangeJoin.bandedOverlap(lb, "l_s", "l_e", rr, "r_s", "r_e", 10)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.bandedOverlap(left, "l_s", "l_e", right, "r_s", "r_e", 0)
    }
  }
}
