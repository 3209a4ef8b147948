package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SkewOpsSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("salted two-phase agg ≡ plain groupBy on real events") {
    val ev = graft.queries.Tables.events(spark, TestSpark.Sf0001)
    val salted = SkewOps.saltedAgg(ev, Seq("event_type"),
      scala.collection.immutable.ListMap(
        "n" -> (lit(1), SkewOps.CountAgg),
        "sv" -> (col("value").cast("decimal(18,2)"), SkewOps.SumAgg),
        "mn" -> (col("ts_us"), SkewOps.MinAgg),
        "mx" -> (col("ts_us"), SkewOps.MaxAgg)),
      saltBuckets = 8)
    val plain = ev.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,2)")).as("sv"),
      min(col("ts_us")).as("mn"),
      max(col("ts_us")).as("mx"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("approx_count_distinct within rsd bounds of exact (sketch surface)") {
    val ev = graft.queries.Tables.events(spark, TestSpark.Sf0001)
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.15,
      s"exact=$exact approx=$approx")
  }
}
