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

  test("exactly one O(frame) exchange: range partition, no pid re-shuffle") {
    // the round-7 audit fix: the local cumsum must NOT be a
    // Window.partitionBy(spark_partition_id()) — that form forces a
    // second full hash exchange of the frame right after the range
    // exchange. Pin: one rangepartitioning exchange feeds MapPartitions,
    // and the only hash exchange in the whole plan is the ≤nRanges-row
    // offsets aggregate (post-cache, partial-agg'd).
    val df = (0 until 100).map(i => (i, 1L)).toDF("k", "v")
    val out = PrefixSum.inclusive(df, Seq(col("k").asc), col("v"), 8, "cum")
    val plan = out.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val mpIdx = lines.indexWhere(_.contains("MapPartitions"))
    assert(mpIdx >= 0, s"local cumsum is not a mapPartitions scan:\n$plan")
    // walking DOWN from MapPartitions toward its input: the first
    // exchange must be the range partitioning — any hash exchange in
    // between would be the pid re-shuffle creeping back
    val nextEx = lines.drop(mpIdx).find(_.contains("Exchange"))
    assert(nextEx.exists(_.contains("rangepartitioning")),
      s"first exchange under MapPartitions is not the range exchange " +
        s"($nextEx):\n$plan")
    graft.GateCache.releaseAll()
  }

  test("null values contribute 0 to the sum / don't move the min") {
    // the r7-audited form NPE'd on a null value; the contract is now the
    // SQL one — sum and min ignore NULLs
    val df = Seq((1, Some(2L)), (2, None), (3, Some(5L)), (4, None))
      .toDF("k", "v")
    val got = PrefixSum.inclusive(df, Seq(col("k").asc), col("v"), 2, "cum")
      .select(col("k"), col("cum")).as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 2L, 2 -> 2L, 3 -> 7L, 4 -> 7L))
    graft.GateCache.releaseAll()
    val dfd = Seq((1, Some(3.0)), (2, None), (3, Some(1.0)), (4, None))
      .toDF("k", "v")
    val gotM = PrefixSum.exclusiveMin(dfd, Seq(col("k").asc), col("v"), 2, "pm")
      .select(col("k"), col("pm")).as[(Int, Option[Double])].collect().toMap
    assert(gotM == Map(1 -> None, 2 -> Some(3.0), 3 -> Some(3.0),
      4 -> Some(1.0)))
    graft.GateCache.releaseAll()
  }

  test("exclusive prefix min matches scanLeft; global first row is null") {
    val rows = (0 until 257).map(i => ((i * 131) % 257, ((i * 37) % 50) + 0.5))
    val sorted = rows.sortBy(_._1)
    val expected = sorted.map(_._1).zip(
      sorted.map(_._2).scanLeft(Option.empty[Double]) {
        case (m, v) => Some(m.fold(v)(math.min(_, v)))
      }.init).toMap
    for (n <- Seq(1, 3, 32, 1000)) {
      val df = rows.toDF("k", "v").repartition(5)
      val got = PrefixSum.exclusiveMin(df, Seq(col("k").asc), col("v"), n, "pm")
        .select(col("k"), col("pm")).as[(Int, Option[Double])].collect().toMap
      assert(got == expected, s"nRanges=$n")
      graft.GateCache.releaseAll()
    }
  }
}
