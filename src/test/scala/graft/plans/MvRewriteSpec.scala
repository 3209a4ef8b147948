package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins for the transparent MV rewrite rule: it must fire on the contract
  * (and produce exactly what the un-rewritten plan produces), and must
  * refuse everything outside it — the rule's soundness IS its
  * conservatism. */
class MvRewriteSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  private val base = s"${TestSpark.Sf0001}/lineitem.parquet"

  /** Register the gate's MV shape (idempotent per test). */
  private def registered[A](f: => A): A = {
    val mvDir = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString
    spark.read.parquet(base)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("_cnt"),
        sum(col("l_quantity")).as("_sum_l_quantity"),
        min(col("l_quantity")).as("_min_l_quantity"),
        max(col("l_quantity")).as("_max_l_quantity"))
      .write.mode("overwrite").parquet(mvDir)
    MvRewrite.register(spark, base, mvDir,
      Seq("l_returnflag", "l_linestatus"), Set("l_quantity"))
    try f finally MvRewrite.clear()
  }

  private def scans(df: DataFrame): Seq[String] =
    MvRewrite.scannedPaths(df.queryExecution.optimizedPlan)

  private def scansBase(df: DataFrame): Boolean =
    scans(df).contains(MvRewrite.normalizePath(base))

  private def q(groupCols: Seq[String]) =
    spark.read.parquet(base).groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))

  test("fires at coarser AND exact granularity; values ≡ un-rewritten plan") {
    for (g <- Seq(Seq("l_returnflag"), Seq("l_returnflag", "l_linestatus"))) {
      val expected = q(g).collect().toSet // registry empty → base plan
      registered {
        val df = q(g)
        assert(!scansBase(df), s"rewrite did not fire for grouping $g")
        assert(df.collect().toSet == expected)
      }
    }
  }

  test("grouping-column filters push onto the MV; values ≡ un-rewritten") {
    def fq = spark.read.parquet(base)
      .filter(col("l_linestatus") === "F" && col("l_returnflag") =!= "N")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
    val expected = fq.collect().toSet
    registered {
      val df = fq
      assert(!scansBase(df), "grouping-column filter blocked the rewrite")
      assert(df.collect().toSet == expected)
    }
  }

  test("conservatism: anything outside the contract keeps the base scan") {
    registered {
      // filter over a MEASURE disqualifies (the MV granularity can't see
      // sub-group rows; only grouping-column predicates are pushable)
      assert(scansBase(spark.read.parquet(base)
        .filter(col("l_quantity") > 10).groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"))))
      // and so does a filter mixing a grouping column with a measure
      assert(scansBase(spark.read.parquet(base)
        .filter(col("l_returnflag") === "R" || col("l_quantity") > 10)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"))))
      // grouping key the MV didn't group by
      assert(scansBase(spark.read.parquet(base).groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("s"))))
      // measure the MV doesn't carry
      assert(scansBase(spark.read.parquet(base).groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice")).as("s"))))
      // DISTINCT aggregate is not derivable from partial states
      assert(scansBase(spark.read.parquet(base).groupBy(col("l_returnflag"))
        .agg(sum_distinct(col("l_quantity")).as("s"))))
      // computed aggregate input (expression, not a plain column)
      assert(scansBase(spark.read.parquet(base).groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity") * 2).as("s"))))
      // avg is intentionally out of contract (no partial pair mapping)
      assert(scansBase(spark.read.parquet(base).groupBy(col("l_returnflag"))
        .agg(avg(col("l_quantity")).as("a"))))
    }
  }

  test("t20 maintenance law: stream-folded MV snapshot ≡ recompute from " +
      "the landed base") {
    val (baseDir, mvSnap) =
      graft.queries.PipelineOps.runLiveProjection(spark, TestSpark.Sf0001)
    val recomputed = spark.read.parquet(baseDir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("_cnt"),
        sum(col("value_micro")).as("_sum_value_micro"),
        min(col("value_micro")).as("_min_value_micro"),
        max(col("value_micro")).as("_max_value_micro"))
    val snap = spark.read.parquet(mvSnap)
    assert(snap.count() == recomputed.count())
    assert(snap.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(snap).isEmpty)
  }

  test("cleared registry is inert and other tables are never touched") {
    registered { () } // register + clear
    assert(scansBase(q(Seq("l_returnflag"))))
    registered {
      // a scan of a DIFFERENT table with identical column names in the
      // aggregate must not be redirected
      val other = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(MvRewrite.scannedPaths(other.queryExecution.optimizedPlan)
        .contains(MvRewrite.normalizePath(s"${TestSpark.Sf0001}/orders.parquet")))
    }
  }
}
