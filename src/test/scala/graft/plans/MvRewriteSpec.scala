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

  test("global aggregate filtered to empty: count is 0, not NULL; values " +
      "≡ un-rewritten plan") {
    // no grouping keys + a pushed grouping-column predicate matching no
    // group: the rewritten global Aggregate runs over ZERO MV rows and
    // must still emit count = 0 exactly like the base plan (r9 ADVICE,
    // medium — Sum(_cnt) alone would yield NULL)
    def gq = spark.read.parquet(base)
      .filter(col("l_returnflag") === "Z") // no such flag at any SF
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
    val expected = gq.collect().toSeq // registry empty → base plan
    assert(expected.head.getLong(0) == 0L && expected.head.isNullAt(1))
    registered {
      val df = gq
      assert(!scansBase(df), "global aggregate rewrite did not fire")
      assert(df.collect().toSeq == expected)
    }
    // non-empty global aggregate for completeness: same values either way
    def gq2 = spark.read.parquet(base)
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
    val expected2 = gq2.collect().toSeq
    registered {
      assert(!scansBase(gq2))
      assert(gq2.collect().toSeq == expected2)
    }
  }

  test("registry identity: remote URIs keep scheme+authority; local " +
      "file:/ ≡ bare path") {
    assert(MvRewrite.normalizePath("file:/x/y") ==
      MvRewrite.normalizePath("/x/y"))
    assert(MvRewrite.normalizePath("s3a://bucketA/data") !=
      MvRewrite.normalizePath("s3a://bucketB/data"),
      "different buckets collapsed to one registry key — cross-MV answer")
    assert(MvRewrite.normalizePath("s3a://bucketA/data") ==
      "s3a://bucketA/data")
  }

  test("mis-registered MV missing a filter-only grouping column: no " +
      "rewrite, no optimizer-time exception") {
    // MV parquet carries l_returnflag but NOT l_linestatus, yet the
    // registration claims both as grouping columns; a query filtering on
    // the absent column must keep the base scan rather than throw in the
    // rebind (r9 ADVICE)
    val mvDir = java.nio.file.Files.createTempDirectory("graft_mv_mis").toString
    spark.read.parquet(base)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("_cnt"),
        sum(col("l_quantity")).as("_sum_l_quantity"),
        min(col("l_quantity")).as("_min_l_quantity"),
        max(col("l_quantity")).as("_max_l_quantity"))
      .write.mode("overwrite").parquet(mvDir)
    MvRewrite.register(spark, base, mvDir,
      Seq("l_returnflag", "l_linestatus"), Set("l_quantity"))
    try {
      val df = spark.read.parquet(base)
        .filter(col("l_linestatus") === "F") // references the absent column
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
      assert(scansBase(df), "mis-registered MV answered the query")
      df.collect() // and the plan must actually execute
    } finally MvRewrite.clear()
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
