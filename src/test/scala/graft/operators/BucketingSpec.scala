package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Co-located (bucketed) joins — the 100 TB strategy for repeated
  * fact-to-fact joins: pre-bucket both tables on the join key so the join
  * plans with ZERO shuffle exchanges. The harness's single parquet files
  * stand in for lake tables; this spec proves the plan shape. */
class BucketingSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // force AQE final plan
    def collectShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p match {
        case a: AdaptiveSparkPlanExec => collectShuffles(a.executedPlan)
        case s: ShuffleExchangeExec => 1 + s.children.map(collectShuffles).sum
        case other =>
          (other.children.map(collectShuffles) ++
            other.subqueries.map(collectShuffles)).sum
      }
    collectShuffles(df.queryExecution.executedPlan)
  }

  test("bucketed tables join without any shuffle exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")

    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
    val ord = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt.lineitem_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt.orders_b")

    val joined = spark.table("graft_bkt.lineitem_b")
      .join(spark.table("graft_bkt.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))

    // the same join over unbucketed parquet shuffles both sides
    val unbucketed = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))

    // disable broadcast so both plans take the sort-merge path
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val bucketedShuffles = shuffleCount(joined)
      val plainShuffles = shuffleCount(unbucketed)
      // bucketed: only the final groupBy may shuffle; the join itself is
      // co-located. Unbucketed: both join inputs shuffle too.
      assert(bucketedShuffles < plainShuffles,
        s"bucketed=$bucketedShuffles plain=$plainShuffles")
      assert(bucketedShuffles <= 1)
    }

    // results identical
    assert(joined.exceptAll(unbucketed).isEmpty)
  }

  test("appended generation keeps the join exchange-free and the union " +
      "of both writes' rows") {
    val cust = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    Bucketing.writeBucketedMulti(cust.filter(col("c_custkey") % 2 === 0),
      "graft_spec_cust_gen", Seq("c_custkey"), 8)
    Bucketing.appendBucketedMulti(cust.filter(col("c_custkey") % 2 === 1),
      "graft_spec_cust_gen", Seq("c_custkey"), 8)
    Bucketing.writeBucketedMulti(cust.select(col("c_custkey").as("k")),
      "graft_spec_cust_probe", Seq("k"), 8)
    // no row lost or duplicated across generations
    assert(spark.table("graft_spec_cust_gen").count() == cust.count())
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val j = spark.table("graft_spec_cust_gen")
        .join(spark.table("graft_spec_cust_probe"),
          col("c_custkey") === col("k"))
      assert(j.count() == cust.count())
      // multi-file buckets may add a Sort, never an Exchange
      assert(shuffleCount(j) == 0, "append broke the co-located layout")
    }
  }

  test("compactBucketed folds generations to exactly one sorted file per " +
      "bucket, preserving rows under the same table name") {
    val cust = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    Bucketing.writeBucketedMulti(cust.filter(col("c_custkey") % 2 === 0),
      "graft_spec_cust_cmp", Seq("c_custkey"), 8)
    Bucketing.appendBucketedMulti(cust.filter(col("c_custkey") % 2 === 1),
      "graft_spec_cust_cmp", Seq("c_custkey"), 8)
    def bucketFiles(): Seq[String] = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_spec_cust_cmp"))
        .location.toString
      graft.sources.HadoopFs.list(loc).map(_.getPath.getName)
        .filter(_.startsWith("part-"))
    }
    assert(bucketFiles().length > 8, "fixture has no generations to fold")
    Bucketing.compactBucketed(spark, "graft_spec_cust_cmp",
      Seq("c_custkey"), 8)
    val files = bucketFiles()
    assert(files.length == 8, s"expected 8 files, got: $files")
    // one file per DISTINCT bucket id — none merged, none split
    assert(files.map(_.split("_").last).distinct.length == 8)
    assert(spark.table("graft_spec_cust_cmp").count() == cust.count())
  }

  test("compactBucketed crash recovery: a stranded _compact_old table is " +
      "restored and the compaction completes") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i * 3)).toDF("k", "v")
    Bucketing.writeBucketedMulti(df, "graft_spec_crash", Seq("k"), 4)
    // simulate a crash between the two swap renames: the live name is
    // gone, the data survives under _compact_old
    spark.sql(
      "ALTER TABLE graft_spec_crash RENAME TO graft_spec_crash_compact_old")
    assert(!spark.catalog.tableExists("graft_spec_crash"))
    Bucketing.compactBucketed(spark, "graft_spec_crash", Seq("k"), 4)
    assert(spark.table("graft_spec_crash").count() == 100)
    assert(!spark.catalog.tableExists("graft_spec_crash_compact_old"))
    assert(!spark.catalog.tableExists("graft_spec_crash_compact_tmp"))
  }

  test("point lookup on the bucket key reads one bucket of eight") {
    val cust = spark.read.parquet(s"${TestSpark.Sf0001}/customer.parquet")
    Bucketing.writeBucketed(cust, "graft_spec_cust_b", "c_custkey", 8)
    // without this, DisableUnnecessaryBucketedScan reverts to a plain
    // scan (it only credits distribution needs, not filter pruning)
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false") {
      val lookup = spark.table("graft_spec_cust_b")
        .filter(col("c_custkey") === 42L)
      assert(lookup.count() == 1)
      val scanLine = lookup.queryExecution.executedPlan.toString
      assert(scanLine.contains("SelectedBucketsCount: 1 out of 8"),
        scanLine.take(3000))
    }
  }

  private def withConf(k: String, v: String)(body: => Unit): Unit = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }
}
