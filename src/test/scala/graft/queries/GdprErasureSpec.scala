package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** x_gdpr_erasure: targeted delete mutation. The gate itself `require`s
  * the two safety invariants (untouched buckets byte-identical, no erased
  * key survives); this spec pins the arithmetic against an independent
  * recompute and the SCALE property — the rewrite's read is partition-
  * pruned to the affected buckets, so mutation cost is O(requests), not
  * O(table). */
class GdprErasureSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("erasure arithmetic ≡ independent recompute; full history of " +
      "every requested key gone, every other row accounted for") {
    val out = PipelineOps.queries("x_gdpr_erasure")(spark,
      TestSpark.Sf0001).collect().head
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val nBefore = ev.count()
    val nErased = ev.filter($"user_id" % 37 === 0).count()
    val nReq = ev.filter($"user_id" % 37 === 0)
      .select($"user_id").distinct().count()
    assert(nReq > 0 && nErased > nReq,
      "sf0.001 must have multi-row victims or the history claim is vacuous")
    assert(out.getAs[Long]("n_before") == nBefore)
    assert(out.getAs[Long]("n_requests") == nReq)
    assert(out.getAs[Long]("n_rows_erased") == nErased)
    // counts close the ledger: erased keys fully gone (erased_absent) and
    // total matches ⇒ every non-requested row survived the rewrite
    assert(out.getAs[Long]("n_after") == nBefore - nErased)
    assert(out.getAs[Boolean]("untouched_intact"))
    assert(out.getAs[Boolean]("erased_absent"))
    assert(out.getAs[Long]("buckets_rewritten") <=
      out.getAs[Long]("buckets_total"))
  }

  test("full-bucket erasure removes the bucket's files (r10 ADVICE edge: " +
      "dynamic overwrite alone would leave them)") {
    val root = graft.GateCache.tempDir("graft_gdpr_full").toString + "/t"
    val staging = graft.GateCache.tempDir("graft_gdpr_full_stage").toString
    // bucket = user_id % 4; bucket 1 = {1,5,9,...} will be erased WHOLE,
    // bucket 2 loses only user 2, buckets 0/3 are untouched
    def bucketOf(c: org.apache.spark.sql.Column) =
      (c % 4).cast("int")
    (0L until 40L).map(i => (i, i * 10))
      .toDF("user_id", "v")
      .withColumn("_bucket", bucketOf(col("user_id")))
      .write.mode("overwrite").partitionBy("_bucket").parquet(root)
    val reqDf = ((1L until 40L by 4) ++ Seq(2L)).toDF("user_id")
    val affected = PipelineOps.eraseBuckets(spark, root, staging, reqDf,
      bucketOf)
    assert(affected.toSeq == Seq(1, 2))
    // the fully-erased bucket's directory is GONE, not silently stale
    assert(!new java.io.File(s"$root/_bucket=1").exists())
    val after = spark.read.parquet(root)
    assert(after.filter(col("user_id") % 4 === 1).count() == 0)
    assert(after.filter(col("user_id") === 2).count() == 0)
    // everything not requested survived: 40 − 10 (bucket 1) − 1 (user 2)
    assert(after.count() == 29)
    assert(after.join(reqDf, Seq("user_id"), "left_semi").count() == 0)
  }

  test("EVERY affected bucket fully erased (empty staging) skips the swap " +
      "and deletes them all — r11 ADVICE extreme of the full-bucket edge") {
    val root = graft.GateCache.tempDir("graft_gdpr_allfull").toString + "/t"
    val staging =
      graft.GateCache.tempDir("graft_gdpr_allfull_stage").toString
    def bucketOf(c: org.apache.spark.sql.Column) = (c % 4).cast("int")
    (0L until 40L).map(i => (i, i * 10))
      .toDF("user_id", "v")
      .withColumn("_bucket", bucketOf(col("user_id")))
      .write.mode("overwrite").partitionBy("_bucket").parquet(root)
    // request = EVERY user in buckets 1 and 2: nothing survives staging,
    // so the staged frame has zero part files and a read of it would
    // throw "unable to infer schema" — the erasure must not even try
    val reqDf = (0L until 40L).filter(i => i % 4 == 1 || i % 4 == 2)
      .toDF("user_id")
    val affected = PipelineOps.eraseBuckets(spark, root, staging, reqDf,
      bucketOf)
    assert(affected.toSeq == Seq(1, 2))
    assert(!new java.io.File(s"$root/_bucket=1").exists())
    assert(!new java.io.File(s"$root/_bucket=2").exists())
    val after = spark.read.parquet(root)
    assert(after.count() == 20) // buckets 0 and 3 intact
    assert(after.join(reqDf, Seq("user_id"), "left_semi").count() == 0)
  }

  test("the mutation's read is partition-pruned to the affected buckets") {
    val root = graft.GateCache.tempDir("graft_gdpr_prune").toString + "/t"
    (0L until 64L).map(i => (i, i * 10))
      .toDF("user_id", "v")
      .withColumn("_bucket", (col("user_id") % 8).cast("int"))
      .write.mode("overwrite").partitionBy("_bucket").parquet(root)
    val pruned = spark.read.parquet(root)
      .filter(col("_bucket").isin(Integer.valueOf(3), Integer.valueOf(5)))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("_bucket"),
      s"no partition filter in:\n$plan")
    // the scan must list ONLY the two buckets' files
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
      }).flatten
    assert(files.nonEmpty && files.forall(p =>
      p.contains("_bucket=3") || p.contains("_bucket=5")),
      s"scan lists files outside the affected buckets: $files")
  }
}
