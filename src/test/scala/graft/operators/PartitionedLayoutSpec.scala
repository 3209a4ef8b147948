package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hive-style partitioned layout: a filter on the partition column must
  * prune at the FILE INDEX — directories outside the range are never
  * listed into the scan. This is the complement of [[ZOrder]] (which
  * prunes within files via min/max): at 100 TB a day-range query over a
  * date-partitioned table touches only the matching directories. */
class PartitionedLayoutSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("date filter prunes partition directories at the scan") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_pl").toString
    (0 until 100).map(i => (i.toLong, s"d${i % 10}"))
      .toDF("id", "day")
      .write.mode("overwrite").partitionBy("day").parquet(out)

    val filtered = spark.read.parquet(out)
      .filter(col("day") === "d3" || col("day") === "d7")
    assert(filtered.count() == 20)

    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
    val scan = scans(filtered.queryExecution.executedPlan).head
    assert(scan.partitionFilters.nonEmpty, "filter must reach the file index")
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
    assert(selected.size == 2, s"expected 2 of 10 partitions, got ${selected.size}")
  }

  test("codec control: zstd writes are smaller than snappy, content identical") {
    // the storage knob that matters at 100 TB: zstd trades a little CPU
    // for materially smaller files (less IO, less cache pressure)
    def sizeWith(codec: String): (Long, Long) = {
      val out = java.nio.file.Files.createTempDirectory(s"graft_$codec").toString
      spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
        .coalesce(1)
        .write.mode("overwrite").option("compression", codec).parquet(out)
      val bytes = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      (bytes, spark.read.parquet(out).count())
    }
    val (snappyBytes, snappyRows) = sizeWith("snappy")
    val (zstdBytes, zstdRows) = sizeWith("zstd")
    assert(snappyRows == zstdRows)
    assert(zstdBytes < snappyBytes,
      s"zstd $zstdBytes !< snappy $snappyBytes")
  }

  test("x_dpp_join: the dim filter prunes fact partitions at runtime") {
    val df = graft.queries.PipelineOps.dppJoin(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the fact scan must carry a dynamic pruning subquery on event_date —
    // partitions are selected by the dim's surviving keys at runtime, not
    // by a static filter
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"), plan.take(4000))
  }
}
