package graft

import org.apache.spark.sql.SparkSession

/** Deterministic [[GateCache]] release for specs. Gate builders persist
  * intermediates (and register CC localCheckpoint block releases) that the
  * harness mains pair with each query's action; suites get the same
  * pairing at suite end, so cached frames don't accumulate for the whole
  * JVM-wide test run. Suites run sequentially in the forked test JVM
  * (`Test / fork := true`, forked-parallel off), so the global release
  * cannot race another suite's in-flight query. */
trait GateCacheHygiene extends org.scalatest.BeforeAndAfterAll {
  this: org.scalatest.Suite =>
  override protected def afterAll(): Unit = {
    GateCache.releaseAll()
    super.afterAll()
  }
}

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // exercise the cluster-default deployment path for the native SQL
      // functions (GraftExtensionsSpec asserts resolution w/o register())
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_twh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf0001 = "/root/testdata/sf0.001"
}
