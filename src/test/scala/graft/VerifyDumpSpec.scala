package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The round-8 lesson as a pinned contract: a gate that THROWS must leave
  * a visible red row in errors.json (and no result dir), never just a
  * smaller output set — and must not take the healthy gates down with
  * it. */
class VerifyDumpSpec extends AnyFunSuite with GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("a throwing gate → errors.json red row; healthy gates still land") {
    val out = java.nio.file.Files.createTempDirectory("verify_dump").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("k", "v") }
    val bad: (SparkSession, String) => DataFrame =
      (_, _) => sys.error("deliberately broken gate")
    val n = Verify.dump(spark, TestSpark.Sf0001, out,
      queries = Map("g_good" -> good, "g_bad" -> bad),
      oracles = Map("g_good" -> "SELECT 1 AS k, 'a' AS v",
        "g_bad" -> "SELECT 1"))
    assert(n == 1)
    val errs = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/errors.json")))
    assert(errs.contains("g_bad") && errs.contains("deliberately broken"))
    assert(!errs.contains("g_good"))
    assert(new java.io.File(s"$out/g_good").isDirectory)
    assert(!new java.io.File(s"$out/g_bad").isDirectory)
    // the oracle set still carries BOTH names — check_oracle's
    // truncation guard turns the missing result dir into a failure row
    val oracle = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")))
    assert(oracle.contains("g_bad") && oracle.contains("g_good"))

    // a clean re-run of the same outDir leaves no stale artifacts
    val n2 = Verify.dump(spark, TestSpark.Sf0001, out,
      queries = Map("g_good" -> good), oracles = Map("g_good" -> "SELECT 1"))
    assert(n2 == 0)
    assert(!new java.io.File(s"$out/g_bad").exists())
    val errs2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/errors.json")))
    assert(errs2 == "{}")
  }
}
