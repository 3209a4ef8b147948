package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Batch MERGE semantics: delete wins, update replaces, insert appends,
  * untouched rows survive byte-identically — and the pk stays unique. */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("upsert applies deletes, updates, and inserts in one pass") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "b2", 99.0, 0), // update
      (3L, "c", 30.0, 1),  // delete
      (4L, "d", 40.0, 0))  // insert
      .toDF("k", "name", "bal", "_deleted")

    val merged = Merge.upsert(target, changes, "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(merged == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (4L, "d", 40.0)))
  }

  test("pk uniqueness is preserved when a change row targets an existing key") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a9", 0)).toDF("k", "v", "_deleted")
    val merged = Merge.upsert(target, changes, "k")
    assert(merged.groupBy("k").count().filter(col("count") > 1).isEmpty)
    assert(merged.count() == 2)
  }

  test("no nested-loop join: the anti join is hash- or broadcast-based") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a9", 0)).toDF("k", "v", "_deleted")
    val merged = Merge.upsert(target, changes, "k")
    merged.count()
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
