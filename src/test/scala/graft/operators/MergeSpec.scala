package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Batch MERGE semantics: delete wins, update replaces, insert appends,
  * untouched rows survive byte-identically — and the pk stays unique. */
class MergeSpec extends AnyFunSuite with graft.GateCacheHygiene {
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

  test("a NULL _deleted change row is a REPLACE, not a silent delete, " +
      "and the change feed reports it (r12 review finding)") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a2", Option.empty[Int]), (3L, "c", Some(0)))
      .toDF("k", "v", "_deleted")
    val merged = Merge.upsert(target, changes, "k")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(merged == Seq((1L, "a2"), (2L, "b"), (3L, "c")),
      s"NULL _deleted mishandled: $merged")
    // the feed must describe exactly what upsert did: a pre/post pair
    // for key 1 and an insert for key 3 — a bare === null would emit
    // NOTHING for key 1 while upsert replaced it
    val feed = Merge.changeFeed(target, changes, "k")
      .select("_op", "k", "v").as[(String, Long, String)]
      .collect().toSet
    assert(feed == Set(
      ("update_preimage", 1L, "a"), ("update_postimage", 1L, "a2"),
      ("insert", 3L, "c")), s"feed=$feed")
  }

  test("pk uniqueness is preserved when a change row targets an existing key") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq((1L, "a9", 0)).toDF("k", "v", "_deleted")
    val merged = Merge.upsert(target, changes, "k")
    assert(merged.groupBy("k").count().filter(col("count") > 1).isEmpty)
    assert(merged.count() == 2)
  }

  test("upsertVersioned: out-of-order batches converge to the same state") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, String, Int)]
      .toDF("k", "ver", "v", "_deleted")
    val b1 = Seq((1L, 10L, "old", 0), (2L, 11L, "gone", 1)).toDF("k", "ver", "v", "_deleted")
    val b2 = Seq((1L, 20L, "new", 0)).toDF("k", "ver", "v", "_deleted")

    def apply2(first: org.apache.spark.sql.DataFrame,
               second: org.apache.spark.sql.DataFrame) =
      Merge.upsertVersioned(
        Merge.upsertVersioned(empty, first, "k", "ver"), second, "k", "ver")
        .orderBy("k").as[(Long, Long, String, Int)].collect().toSeq

    val inOrder = apply2(b1, b2)
    val outOfOrder = apply2(b2, b1) // b2 replayed first: b1 must NOT regress k=1
    assert(inOrder == outOfOrder)
    assert(inOrder == Seq((1L, 20L, "new", 0), (2L, 11L, "gone", 1)))
  }

  test("upsertVersioned: tombstone blocks resurrection by a late older event") {
    import spark.implicits._
    val state = Seq((7L, 50L, "x", 1)).toDF("k", "ver", "v", "_deleted")
    val late = Seq((7L, 40L, "stale", 0)).toDF("k", "ver", "v", "_deleted")
    val merged = Merge.upsertVersioned(state, late, "k", "ver")
      .as[(Long, Long, String, Int)].collect().toSeq
    assert(merged == Seq((7L, 50L, "x", 1))) // delete at ver 50 still wins
  }

  test("changeFeed: ops per key are correct and a no-op delete emits nothing") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "b2", 99.0, 0),  // update → pre + post
      (3L, "c", 30.0, 1),   // delete → before-image
      (4L, "d", 40.0, 0),   // insert → after-image
      (9L, "zz", 0.0, 1))   // delete of absent key → NOTHING
      .toDF("k", "name", "bal", "_deleted")
    val feedDf = Merge.changeFeed(target, changes, "k")
    val feed = feedDf
      .as[(String, Long, String, Double)].collect().toSeq.sorted
    assert(feed == Seq(
      ("delete", 3L, "c", 30.0),
      ("insert", 4L, "d", 40.0),
      ("update_postimage", 2L, "b2", 99.0),
      ("update_preimage", 2L, "b", 20.0)))
    // the table side is semi-join-pruned to changeset keys BEFORE the
    // outer join (the no-table-shuffle lever — see scaladoc)
    assert(feedDf.queryExecution.executedPlan.toString.contains("LeftSemi"))
  }

  test("changeFeed replays the merge: post-images/inserts applied and deletes removed reproduce upsert()") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq((2L, "b2", 99.0, 0), (3L, "c", 30.0, 1),
      (4L, "d", 40.0, 0)).toDF("k", "name", "bal", "_deleted")
    val feed = Merge.changeFeed(target, changes, "k")
    // a CDF consumer's apply: upserts = post-images + inserts, deletes =
    // delete rows; replaying them through upsert() must equal the direct
    // merge — the feed is a faithful row-level account of it
    val applied = Merge.upsert(target,
      feed.filter(col("_op").isin("update_postimage", "insert"))
        .drop("_op").withColumn("_deleted", lit(0))
        .unionByName(feed.filter(col("_op") === "delete")
          .drop("_op").withColumn("_deleted", lit(1))),
      "k").as[(Long, String, Double)].collect().toSeq.sorted
    val direct = Merge.upsert(target, changes, "k")
      .as[(Long, String, Double)].collect().toSeq.sorted
    assert(applied == direct)
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
