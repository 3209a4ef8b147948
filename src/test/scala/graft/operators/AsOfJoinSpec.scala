package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rejects inputs that already use the reserved internal columns") {
    val left = Seq((1, 10L, "x")).toDF("k", "ts", "_rp")
    val right = Seq((1, 5L, "r")).toDF("k", "ts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("rv"))
    }
    assert(e.getMessage.contains("_rp"))
  }

  test("picks latest right row at-or-before, null when none, per key") {
    val left = Seq(
      (1, 10L, "p1"), (1, 20L, "p2"), (1, 15L, "p3"), (2, 5L, "p4"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1, 10L, "r@10"), (1, 15L, "r@15"), (2, 99L, "r@99"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "p1" -> Some("r@10"),   // simultaneous right row IS visible
      "p2" -> Some("r@15"),
      "p3" -> Some("r@15"),
      "p4" -> None))          // right row is in the future
  }

  test("forward direction picks earliest right row at-or-after, null when none") {
    val left = Seq(
      (1, 10L, "p1"), (1, 20L, "p2"), (1, 16L, "p3"), (2, 100L, "p4"))
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1, 10L, "r@10"), (1, 15L, "r@15"), (1, 25L, "r@25"), (2, 99L, "r@99"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("rv"),
        forward = true)
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "p1" -> Some("r@10"),   // simultaneous right row IS visible
      "p2" -> Some("r@25"),
      "p3" -> Some("r@25"),
      "p4" -> None))          // right row is in the past
  }

  test("multi-column payload with legitimate NULLs carries as one row") {
    val left = Seq((1, 3L, "p")).toDF("k", "ts", "lv")
    val right = Seq(
      (1, 1L, Some("A"), Some(5)), (1, 2L, Some("B"), None: Option[Int]))
      .toDF("k", "ts", "status", "price")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts",
      Seq("status", "price"))
      .select("status", "price").head()
    // must be the WHOLE t=2 row (B, null) — not a mix (B, 5)
    assert(out.getString(0) == "B" && out.isNullAt(1))
  }

  test("matches a correlated-subquery model on real events") {
    val ev = graft.queries.Tables.events(spark, TestSpark.Sf0001)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us", $"event_id")
    val r = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts_us")
      .agg(org.apache.spark.sql.functions.max($"event_id").as("le"))
    val got = AsOfJoin.asOf(p, r, Seq("user_id"), "ts_us", "ts_us", Seq("le"))
      .select("event_id", "le").as[(Long, Option[Long])].collect().toMap
    // model: driver-side max over clicks at-or-before
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts_us", $"event_id")
      .as[(Long, Long, Long)].collect()
    val purchases = p.as[(Long, Long, Long)].collect()
    purchases.foreach { case (u, ts, eid) =>
      val expect = clicks.filter(c => c._1 == u && c._2 <= ts)
        .sortBy(c => (c._2, c._3)).lastOption.map(_._3)
      assert(got(eid) == expect, s"purchase $eid")
    }
  }
}
