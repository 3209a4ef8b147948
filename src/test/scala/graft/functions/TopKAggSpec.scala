package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the bounded-buffer top-k Aggregator: algebraic laws of
  * reduce/merge against brute force under arbitrary split points (the
  * property Spark's partial aggregation relies on), the k-bound on every
  * intermediate buffer, and gate-vs-collect_list equality on real data. */
class TopKAggSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reduce/merge equal brute force under every split of a deterministic stream; buffers never exceed k") {
    val agg = new TopKAgg(3)
    // seeded LCG — deterministic, collision-rich (mod 50 forces ties)
    val xs = Iterator.iterate(42L)(x => (x * 6364136223846793005L + 1442695040888963407L))
      .take(200).map(x => math.floorMod(x, 50L)).toSeq
    val brute = xs.sortBy(-_).take(3)
    // fold the whole stream
    val folded = xs.foldLeft(agg.zero)(agg.reduce)
    assert(folded.toSeq == brute)
    // every two-way split: reduce each half independently, then merge —
    // the partial-aggregation path must agree with the sequential one
    (0 to xs.length by 17).foreach { cut =>
      val (l, r) = xs.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(bl.length <= 3 && br.length <= 3, "partial buffer exceeded k")
      assert(agg.merge(bl, br).toSeq == brute, s"split at $cut diverged")
      assert(agg.merge(br, bl).toSeq == brute, "merge must be symmetric")
    }
    // groups smaller than k return what exists, descending
    assert(Seq(7L, 9L).foldLeft(agg.zero)(agg.reduce).toSeq == Seq(9L, 7L))
  }

  test("Long.MinValue ranks smallest, not largest (sortBy(-_) negation " +
      "overflow — r12 review finding)") {
    val agg = new TopKAgg(1)
    assert(Seq(Long.MinValue, 5L).foldLeft(agg.zero)(agg.reduce).toSeq
      == Seq(5L))
    assert(Seq(5L, Long.MinValue).foldLeft(agg.zero)(agg.reduce).toSeq
      == Seq(5L))
    val agg2 = new TopKAgg(2)
    assert(Seq(Long.MinValue, Long.MaxValue, 0L)
      .foldLeft(agg2.zero)(agg2.reduce).toSeq == Seq(Long.MaxValue, 0L))
  }

  test("x_topk_udaf gate equals the collect_list formulation on real data") {
    val dir = TestSpark.Sf0001
    val gate = graft.queries.Warehouse.queries("x_topk_udaf")(spark, dir)
      .as[(String, String)].collect().sortBy(_._1).toSeq
    val direct = graft.queries.Tables.read(spark, dir, "orders")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(slice(reverse(sort_array(collect_list(col("cents")))), 1, 3).as("t"))
      .select(col("o_orderpriority"), concat_ws(",", col("t")))
      .as[(String, String)].collect().sortBy(_._1).toSeq
    assert(gate == direct)
    assert(gate.nonEmpty)
  }
}
