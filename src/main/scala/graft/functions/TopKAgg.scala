package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded-memory top-k as a typed `Aggregator` (the Dataset-native UDAF
  * surface: zero/reduce/merge/finish with an encoded partial buffer that
  * rides Spark's two-phase aggregation).
  *
  * Why not `sort_array(collect_list(...))[0:k]`: collect_list's partial
  * state is THE WHOLE GROUP — at 100 TB a hot group buffers gigabytes per
  * task before the slice throws the bulk away. This aggregator's partial
  * is never more than k longs, map-side combine keeps it k per partition,
  * and `merge` is a k-bounded sorted merge — the memory profile of a
  * counter, not a materialization. That asymmetry (identical answer,
  * incomparable state size) is the whole reason the Aggregator API exists
  * over "compose built-ins".
  *
  * Determinism: the result is the top-k MULTISET of values, sorted
  * descending — ties are by value, so which tied ROW contributed is
  * unobservable. Buffer kept sorted descending at every step.
  */
class TopKAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] =
    if (b.length == k && a <= b(k - 1)) b // below the bar — O(1) reject
    else {
      // sortWith, NOT sortBy(-_): -Long.MinValue overflows back to
      // MinValue, which would rank the smallest long as the largest
      val out = (b :+ a).sortWith(_ > _)
      if (out.length > k) out.take(k) else out
    }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    // k-bounded merge of two descending runs
    val out = new Array[Long](math.min(k, b1.length + b2.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      if (j >= b2.length || (i < b1.length && b1(i) >= b2(j))) {
        out(n) = b1(i); i += 1
      } else {
        out(n) = b2(j); j += 1
      }
      n += 1
    }
    out
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object TopKAgg {
  /** Column-API handle: `df.groupBy(...).agg(TopKAgg.topK(3)(col))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.scalaLong)
}
