package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot-key aggregation at scale.
  *
  * A plain `groupBy(key).agg(...)` on 100 TB with a zipfian key puts the
  * hottest key's entire volume on one reduce task. Salting splits each key
  * into `saltBuckets` sub-keys for a first (well-distributed) partial
  * aggregation, then a second tiny aggregation merges the sub-results —
  * the classic two-phase pattern AQE's skew handling applies to joins,
  * expressed manually for aggregations.
  *
  * Only ALGEBRAIC aggregates (reassociatable: sum/count/min/max) can be
  * merged this way; the API takes (partial, merge) expression pairs.
  * Results are identical to the unsalted plan — the harness pins that with
  * a plain GROUP BY oracle.
  */
object SkewOps {

  final case class SaltedAgg(partial: Column => Column, merge: Column => Column)

  val SumAgg: SaltedAgg = SaltedAgg(sum, sum)
  val CountAgg: SaltedAgg = SaltedAgg(c => count(c), sum)
  val MinAgg: SaltedAgg = SaltedAgg(min, min)
  val MaxAgg: SaltedAgg = SaltedAgg(max, max)

  /** Salted equi-join for skewed keys whose small side is still too big
    * to broadcast: the skewed (big) side gets a positional salt, the
    * small side is replicated once per salt bucket (`explode(sequence)` —
    * generated map-side, no shuffle of its own), and the join key becomes
    * (key, salt) — a hot key's probe rows now spread over `saltBuckets`
    * reduce tasks instead of one. Semantically identical to the plain
    * join (the harness pins that with a plain-join oracle); costs
    * `saltBuckets`× the small side's shuffle volume, the standard trade.
    * The shuffle_hash hint keeps the demo on the exchange path AQE would
    * otherwise shortcut with a broadcast at test scale. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 16): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    salted.join(replicated.hint("shuffle_hash"), keys :+ "_salt")
      .drop("_salt")
  }

  /** Two-phase salted aggregation: `aggs` maps output column name →
    * (input column, agg pair). Salt comes from the row's position
    * (`monotonically_increasing_id`), which distributes a hot key's rows
    * across buckets UNCONDITIONALLY — value-derived salts collapse when a
    * hot key carries constant values, defeating the mitigation. (The salt
    * never affects the merged result, so task-retry nondeterminism of the
    * id is harmless.) */
  def saltedAgg(df: DataFrame, keys: Seq[String],
                aggs: Map[String, (Column, SaltedAgg)],
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(aggs.head._2._2.partial(aggs.head._2._1).as(aggs.head._1),
        aggs.tail.map { case (name, (in, a)) => a.partial(in).as(name) }.toSeq: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2.merge(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (name, (_, a)) => a.merge(col(name)).as(name) }.toSeq: _*)
  }
}
