package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-digest set membership — Spark's native (codegen'd, mergeable)
  * bloom machinery, the same kernel Catalyst's runtime-filter rewrite
  * injects for `x_bloom_join`, exposed here as an EXPLICIT operator: the
  * cross-RUN dedup shape. A 100 TB corpus reduces to one numBits/8-byte
  * binary digest; tomorrow's delta probes that digest without touching
  * yesterday's data — membership with zero false NEGATIVES (every true
  * dup is a candidate, guaranteed by construction) and a bounded false
  * POSITIVE rate that an exact fingerprint semi-join then clears. The
  * two-phase bloom-prefilter → exact-confirm pipeline is the standard
  * production pattern: the digest does the O(corpus)-avoidance, the
  * confirm join touches only candidate rows.
  *
  * The aggregate is partial-agg'd (per-partition blooms OR-merge at the
  * final stage), so digest construction is one corpus scan with a
  * numBits-sized shuffle payload per partition, and the digest itself
  * broadcasts to the probe side.
  */
object BloomOps {

  /** Aggregate a bloom digest (binary) over `hash` (must be LongType —
    * pair with `xxhash64`). */
  def bloomAgg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(Bridge.expression(hash),
      org.apache.spark.sql.catalyst.expressions.Literal(estimatedItems),
      org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Membership probe of `hash` against a digest built by [[bloomAgg]]. */
  def mightContain(bloom: Column, hash: Column): Column =
    Bridge.column(BloomFilterMightContain(Bridge.expression(bloom),
      Bridge.expression(hash)))
}
