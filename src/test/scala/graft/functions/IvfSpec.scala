package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** IVF ANN: structural invariants against the exact brute-force baseline.
  * (Exact result equality is the oracle query's job — x_ann_ivf_topk.) */
class IvfSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  private lazy val emb =
    graft.queries.Tables.read(spark, TestSpark.Sf0001, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(2)) ->
      (r.getInt(1), r.getDecimal(3))).toMap

  test("probed results score identically to brute force; ranks are dense") {
    val ivf = SimilarityOps.ivfAnnTopK(emb, queries, "vec_id", "embedding",
      k = 5, centroidMod = 16, nprobe = 2)
    val brute = SimilarityOps.bruteForceTopK(emb, queries, "vec_id",
      "embedding", k = emb.count().toInt) // full ranking, no cutoff
    val got = asMap(ivf)
    assert(got.nonEmpty)
    val exact = asMap(brute)
    // every IVF (query, neighbor) pair exists in the full exact ranking
    // with the SAME cosine — IVF may miss neighbors (recall < 1), it must
    // never misscore one
    val misscored = got.collect {
      case (pair, (_, cos)) if exact(pair)._2.compareTo(cos) != 0 => pair
    }
    assert(misscored.isEmpty, s"misscored pairs: ${misscored.take(3).toList}")
    // per query: ranks 1..n with no gaps, at most k rows
    ivf.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"),
        min(col("rk")).as("mn"))
      .collect().foreach { r =>
        assert(r.getLong(1) <= 5 && r.getInt(3) == 1 &&
          r.getInt(2).toLong == r.getLong(1), s"ranks not dense: $r")
      }
  }

  test("nprobe = cell count ⇒ IVF top-k = brute-force top-k exactly") {
    // probing every cell removes the recall loss — candidates = whole
    // corpus (minus self), so the top-k must equal the exact baseline
    val centroids = emb.filter(col("vec_id") % 16 === 0).count().toInt
    val ivf = SimilarityOps.ivfAnnTopK(emb, queries, "vec_id", "embedding",
      k = 5, centroidMod = 16, nprobe = centroids)
    val brute = SimilarityOps.bruteForceTopK(emb, queries, "vec_id",
      "embedding", k = 5)
    assert(asMap(ivf) == asMap(brute))
  }
}
