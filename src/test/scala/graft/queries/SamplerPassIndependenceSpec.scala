package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The family-wide `pass` contract (r9 ADVICE #7): every sampler takes a
  * deterministic pass/salt parameter so repeated draws — bootstrap
  * resamples, per-epoch subsets — are INDEPENDENT, not replays of one
  * frozen sample. Pins, per sampler:
  *   (1) re-drawability — pass 2 is a different set than pass 1;
  *   (2) same-law — pass 2 has the same size/rate structure as pass 1
  *       (the distribution depends on the data, never on the salt);
  *   (3) near-independence — the overlap of the two draws is far below
  *       identity, in the band an independent redraw would produce.
  * Bounds are generous (≥4σ) so the spec pins the contract, not the RNG. */
class SamplerPassIndependenceSpec extends AnyFunSuite
    with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf0001

  private def ids(df: DataFrame): Set[Long] =
    df.select(col("doc_id").cast("long")).as[Long].collect().toSet

  test("weightedSample: pass 2 is a same-size, non-identical, " +
      "low-overlap redraw") {
    val a = ids(Curation.weightedSample(spark, dir, pass = 1))
    val b = ids(Curation.weightedSample(spark, dir, pass = 2))
    assert(a.size == Curation.WSampleK && b.size == Curation.WSampleK)
    val overlap = (a intersect b).size
    // independent weight-proportional draws of 50 from 500 share
    // E = Σ p_i² ≈ 5–12 docs (weights are doc lengths, mildly skewed);
    // identity would be 50. Anything ≤ 30 is a genuine redraw.
    assert(overlap < 30, s"overlap $overlap of ${a.size} — draws coupled")
    assert(overlap != a.size, "pass 2 replayed pass 1 exactly")
  }

  test("reservoirSample: per-source size law holds on both passes and " +
      "the draws are near-independent") {
    val p1 = Warehouse.reservoirSample(spark, dir, pass = 1)
    val p2 = Warehouse.reservoirSample(spark, dir, pass = 2)
    val sizes1 = p1.groupBy($"source").count().as[(String, Long)]
      .collect().toMap
    val sizes2 = p2.groupBy($"source").count().as[(String, Long)]
      .collect().toMap
    assert(sizes1 == sizes2, "per-source draw sizes differ across passes")
    // 20 sources × 3-of-25: E[overlap] = 20 · 9/25 = 7.2, σ ≈ 2.5;
    // identity would be 60. The 4σ band keeps flake risk ~1e-4.
    val overlap = (ids(p1) intersect ids(p2)).size
    assert(overlap <= 18, s"overlap $overlap of 60 — passes coupled")
  }

  test("temperatureSample: rates match across passes; memberships are " +
      "non-identical redraws") {
    val byLang1 = TrainingData.temperatureSample(spark, dir, pass = 1)
      .select($"lang", $"n_orig", $"n_sampled")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    val byLang2 = TrainingData.temperatureSample(spark, dir, pass = 2)
      .select($"lang", $"n_orig", $"n_sampled")
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3))
      .toMap
    assert(byLang1.keySet == byLang2.keySet)
    byLang1.foreach { case (lang, (nOrig, s1)) =>
      val (nOrig2, s2) = byLang2(lang)
      assert(nOrig == nOrig2, s"$lang n_orig differs across passes")
      // n_sampled ~ Binomial(n_l, p_l); the largest lang at sf0.001 has
      // n≈218, p≈0.54 → σ≈7.4. 4σ, floored at 8 for the tiny langs.
      val tol = math.max(8.0, 4.0 * math.sqrt(nOrig.toDouble * 0.25))
      assert(math.abs(s1 - s2) <= tol,
        s"$lang rate drifted across passes: $s1 vs $s2 (tol $tol)")
    }
    // membership independence, re-derived with the sampler's own salt
    // scheme ("tmp<pass>|" over doc_id): at p = 1/2 two independent
    // indicators co-occur on ≈ n/4 docs — identity would be n/2.
    def members(pass: Int): Set[Long] = ids(
      Tables.read(spark, dir, "documents").select(col("doc_id"))
        .filter(graft.functions.PortableHash.hash32(
          col("doc_id").cast("string"), s"tmp$pass|") % 1000000 < 500000))
    val (mA, mB) = (members(1), members(2))
    val (n, both) = (500.0, (mA intersect mB).size.toDouble)
    // E[both] = n/4 = 125, σ ≈ sqrt(n·3/16) ≈ 9.7; 4σ band.
    assert(math.abs(both - n / 4) <= 4 * math.sqrt(n * 3 / 16),
      s"co-membership $both vs expected ${n / 4} — salts not independent")
  }
}
