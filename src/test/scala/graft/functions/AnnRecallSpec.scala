package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.TrainingData

/** ANN quality: the LSH scale path must actually find neighbors. The gate
  * pins LSH top-k as exactly oracle-reproducible; this spec pins its
  * RECALL against the brute-force ground truth, so a future knob change
  * (more planes, fewer probes) that silently guts recall fails here
  * instead of shipping. */
class AnnRecallSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topkSets(name: String) =
    TrainingData.queries(name)(spark, TestSpark.Sf0001)
      .as[(Long, Int, Long, java.math.BigDecimal)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap

  test("PQ shortlist+re-rank ANN recall ≥ 0.6 vs brute force on sf0.001") {
    val brute = topkSets("x_ann_brute_topk")
    val pq = topkSets("x_ann_pq_topk")
    assert(brute.keySet == pq.keySet)
    val recalls = brute.map { case (q, truth) =>
      pq(q).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@${TrainingData.AnnK} = $mean%.3f " +
      s"(per-query: ${recalls.map(r => f"$r%.2f").mkString(", ")})")
    assert(mean >= 0.6, f"mean recall $mean%.3f below floor")
  }

  test("banded multi-probe LSH ANN recall ≥ 0.7 vs brute force on sf0.001") {
    val brute = topkSets("x_ann_brute_topk")
    val lsh = topkSets("x_ann_lsh_topk")
    assert(brute.keySet == lsh.keySet) // every query answered
    val recalls = brute.map { case (q, truth) =>
      lsh(q).count(truth).toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@${TrainingData.AnnK} = $mean%.3f " +
      s"(per-query: ${recalls.map(r => f"$r%.2f").mkString(", ")})")
    // Hamming-2 query-side probing raised this from the Hamming-1 floor
    // of 0.5 — a knob regression that guts recall fails here
    assert(mean >= 0.7, f"mean recall $mean%.3f below floor")
  }
}
