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

  private lazy val bruteTruth = topkSets("x_ann_brute_topk")

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val got = df.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rs = bruteTruth.map { case (q, truth) =>
      got.getOrElse(q, Set.empty[Long]).count(truth).toDouble / truth.size }
    rs.sum / rs.size
  }

  private def corpus = graft.queries.Tables.read(spark, TestSpark.Sf0001,
    "embeddings")
  private def annQueries = corpus
    .filter($"vec_id" < TrainingData.AnnQueryIds)

  test("IVF recall@5 is monotone in nprobe and clears pinned floors " +
      "(r10 verdict item 4: floors at several parameter points so a " +
      "refactor cannot silently trade recall)") {
    val rec = Seq(1, 2, 4, 8).map { np =>
      np -> recallOf(SimilarityOps.ivfAnnTopK(corpus, annQueries,
        "vec_id", "embedding", TrainingData.AnnK,
        TrainingData.IvfCentroidMod, np))
    }.toMap
    info(rec.toSeq.sortBy(_._1)
      .map { case (np, r) => f"nprobe=$np: $r%.3f" }.mkString("  "))
    // candidate cells at nprobe+1 are a superset and re-rank is exact ⇒
    // per-query recall is monotone; a violation means the probe ranking
    // or scoring broke
    assert(rec(1) <= rec(2) + 1e-9 && rec(2) <= rec(4) + 1e-9 &&
      rec(4) <= rec(8) + 1e-9, s"IVF recall not monotone in nprobe: $rec")
    // Absolute levels are MODEST by construction, and pinned as such:
    // the gate's quantizer is a deterministic corpus subset (~31 cells
    // over 500 near-isotropic synthetic vectors) chosen so the DuckDB
    // oracle reproduces the result exactly — on data with no cluster
    // structure, probing 2/31 cells simply cannot contain most true
    // top-5 sets. The floors pin the measured curve (0.16/0.22/0.38/
    // 0.54 at r11) against regression; the recall LEVERS are a trained
    // quantizer (x_kmeans_embed is the trainer) and nprobe, and the
    // high-recall ANN path of record is banded LSH (0.98 below).
    assert(rec(1) >= 0.10, f"nprobe=1 recall ${rec(1)}%.3f below floor")
    assert(rec(2) >= 0.18, f"nprobe=2 recall ${rec(2)}%.3f below floor")
    assert(rec(4) >= 0.30, f"nprobe=4 recall ${rec(4)}%.3f below floor")
    assert(rec(8) >= 0.45, f"nprobe=8 recall ${rec(8)}%.3f below floor")
  }

  test("PQ recall@5 clears pinned floors across m, and is monotone in " +
      "the shortlist depth") {
    def pq(m: Int, shortlist: Int) =
      recallOf(SimilarityOps.pqAnnTopK(corpus, annQueries,
        "vec_id", "embedding", TrainingData.AnnK, m, TrainingData.PqKsub,
        TrainingData.EmbeddingDim, shortlist))
    // subspace sweep at the gate's shortlist: coarser codes (m=4: 16-dim
    // subvectors) quantize harder; finer codes (m=16: 4-dim) recover
    val byM = Seq(4, 8, 16).map(m => m -> pq(m, TrainingData.PqShortlist))
      .toMap
    info(byM.toSeq.sortBy(_._1)
      .map { case (m, r) => f"m=$m: $r%.3f" }.mkString("  "))
    assert(byM(4) >= 0.40, f"m=4 recall ${byM(4)}%.3f below floor")
    assert(byM(8) >= 0.60, f"m=8 recall ${byM(8)}%.3f below floor")
    assert(byM(16) >= 0.60, f"m=16 recall ${byM(16)}%.3f below floor")
    // shortlist sweep at the gate's m: a true top-k member in the ADC
    // shortlist always survives the exact re-rank, so recall = |truth ∩
    // shortlist| / k is monotone in the shortlist
    val s10 = pq(TrainingData.PqM, 10)
    val s50 = byM(TrainingData.PqM)
    info(f"shortlist=10: $s10%.3f  shortlist=50: $s50%.3f")
    assert(s10 <= s50 + 1e-9,
      f"PQ recall not monotone in shortlist: $s10%.3f > $s50%.3f")
    assert(s10 >= 0.40, f"shortlist=10 recall $s10%.3f below floor")
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
