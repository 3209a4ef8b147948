package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Semantics checks for the embedding-compression/clustering operators
  * (cross-engine exactness is the oracle gate's job). */
class EmbeddingsSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("x_embed_quantize_int8: error bounded by half a quantization step; full accounting") {
    val emb = Tables.read(spark, TestSpark.Sf0001, "embeddings")
    val labelCounts = emb.groupBy(col("label")).count()
      .as[(Int, Long)].collect().toMap
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    // the widest per-dim quantization step over the corpus
    val maxScale = emb
      .select(posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("p"))
      .agg(((max(col("v").cast("double")) - min(col("v").cast("double"))) /
        Embeddings.QuantLevels).as("s"))
      .agg(max(col("s"))).as[Double].head()
    val got = Embeddings.queries("x_embed_quantize_int8")(spark, TestSpark.Sf0001)
      .as[(Int, Long, Long, Long)].collect()
    assert(got.map(_._1).toSet == labelCounts.keySet)
    got.foreach { case (label, nComp, sumErr, maxErr) =>
      assert(nComp == labelCounts(label) * dim, s"label $label components")
      assert(sumErr >= 0 && maxErr >= 0)
      // linear quantization rounds to the nearest level: error ≤ step/2
      // (+1 nano for the error's own half-up rounding)
      assert(maxErr <= math.round(maxScale / 2 * 1e9) + 1,
        s"label $label max err $maxErr vs step ${maxScale}")
      assert(sumErr >= maxErr)
    }
  }

  private def round6(x: Double): Double =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("x_kmeans_embed: full partition, argmax assignment vs JVM reference, live iteration") {
    val e = Embeddings.emb(spark, TestSpark.Sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val got = Embeddings.queries("x_kmeans_embed")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._2).sum == n) // every vector in exactly one cluster
    assert(got.map(_._1).forall(c => c >= 0 && c < Embeddings.KmeansK))

    // the iteration must actually move assignments (else the gate would
    // only ever exercise a fixpoint)
    val c0 = e.filter(col("vec_id") < Embeddings.KmeansK)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), v => v.cast("double")).as("cvec"))
    val a1 = Embeddings.assign(e, c0).select("vec_id", "cid")
      .as[(Long, Long)].collect().toMap
    val c1 = Embeddings.centroidsOf(
      Embeddings.assign(e, c0).select(col("cid"), col("embedding")))
    val a2 = Embeddings.assign(e, c1).select("vec_id", "cid")
      .as[(Long, Long)].collect().toMap
    assert(a1.exists { case (v, c) => a2(v) != c },
      "iteration 2 moved no assignments")

    // JVM reference: each vector's final cluster is the argmax rounded
    // cosine over the iteration-1 centroids (cid tie-break)
    val cents = c1.select(col("cid"), col("cvec"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val vecs = e.as[(Long, Seq[Float])].collect()
    def cos(v: Seq[Float], c: Seq[Double]): Double = {
      var dot = 0.0; var nv = 0.0; var nc = 0.0; var i = 0
      while (i < c.length) {
        dot += v(i).toDouble * c(i); nv += v(i).toDouble * v(i).toDouble
        nc += c(i) * c(i); i += 1
      }
      dot / (math.sqrt(nv) * math.sqrt(nc))
    }
    vecs.foreach { case (vid, v) =>
      val best = cents.map { case (cid, c) => (round6(cos(v, c)), cid) }
        .maxBy { case (s, cid) => (s, -cid) }._2
      assert(a2(vid) == best, s"vec $vid assigned ${a2(vid)}, expected $best")
    }
  }

  test("x_semdedup: full accounting, min-id survives, drops match in-cluster brute force") {
    val e = Embeddings.emb(spark, TestSpark.Sf0001)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val got = Embeddings.queries("x_semdedup")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == n) // every vector counted in one cluster
    got.foreach { case (cid, members, dropped, survivors) =>
      assert(survivors == members - dropped, s"cluster $cid arithmetic")
      // the lowest id of a cluster is never the higher id of a pair
      assert(survivors >= 1, s"cluster $cid lost its representative")
    }

    // JVM brute-force reference: recompute the final assignment, score
    // every in-cluster pair, drop the higher id of each above-threshold
    // pair — per-cluster drop counts must match the operator exactly
    val c0 = e.filter(col("vec_id") < Embeddings.KmeansK)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), v => v.cast("double")).as("cvec"))
    val a2 = Embeddings.assign(e,
        Embeddings.centroidsOf(
          Embeddings.assign(e, c0).select(col("cid"), col("embedding"))))
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    val vecs = e.as[(Long, Seq[Float])].collect().sortBy(_._1)
    def cosF(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.flatMap { case (id1, v1) =>
      vecs.collect { case (id2, v2)
        if id1 < id2 && a2(id1) == a2(id2) &&
          cosF(v1, v2) > TrainingData.CosDupThreshold => (a2(id2), id2) }
    }.distinct.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    got.foreach { case (cid, _, dropped, _) =>
      assert(dropped == expected.getOrElse(cid, 0L),
        s"cluster $cid dropped $dropped vs brute ${expected.getOrElse(cid, 0L)}")
    }

    // recall floor vs the GLOBAL all-pairs dup set: SemDeDup only scores
    // pairs whose members share a k-means cell, so cross-cell dups are
    // missed by design — the cost/recall trade every bucketed family
    // documents (AnnRecallSpec's pattern). Precision is 1 by construction
    // (every scored pair is re-checked with the exact cosine). Measured
    // 0.30 (20/66) here: the harness threshold 0.4 calls merely-similar
    // pairs dups, and those scatter across cells; the paper's regime
    // (τ≈0.95, near-identical pairs) co-clusters almost surely. Floor at
    // 0.25 pins against regression; cross-cell recall is the LSH
    // family's job (x_embed_dedup_lsh_apply).
    val globalPairs = vecs.flatMap { case (id1, v1) =>
      vecs.collect { case (id2, v2)
        if id1 < id2 && cosF(v1, v2) > TrainingData.CosDupThreshold =>
          (id1, id2) }
    }
    val found = globalPairs.count { case (id1, id2) => a2(id1) == a2(id2) }
    val recall = found.toDouble / globalPairs.length
    assert(recall >= 0.25,
      s"SemDeDup pair recall $recall ($found/${globalPairs.length}) < 0.25")
  }
}
