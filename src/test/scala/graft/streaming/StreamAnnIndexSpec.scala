package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins the streaming IVF index (t23): the index accrued over
  * micro-batches must answer top-k BYTE-IDENTICALLY to the one-pass
  * batch IVF (the batch-invariance the frozen quantizer buys), and the
  * probe must PRUNE the index scan to its cells — the bounded probe
  * cell set reaches the parquet reader as a pushed In(_cell) filter
  * over the cell-clustered sorted deltas. */
class StreamAnnIndexSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  test("streamed index ≡ one-pass batch IVF; probe scan pushes In(_cell)") {
    val sf = TestSpark.Sf0001
    val e = graft.queries.Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val batch = graft.functions.SimilarityOps.ivfAnnTopK(
        e, e.filter(col("vec_id") < graft.queries.TrainingData.AnnQueryIds),
        "vec_id", "embedding", graft.queries.TrainingData.AnnK,
        graft.queries.TrainingData.IvfCentroidMod,
        graft.queries.TrainingData.IvfNProbe)
      .collect().map(_.toString).sorted.toSeq
    val gate = graft.queries.PipelineOps.streamAnnIndex(spark, sf)
    val plan = gate.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(_cell"),
      s"probe cell set not pushed into the index scan:\n$plan")
    val streamed = gate.collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      "streamed-index probe diverged from the one-pass batch IVF")
  }

  test("index compaction: fewer files, identical probe answers, pruning intact") {
    val sf = TestSpark.Sf0001
    val e = graft.queries.Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cent = graft.functions.SimilarityOps.ivfCentroids(
      e, "vec_id", "embedding", graft.queries.TrainingData.IvfCentroidMod)
    val centDir = graft.GateCache.tempDir("sai_cmp_cent").toString + "/c"
    cent.write.parquet(centDir)
    // simulate many appended micro-batch deltas
    val idxDir = graft.GateCache.tempDir("sai_cmp_idx").toString + "/idx"
    val m = e.agg(org.apache.spark.sql.functions.max(col("vec_id")))
      .head().getLong(0)
    for (i <- 0 until 4) {
      graft.functions.SimilarityOps.ivfAssignCells(
          e.filter(col("vec_id") % 4 === i), "vec_id", "embedding",
          spark.read.parquet(centDir))
        .repartition(col("_cell")).sortWithinPartitions(col("_cell"))
        .write.mode("append").parquet(idxDir)
    }
    assert(m > 0)
    def probe() = StreamAnnIndex.probeTopK(spark, idxDir,
        e.filter(col("vec_id") < graft.queries.TrainingData.AnnQueryIds),
        "vec_id", "embedding", spark.read.parquet(centDir),
        graft.queries.TrainingData.AnnK,
        graft.queries.TrainingData.IvfNProbe)
    val before = probe().collect().map(_.toString).sorted.toSeq
    val r = StreamAnnIndex.compact(spark, idxDir)
    assert(r.filesAfter < r.filesBefore,
      s"compaction did not shrink the file count: $r")
    val after = probe()
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("In(_cell"), "pruning lost after compaction")
    assert(after.collect().map(_.toString).sorted.toSeq == before,
      "compaction changed probe answers")
  }
}
