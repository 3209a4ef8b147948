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
}
