package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** At-ingest BENCHMARK-contamination screening over a document stream —
  * the streaming form of the batch decontamination pair
  * (`x_decontaminate_apply` cuts leaked train docs;
  * `x_contamination_report` audits the eval side): eval-set leakage is
  * caught the moment a document arrives, instead of by a later batch
  * sweep over the landed corpus. The same probe-an-index-in-foreachBatch
  * shape as [[StreamNearDup]], with one structural difference: the
  * benchmark fingerprint set is FIXED for the life of the stream (eval
  * suites change by release, not by micro-batch), so no state accrues —
  * which is exactly what makes the per-document verdict independent of
  * batch boundaries, and therefore adjudicable by a purely relational
  * oracle.
  *
  * Per micro-batch:
  *   1. winnow fingerprints for the batch's documents (the
  *      [[graft.functions.WinnowExprs]] native kernel — one codegen'd
  *      scan, same fingerprints as the batch gates);
  *   2. one `left_semi` equi-join of the batch's fingerprints against
  *      the benchmark set — broadcast: an eval suite is MBs where the
  *      corpus is TBs;
  *   3. a document is flagged when MORE than `ratio` of its fingerprints
  *      hit the benchmark (the `x_decontaminate_apply` rule, same
  *      threshold semantics); docs too short to fingerprint can show no
  *      evidence and pass clean;
  *   4. flagged batch rows append to the output.
  *
  * Scale shape: the only shuffle per batch is the per-doc fingerprint
  * re-group (partial-agg'd, batch-bounded); the benchmark join is
  * broadcast, the corpus never re-scans, and nothing grows with stream
  * length. At 100 TB/day ingest this runs as a side-car on the landing
  * pipeline; the batch apply/report gates remain the weekly audit.
  */
object StreamContamination {

  /** Runs the stream to completion, landing `keepCols :+
    * is_contaminated(0/1 long)` per document under `outDir`. `evalFpDir`
    * must hold the benchmark's DISTINCT fingerprints as a parquet table
    * with one `fp` long column. */
  def run(stream: DataFrame, idCol: String, textCol: String,
          keepCols: Seq[String], evalFpDir: String, outDir: String,
          checkpointDir: String, k: Int, w: Int, ratio: Double,
          trigger: org.apache.spark.sql.streaming.Trigger): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val fps = batch.select(col(idCol),
            explode(array_distinct(graft.functions.WinnowExprs
              .winnowMinsNative(col(textCol), k, w))).as("fp"))
          .persist()
        val hits = fps
          .join(broadcast(s.read.parquet(evalFpDir)), Seq("fp"), "left_semi")
          .groupBy(col(idCol)).agg(count(lit(1)).as("_hit"))
        val flagged = fps.groupBy(col(idCol)).agg(count(lit(1)).as("_nf"))
          .join(hits, Seq(idCol), "left")
          .filter(coalesce(col("_hit"), lit(0L)).cast("double") /
            col("_nf") > ratio)
          .select(col(idCol), lit(1L).as("_c"))
        // per-batch-owned overwrite dir (the SinkRetry pattern): an
        // at-least-once replay rewrites its own output wholesale instead
        // of appending a second copy
        batch.join(flagged, Seq(idCol), "left")
          .select((keepCols.map(col) :+
            coalesce(col("_c"), lit(0L)).as("is_contaminated")): _*)
          .write.mode("overwrite")
          .parquet(BatchDirs.dir(outDir, batchId))
        fps.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** All landed flagged rows (union of the per-batch directories). */
  def landed(s: org.apache.spark.sql.SparkSession, outDir: String)
      : DataFrame =
    BatchDirs.read(s, outDir).getOrElse(
      sys.error(s"no batches landed under $outDir"))
}
