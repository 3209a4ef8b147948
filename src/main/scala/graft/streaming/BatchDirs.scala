package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.HadoopFs

/** Per-batch directory ownership for at-least-once foreachBatch sinks:
  * batch N writes `<root>/b<N>` with mode=overwrite, so a replayed batch
  * overwrites ITS OWN output wholesale instead of appending a second
  * copy to a shared directory — the [[SinkRetry]] idempotency pattern,
  * factored for the at-ingest family (near-dup flags, contamination
  * flags, band indexes). Readers union the batch directories; an
  * `excludeAtOrAbove` bound lets a probe see strictly-earlier batches
  * only (so a replayed batch never collides with its own first
  * attempt's state). */
private[streaming] object BatchDirs {

  def dir(root: String, batchId: Long): String = s"$root/b$batchId"

  /** Batch directories under `root`, ascending; `excludeAtOrAbove`
    * bounds to ids strictly below it. */
  def dirs(root: String, excludeAtOrAbove: Option[Long] = None)
      : Seq[String] =
    HadoopFs.list(root)
      .filter(f => f.isDirectory && f.getPath.getName.startsWith("b"))
      .flatMap(f => f.getPath.getName.drop(1).toLongOption
        .map(id => (id, f.getPath.toString)))
      .filter { case (id, _) => excludeAtOrAbove.forall(id < _) }
      .sortBy(_._1).map(_._2)

  /** Union of the batch directories; None when none exist. Each dir is
    * loaded separately and unioned — a multi-root parquet read over
    * dirs that are THEMSELVES partitioned (e.g. the band index's
    * `band=N` subdirs) trips CONFLICTING_DIRECTORY_STRUCTURES. */
  def read(s: SparkSession, root: String,
           excludeAtOrAbove: Option[Long] = None): Option[DataFrame] = {
    val d = dirs(root, excludeAtOrAbove)
    if (d.isEmpty) None
    else Some(d.map(s.read.parquet(_)).reduce(_.unionByName(_)))
  }
}
