package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction — the lake-maintenance operator every append-only
  * CDC sink needs (each micro-batch append of
  * [[graft.streaming.CdcPipeline]] adds files; thousands of tiny files
  * degrade scan planning and open-cost at scale).
  *
  * Sizing: target output file count = ceil(total bytes / targetFileBytes),
  * written via `coalesce` when shrinking (no shuffle — each output task
  * reads several input files) or `repartition` when the input is fewer,
  * larger files than requested (rebalance needs the shuffle). Content is
  * preserved exactly; only the file layout changes.
  */
object Compaction {

  final case class CompactionResult(
      path: String, filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, rows: Long)

  private def parquetFiles(fs: FileSystem, dir: Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    if (fs.exists(dir))
      fs.listStatus(dir)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    else Array.empty

  /** Compact one parquet table directory in place (write-new-then-swap via
    * a sibling temp dir — readers of the old files are unaffected until
    * the atomic-ish rename).
    *
    * `cluster`: optional clustering columns — the rewrite then
    * repartitions on them and sorts within tasks, so output files cover
    * disjoint key ranges and row groups carry tight min/max stats for
    * those columns. This is how a stats-pruned layout (e.g. the
    * [[graft.streaming.StreamAnnIndex]] cell-clustered deltas) is
    * re-established after many appends WITHOUT changing readers: the
    * schema and the pruning path are identical before and after. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              cluster: Seq[String] = Nil): CompactionResult = {
    // all filesystem IO through Hadoop FileSystem: the table dir may be
    // local, HDFS or object storage (rename is atomic on the first two;
    // the object-store caveat is the same one the commit markers carry)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery: a previous compact that died between its two renames
    // leaves the data intact in `<dir>._compact_old` with no live dir —
    // restore it before proceeding instead of requiring manual repair
    val oldLeftover = new Path(path + "._compact_old")
    if (!fs.exists(dir) && fs.exists(oldLeftover))
      require(fs.rename(oldLeftover, dir),
        s"crash-recovery rename failed: $oldLeftover -> $dir")
    val before = parquetFiles(fs, dir)
    // refuse layouts this flat compactor doesn't understand (partitioned /
    // nested tables) rather than silently rewriting them into one file
    require(before.nonEmpty,
      s"$path has no top-level .parquet files — not a flat table dir " +
        "(partitioned layouts need per-partition compaction)")
    val bytes = before.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val out =
      if (cluster.nonEmpty) {
        import org.apache.spark.sql.functions.col
        df.repartition(targetFiles, cluster.map(col): _*)
          .sortWithinPartitions(cluster.map(col): _*)
      }
      else if (targetFiles < before.length) df.coalesce(targetFiles)
      else df.repartition(targetFiles)
    val tmp = new Path(path + "._compact_tmp")
    out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()
    // swap: old dir is moved ASIDE first (not deleted) so a crash or
    // failed rename never leaves the table missing; it is removed only
    // after the new layout is in place. Concurrent appends during the
    // compact window are still the caller's responsibility to pause.
    val old = new Path(path + "._compact_old")
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(dir, old), s"rename failed: $dir -> $old")
    if (!fs.rename(tmp, dir)) {
      val restored = fs.rename(old, dir) // roll back
      throw new IllegalStateException(
        s"rename failed: $tmp -> $dir (original ${if (restored) "restored" else s"left at $old"})")
    }
    fs.delete(old, true)
    CompactionResult(path, before.length,
      parquetFiles(fs, dir).length, bytes, rows)
  }
}
