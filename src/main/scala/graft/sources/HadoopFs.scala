package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Marker/listing IO through Hadoop [[FileSystem]] — the portable
  * substrate for the commit-marker protocols ([[graft.streaming.MultiTableCdc]],
  * [[graft.streaming.SinkRetry]], [[graft.streaming.StreamScd2]]): the
  * same code path resolves `file:`, `hdfs:` and `s3a:` URIs, so the
  * local-FS behavior the specs pin is exactly what runs against HDFS in
  * production. One caveat stays real and documented at the call sites:
  * on an eventually-consistent object store a marker file alone is not a
  * visibility barrier — production there uses a real table-format commit
  * protocol (Delta/Iceberg), which these modules model.
  *
  * The Hadoop `Configuration` comes from the active/default Spark
  * session when one exists (so `fs.*` overrides apply), falling back to
  * a vanilla config for session-less unit contexts.
  */
object HadoopFs {

  private def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(path: String): FileSystem = new Path(path).getFileSystem(conf)

  /** Direct children of `dir`; empty when the dir doesn't exist. */
  def list(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    val f = fs(dir)
    if (f.exists(p)) f.listStatus(p).toIndexedSeq else Seq.empty
  }

  /** Create an empty marker file (parents included). The stream-level
    * create is atomic on HDFS and local FS: readers see the marker fully
    * or not at all — there is no partial empty file. */
  def touch(path: String): Unit = {
    val p = new Path(path)
    val f = fs(path)
    f.mkdirs(p.getParent)
    f.create(p, true).close()
  }

  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  /** Whole-file read as UTF-8 (watermarks/markers are tiny by design). */
  def readString(path: String): String = {
    val in = fs(path).open(new Path(path))
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Create-or-overwrite a small UTF-8 file (parents included). */
  def writeString(path: String, content: String): Unit = {
    val p = new Path(path)
    val f = fs(path)
    f.mkdirs(p.getParent)
    val out = f.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Publish `tmp` as `dst` via delete-then-rename. Rename is atomic on
    * local FS and HDFS; the delete→rename window leaves NO dst, never a
    * partial one — callers must treat a missing file as their safe
    * initial state (the watermark contract: missing = replay from
    * origin, still at-least-once). */
  def publish(tmp: String, dst: String): Unit = {
    val f = fs(dst)
    val d = new Path(dst)
    if (f.exists(d)) f.delete(d, false)
    require(f.rename(new Path(tmp), d), s"rename $tmp -> $dst failed")
    ()
  }
}
