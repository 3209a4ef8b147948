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
}
