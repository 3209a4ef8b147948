package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Harness table access with schema normalization.
  *
  * The driver's `events` table has stored `ts` as parquet TIMESTAMP(NANOS)
  * (which Spark 4 rejects by default — PARQUET_TYPE_ILLEGAL — so we flip
  * `spark.sql.legacy.parquet.nanosAsLong`) and, since the 2026-08-13
  * regeneration, as TIMESTAMP(MICROS) without timezone (which Spark 4
  * infers as TIMESTAMP_NTZ by default). We normalize every variant to a
  * µs-epoch long column `ts_us` (identical to DuckDB's `epoch_us(ts)` on
  * the same file, given the UTC session). Queries use `ts_us` only.
  */
object Tables {

  /** NOTE: sets two read confs on the SESSION (runtime conf is
    * session-global, not per-read): `nanosAsLong=true` so legacy
    * TIMESTAMP(NANOS) parquet reads as nanos-epoch LONG instead of
    * failing, and `inferTimestampNTZ.enabled=false` so timezone-less
    * parquet timestamps read as plain `TimestampType` (UTC session ⇒
    * value-identical instants) engine-wide. That is the contract here
    * (the harness mains set both at session construction too); the
    * per-read set only makes fresh test/Verify sessions self-sufficient. */
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** [[read]] for COMPUTE-HEAVY per-row consumers (dense vector math,
    * nested-loop scoring): when the on-disk layout cannot feed at least
    * half the session's cores — fewer files than that, every file small
    * enough (≤ 128 MB, the universal writer default) to hold a single
    * row group, i.e. genuinely unsplittable — repartition right after
    * the read so the downstream math runs on every core instead of one
    * scan task per file (optimization guide §2.5: "one huge unsplittable
    * file … repartition immediately after the read"). The exchange moves
    * this table's bytes once; on a production layout (many files, or
    * multi-row-group files) the condition is false and the read is
    * returned untouched — nothing here is tuned to local mode. Measured
    * on the harness embeddings table (one file): the brute-force cosine
    * join and the PQ ADC scan drop ~2-3×; NOT used for plain relational
    * scans, where the same exchange measurably costs more than the
    * single-task scan work it parallelizes. */
  def readCompute(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = read(s, dir, name)
    val cores = s.sparkContext.defaultParallelism
    // Layout probe through the Hadoop FileSystem API (r15 ADVICE: the
    // java.io.File form silently never fired on hdfs://, s3://, or even
    // file: URIs — exactly the one-huge-file production layouts the
    // remedy exists for). Probe failures degrade to the untouched read.
    val root = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val files: Array[org.apache.hadoop.fs.FileStatus] =
      try {
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(root)) Array.empty
        else fs.listStatus(root)
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
      } catch { case _: java.io.IOException => Array.empty }
    val splittable = files.exists(_.getLen > 128L * 1024 * 1024)
    if (files.nonEmpty && files.length < cores / 2 && !splittable)
      df.repartition(cores)
    else df
  }

  /** `df` plus a normalized µs-epoch long column `outName` derived from
    * its `ts` column, robust to all three encodings a session may have
    * read it under: nanos-long (legacy conf), TIMESTAMP, or TIMESTAMP_NTZ
    * (a foreign session may have inferred NTZ before the conf above was
    * set — handle it rather than fail analysis). */
  def tsUs(df: DataFrame, outName: String = "ts_us"): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // nanos as long — integral division (`div`), NOT
        // `/` (double division loses exactness above 2^53 ns)
        df.withColumn(outName, expr("ts div 1000"))
      case _: TimestampNTZType => // naive µs: cast is exact under the
        // pinned UTC session, matching DuckDB's epoch_us on the same value
        df.withColumn(outName, unix_micros(col("ts").cast(TimestampType)))
      case _ =>
        df.withColumn(outName, unix_micros(col("ts")))
    }

  /** `events` with the normalized `ts_us` column — see [[tsUs]]. */
  def events(s: SparkSession, dir: String): DataFrame =
    tsUs(read(s, dir, "events"))
}
