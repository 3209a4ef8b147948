package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Harness table access with schema normalization.
  *
  * The driver's `events` table stores `ts` as parquet TIMESTAMP(NANOS),
  * which Spark 4 rejects by default (PARQUET_TYPE_ILLEGAL). We flip the
  * runtime conf `spark.sql.legacy.parquet.nanosAsLong` and normalize to a
  * µs-epoch long column `ts_us` (truncation — identical to DuckDB's ns→µs
  * handling, so oracles use `epoch_us(ts)`). Queries use `ts_us` only.
  */
object Tables {

  /** NOTE: sets `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * SESSION (runtime conf is session-global, not per-read): every later
    * read in the same session — including ones outside these helpers —
    * will see TIMESTAMP(NANOS) parquet columns as nanos-epoch LONGs.
    * That is the engine-wide contract here (Main sets it at session
    * construction too); the per-read set only makes fresh test/Verify
    * sessions self-sufficient. */
  def read(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with a normalized `ts_us` (µs epoch, LongType) column, robust
    * to whether the session read `ts` as nanos-long or as timestamp. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val df = read(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos as long — integral division (`div`), NOT
        // `/` (double division loses exactness above 2^53 ns)
        df.withColumn("ts_us", expr("ts div 1000"))
      case _ =>
        df.withColumn("ts_us", unix_micros(col("ts")))
    }
  }
}
