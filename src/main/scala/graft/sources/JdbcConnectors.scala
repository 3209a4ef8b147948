package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.model.{GraftConfig, Identifiers, SourceConfig, TargetConfig}

/** Production-path connectors: the same operators the harness runs over
  * parquet, bound to real JDBC endpoints (MySQL source, ClickHouse/any
  * JDBC target). The harness cannot exercise these (zero-egress container,
  * no DB) — they are the pluggability seam: `SnapshotReplicator`-style
  * pipelines take `DataFrame`s, so swapping `ParquetCatalog.read` for
  * `JdbcSource.read` changes no operator code.
  *
  * Scale design vs the reference:
  *   - the reference scans each table on ONE server-side cursor
  *     (`src/mysql_client.py:149-150`, single-threaded by design,
  *     `README.md:462`); here a numeric/temporal `partitionColumn` splits
  *     the scan into `numPartitions` concurrent range queries, each
  *     executor partition owning its own connection (fixes the shared-
  *     connection thread hazard noted in SURVEY.md §3.1);
  *   - `fetchsize` maps the reference's streaming-batch semantics
  *     (50k rows, `src/config.py:72`) onto the JDBC driver's cursor;
  *   - predicates/projections composed on the returned frame are pushed
  *     into the remote SQL by Catalyst (JDBC pushdown), the declarative
  *     analog of the reference baking column lists into its SELECT.
  */
final class JdbcSource(spark: SparkSession, cfg: SourceConfig,
                       fetchSize: Int = 50000,
                       urlOverride: Option[String] = None) {

  /** MySQL by default; `urlOverride` points the same operator surface at
    * any JDBC engine (the test suite drives it against embedded Derby). */
  def url: String = urlOverride.getOrElse(
    s"jdbc:mysql://${cfg.host}:${cfg.port}/${cfg.database}")

  private def base = spark.read.format("jdbc")
    .option("url", url)
    .option("user", cfg.user)
    .option("password", cfg.password)
    .option("fetchsize", fetchSize)

  /** S1: catalog listing via INFORMATION_SCHEMA (parity with
    * `get_tables`, `src/mysql_client.py:86-89`). */
  def listTables(): DataFrame =
    base.option("dbtable",
      s"(SELECT table_name FROM information_schema.tables " +
        s"WHERE table_schema = '${Identifiers.validate(cfg.database, "database")}') t")
      .load()

  /** S2: column metadata incl. key role and precision — the
    * INFORMATION_SCHEMA.COLUMNS query of `get_table_schema`
    * (`src/mysql_client.py:91-130`), ordered by ORDINAL_POSITION. */
  def tableColumns(table: String): DataFrame = {
    Identifiers.validate(table, "table name")
    Identifiers.validate(cfg.database, "database")
    base.option("dbtable",
      s"""(SELECT column_name, data_type, is_nullable, column_key, extra,
         |  numeric_precision, numeric_scale, character_maximum_length
         |  FROM information_schema.columns
         |  WHERE table_schema = '${cfg.database}' AND table_name = '$table'
         |  ORDER BY ordinal_position) c""".stripMargin).load()
  }

  /** S3: full-table scan, single stream (reference parity). */
  def read(table: String): DataFrame =
    base.option("dbtable", Identifiers.validate(table, "table name")).load()

  /** S3 at scale: range-partitioned parallel scan (the capability the
    * reference explicitly lacks). */
  def readPartitioned(table: String, partitionColumn: String,
                      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    base.option("dbtable", Identifiers.validate(table, "table name"))
      .option("partitionColumn",
        Identifiers.validate(partitionColumn, "column name"))
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}

/** K1/K2/K3 sink side: batch appends over JDBC; per-partition connections,
  * `batchsize` mapping the reference's insert batching
  * (`src/clickhouse_client.py:88-105`). */
final class JdbcSink(cfg: TargetConfig, batchSize: Int = 50000,
                     urlOverride: Option[String] = None) {

  def url: String = urlOverride.getOrElse(
    s"jdbc:clickhouse://${cfg.host}:${cfg.port}/${cfg.database}")

  def write(df: DataFrame, table: String,
            mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("dbtable", Identifiers.validate(table, "table name"))
      .option("batchsize", batchSize)
      .mode(mode)
      .save()
}

object JdbcConnectors {
  /** Wire a config into the connector pair (mode dispatch O1 lives with
    * the caller: snapshot → SnapshotReplicator-style batch; cdc →
    * CdcPipeline streaming). */
  def fromConfig(spark: SparkSession, cfg: GraftConfig): (JdbcSource, JdbcSink) =
    (new JdbcSource(spark, cfg.source, cfg.replication.batchSize),
     new JdbcSink(cfg.target, cfg.replication.batchSize))
}
