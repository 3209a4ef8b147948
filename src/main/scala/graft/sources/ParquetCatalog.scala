package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{Identifiers, SchemaModel, TableSchema}

/** Source-catalog operations over a directory of parquet tables (one
  * `<table>.parquet` per relation — the harness layout, TESTDATA.md).
  *
  * Re-expresses the reference's MySQL catalog surface:
  *   - S1 table enumeration (`get_tables`, `src/mysql_client.py:86-89`)
  *   - S2 schema introspection (`get_table_schema`,
  *     `src/mysql_client.py:91-130`) — here the parquet footer plays
  *     INFORMATION_SCHEMA; PKs come from a convention map since parquet has
  *     no key metadata
  *   - S3 projection scan (`fetch_data_batched`,
  *     `src/mysql_client.py:140-162`) — `read(...).select(cols)`; Catalyst
  *     prunes the projection into the parquet scan (`ReadSchema`), which is
  *     the declarative analog of the reference baking the column list into
  *     its SELECT (`src/mysql_client.py:147-151`). Batching/streaming
  *     (`SSDictCursor`, 50k-row batches) maps to parquet row-group
  *     streaming inside partitioned tasks — bounded memory per task, and
  *     intra-table parallelism the reference lacks (`README.md:462`).
  *   - A1 source row count (`get_row_count`, `src/mysql_client.py:132-138`)
  */
final class ParquetCatalog(spark: SparkSession, dir: String) {

  /** Conventional primary keys for the harness tables (parquet carries no
    * key metadata; mirrors the reference reading COLUMN_KEY='PRI'). */
  val primaryKeys: Map[String, Seq[String]] = ParquetCatalog.HarnessPks

  /** S1: enumerate tables (`SHOW TABLES` analog). Listed through Hadoop
    * FileSystem so a non-local catalog dir (hdfs:, s3a:) enumerates the
    * same way the local harness layout does. */
  def listTables(): Seq[String] =
    HadoopFs.list(dir)
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted

  def tableExists(table: String): Boolean = {
    Identifiers.validate(table, "table name")
    HadoopFs.exists(s"$dir/$table.parquet")
  }

  /** Full-table scan. Projection/filters composed on the returned frame are
    * pushed into the scan by Catalyst. */
  def read(table: String): DataFrame = {
    Identifiers.validate(table, "table name")
    // TIMESTAMP(NANOS) columns (events.ts) are rejected by Spark 4 unless
    // read as longs — same normalization as graft.queries.Tables. NOTE:
    // runtime conf is session-global, so this affects every later read in
    // the session (the engine-wide contract; see Tables.read scaladoc).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$table.parquet")
  }

  /** S3 with explicit projection, P1 parity. */
  def scan(table: String, columns: Seq[String]): DataFrame = {
    columns.foreach(Identifiers.validate(_, "column name"))
    read(table).select(columns.map(org.apache.spark.sql.functions.col): _*)
  }

  /** S2: introspect table schema (+ conventional PKs). */
  def tableSchema(table: String): TableSchema =
    SchemaModel.fromStructType(table, read(table).schema,
      primaryKeys.getOrElse(table, Seq.empty))

  /** A1: source row count. */
  def rowCount(table: String): Long = read(table).count()
}

object ParquetCatalog {
  /** PK convention for the harness star schema (TESTDATA.md). */
  val HarnessPks: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "events"     -> Seq("event_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
}
