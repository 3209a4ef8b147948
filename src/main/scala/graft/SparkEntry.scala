package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Curation, Embeddings, EventOps, GraphOps, PipelineE2e, PipelineOps, Procurement, ReferenceOps, SqlSurface, TrainingData, Warehouse}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY.md §2 +
  * extension surface); `oracleSql` holds the DuckDB-equivalent ANSI SQL the
  * driver runs over the same parquet tables. Column names/aliases match on
  * both sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The CDC live view: ReplacingMergeTree+FINAL semantics as a window
    * dedup (SURVEY.md §3.3). */
  def entry(spark: SparkSession): DataFrame =
    ReferenceOps.liveView(spark, "/root/testdata/sf0.001")

  def queryGroups: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    ReferenceOps.queries,
    Analytics.queries,
    TrainingData.queries,
    Curation.queries,
    Embeddings.queries,
    EventOps.queries,
    GraphOps.queries,
    PipelineOps.queries,
    Warehouse.queries,
    SqlSurface.queries,
    Procurement.queries,
    PipelineE2e.queries)

  def oracleGroups: Seq[Map[String, String]] = Seq(
    ReferenceOps.oracle,
    Analytics.oracle,
    TrainingData.oracle,
    Curation.oracle,
    Embeddings.oracle,
    EventOps.oracle,
    GraphOps.oracle,
    PipelineOps.oracle,
    Warehouse.oracle,
    SqlSurface.oracle,
    Procurement.oracle,
    PipelineE2e.oracle)

  /** One entry per implemented operator from SURVEY.md §2. Every result
    * passes through [[graft.queries.OracleSafe.canon]] so the verify
    * surface only exposes driver-hashable types (see its scaladoc). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryGroups.reduce(_ ++ _).map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) =>
        graft.queries.OracleSafe.canon(fn(s, dir)))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracleGroups.reduce(_ ++ _)
}
