package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SchemaModel.{DeletedCol, SeqCol, VersionCol}
import graft.operators.{CdcTransform, Collapsing, LiveView}
import graft.sources.ParquetCatalog

/** Harness queries exercising the reference-parity operator surface
  * (SURVEY.md §2). Each entry in [[queries]] has a DuckDB oracle in
  * [[oracle]] with identical column names/types (aliases matched on both
  * sides — driver compares after sorting columns by name).
  *
  * The `events` table plays the binlog change stream (TESTDATA.md):
  * op mapping `signup→I`, `error→D`, else `U`; key = `user_id`;
  * `_version` = µs epoch of `ts`; tie-break = `event_id` (ingest seq).
  */
object ReferenceOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(s, dir, name)

  /** Derive the change-stream frame from `events` (ts normalized to µs). */
  def changes(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("op",
      when(col("event_type") === "signup", CdcTransform.Insert)
        .when(col("event_type") === "error", CdcTransform.Delete)
        .otherwise(CdcTransform.Update))

  /** Stamped CDC rows (the versioned-upsert table contents). */
  def stamped(s: SparkSession, dir: String): DataFrame =
    CdcTransform.stamp(
      changes(s, dir), opCol = "op", seqCol = "event_id", version = col("ts_us"))

  /** Flagship: the `<table>_live` dedup view over the stamped stream
    * (W1+P2+P3 — ClickHouse FINAL + `_deleted=0` semantics). */
  def liveView(s: SparkSession, dir: String): DataFrame =
    LiveView.live(
      stamped(s, dir).select("user_id", "event_type", "value", "props",
        VersionCol, SeqCol, DeletedCol),
      pks = Seq("user_id"), tieBreak = Some(SeqCol))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3/P1: projection + predicate pushed into the parquet scan.
    "s3_scan_projection" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_quantity") > 45)),

    // A1/A2: COUNT(*).
    "a1_count_star" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),

    // S1 + A1 + A4: catalog enumeration with per-table counts — the
    // count-reconciliation surface (`src/replicator.py:74-81`).
    "a4_table_counts" -> ((s, dir) => {
      val cat = new ParquetCatalog(s, dir)
      cat.listTables().map { name =>
        t(s, dir, name)
          .agg(count(lit(1)).as("cnt"))
          .select(lit(name).as("table_name"), col("cnt"))
      }.reduce(_ unionByName _)
    }),

    // P6/F1/F2 + §2.6 union: stamped change rows, aggregated per op for a
    // stable oracle shape (counts exact; sums over decimal-cast values).
    "p6_cdc_stamp" -> ((s, dir) =>
      stamped(s, dir)
        .groupBy(col("op"), col(DeletedCol).as("deleted"))
        .agg(count(lit(1)).as("n_rows"),
             sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"),
             max(col(VersionCol)).as("max_version"))),

    // W1/P2/P3/K5: the live view itself.
    "w1_live_view" -> ((s, dir) => liveView(s, dir)),

    // W1 alternative physical form: max_by aggregation — must agree with
    // the window form; exposed so the oracle pins both.
    "w1_live_view_aggform" -> ((s, dir) =>
      LiveView.dedupLatestAgg(
          stamped(s, dir).select("user_id", "event_type", "value", "props",
            VersionCol, SeqCol, DeletedCol),
          pks = Seq("user_id"), tieBreak = Some(SeqCol))
        .filter(col(DeletedCol) === 0)
        .drop(VersionCol, DeletedCol, SeqCol)),

    // CollapsingMergeTree FINAL (the sibling ClickHouse engine family):
    // the stream's sign-changelog, sum-of-signs collapsed — must produce
    // the exact ReplacingMergeTree live rows, so the oracle is w1's.
    "x_collapsing_final" -> ((s, dir) => {
      val st = stamped(s, dir).select("user_id", "event_type", "value",
        "props", VersionCol, SeqCol, DeletedCol)
      val payload = Seq("event_type", "value", "props")
      Collapsing.collapseFinal(
        Collapsing.changelog(st, pks = Seq("user_id"), payload = payload),
        pks = Seq("user_id"), payload = payload)
    })
  )

  val oracle: Map[String, String] = Map(
    "s3_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,

    "a1_count_star" -> "SELECT count(*) AS cnt FROM lineitem",

    "a4_table_counts" ->
      """SELECT 'customer' AS table_name, count(*) AS cnt FROM customer
        |UNION ALL SELECT 'documents', count(*) FROM documents
        |UNION ALL SELECT 'embeddings', count(*) FROM embeddings
        |UNION ALL SELECT 'events', count(*) FROM events
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'region', count(*) FROM region
        |UNION ALL SELECT 'supplier', count(*) FROM supplier""".stripMargin,

    "p6_cdc_stamp" ->
      """SELECT CASE WHEN event_type='signup' THEN 'I'
        |            WHEN event_type='error' THEN 'D' ELSE 'U' END AS op,
        |       CASE WHEN event_type='error' THEN 1 ELSE 0 END AS deleted,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |       max(epoch_us(ts)) AS max_version
        |FROM events GROUP BY 1, 2""".stripMargin,

    "w1_live_view" -> LiveViewOracle,
    "w1_live_view_aggform" -> LiveViewOracle,
    // cross-engine-family equivalence: Collapsing FINAL over the derived
    // sign-changelog must reproduce the Replacing FINAL rows exactly
    "x_collapsing_final" -> LiveViewOracle
  )

  /** Shared by w1 (read path), its aggform, and the stateful write-path
    * gate (t6) — all three must produce the same survivors. */
  lazy val LiveViewOracle =
    """SELECT user_id, event_type, value, props FROM (
      |  SELECT user_id, event_type, value, props,
      |         CASE WHEN event_type='error' THEN 1 ELSE 0 END AS _deleted,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1 AND _deleted = 0""".stripMargin
}
