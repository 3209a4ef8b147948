package graft.model

/** ClickHouse DDL text generation — string-parity with the reference's
  * most heavily golden-tested surface (`src/schema_converter.py`, pinned
  * by `tests/test_schema_converter.py:180-270`).
  *
  * The Spark engine deliberately replaces the ClickHouse sink (TypeMapper
  * maps source types to Spark types instead), so nothing in the engine
  * EXECUTES these statements; this module exists so parity is checkable
  * against the reference's own fixtures byte-for-byte — a migration off
  * the reference can diff the DDL both tools would emit for the same
  * introspected schema. Output format is therefore not ours to restyle:
  * each generator reproduces the reference's text exactly (4-space column
  * indent, `IF NOT EXISTS`, backtick quoting, ORDER BY fallback to the
  * first column, `tuple()` for empty relations).
  */
object ClickHouseDdl {

  /** MySQL base type → ClickHouse type
    * (`src/schema_converter.py:3-37`). Unknown types degrade to String
    * (`:49`, pinned by test_unknown_type_defaults_to_string). */
  val TypeMap: Map[String, String] = Map(
    "tinyint" -> "Int8", "smallint" -> "Int16", "mediumint" -> "Int32",
    "int" -> "Int32", "integer" -> "Int32", "bigint" -> "Int64",
    "float" -> "Float32", "double" -> "Float64",
    "decimal" -> "Decimal", "numeric" -> "Decimal",
    "bit" -> "UInt64", "bool" -> "Bool", "boolean" -> "Bool",
    "date" -> "Date", "datetime" -> "DateTime", "timestamp" -> "DateTime",
    "time" -> "String", "year" -> "UInt16",
    "char" -> "String", "varchar" -> "String",
    "binary" -> "String", "varbinary" -> "String",
    "tinyblob" -> "String", "blob" -> "String",
    "mediumblob" -> "String", "longblob" -> "String",
    "tinytext" -> "String", "text" -> "String",
    "mediumtext" -> "String", "longtext" -> "String",
    "enum" -> "String", "set" -> "String", "json" -> "String")

  /** `convert_column_type` (`src/schema_converter.py:40-53`): Decimal
    * carries (precision, scale) with 10/0 defaults; nullable columns wrap
    * in Nullable(T). */
  def chType(c: ColumnInfo): String = {
    val base = c.dataType.toLowerCase match {
      case "decimal" | "numeric" =>
        val p = c.numericPrecision.getOrElse(10)
        val s = c.numericScale.getOrElse(0)
        s"Decimal($p, $s)"
      case t => TypeMap.getOrElse(t, "String")
    }
    if (c.isNullable) s"Nullable($base)" else base
  }

  private def q(id: String): String = s"`$id`"

  private def orderBy(schema: TableSchema): String =
    if (schema.primaryKeys.nonEmpty)
      schema.primaryKeys.map(q).mkString(", ")
    else if (schema.columns.nonEmpty) q(schema.columns.head.name)
    else "tuple()"

  private def createSql(schema: TableSchema, database: String,
      extraCols: Seq[String], engine: String): String = {
    val cols = schema.columns.map(c => s"    ${q(c.name)} ${chType(c)}") ++
      extraCols.map(c => s"    $c")
    s"""CREATE TABLE IF NOT EXISTS ${q(database)}.${q(schema.name)}
       |(
       |${cols.mkString(",\n")}
       |)
       |ENGINE = $engine
       |ORDER BY (${orderBy(schema)})""".stripMargin
  }

  /** `generate_create_table` (`src/schema_converter.py:55-80`). */
  def generateTable(schema: TableSchema, database: String): String =
    createSql(schema, database, Seq.empty, "MergeTree()")

  /** `generate_cdc_table` (`src/schema_converter.py:85-122`): the same
    * relation plus `_version`/`_deleted` under ReplacingMergeTree —
    * exactly the meta columns [[graft.operators.CdcTransform]] stamps and
    * [[graft.operators.LiveView]] resolves. */
  def generateCdcTable(schema: TableSchema, database: String): String =
    createSql(schema, database,
      Seq(s"${q(SchemaModel.VersionCol)} UInt64",
        s"${q(SchemaModel.DeletedCol)} UInt8"),
      s"ReplacingMergeTree(${SchemaModel.VersionCol})")

  /** `generate_cdc_view` (`src/schema_converter.py:124-150`) — the
    * `<table>_live` view text whose SEMANTICS LiveView.live implements. */
  def generateView(tableName: String, database: String,
      schema: TableSchema): String = {
    val cols = schema.columns.map(c => q(c.name)).mkString(", ")
    s"""CREATE OR REPLACE VIEW ${q(database)}.${q(tableName + "_live")} AS
       |SELECT $cols
       |FROM ${q(database)}.${q(tableName)} FINAL
       |WHERE ${SchemaModel.DeletedCol} = 0""".stripMargin
  }

  /** `generate_drop_table` (`src/schema_converter.py:82-83`). */
  def generateDrop(tableName: String, database: String): String =
    s"DROP TABLE IF EXISTS ${q(database)}.${q(tableName)}"
}
