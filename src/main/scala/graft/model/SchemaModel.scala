package graft.model

import org.apache.spark.sql.types._

/** Column metadata as introspected from a source catalog.
  * Parity with `ColumnInfo` (`src/mysql_client.py:35-44`): name, type,
  * nullability, key role, extra, precision/scale/length. */
final case class ColumnInfo(
    name: String,
    dataType: String,                       // raw MySQL type string
    isNullable: Boolean,
    columnKey: String = "",                 // "PRI" | "UNI" | "MUL" | ""
    extra: String = "",                     // e.g. "auto_increment"
    numericPrecision: Option[Int] = None,
    numericScale: Option[Int] = None,
    characterMaximumLength: Option[Int] = None) {
  def isPrimaryKey: Boolean = columnKey == "PRI"
}

/** Named relation with ordered columns and an ordered primary key.
  * Parity with `TableSchema` (`src/mysql_client.py:47-51`). */
final case class TableSchema(
    name: String,
    columns: Seq[ColumnInfo],
    primaryKeys: Seq[String]) {

  /** Dedup/sort key: the primary key, else the first column — mirroring the
    * reference's ORDER BY fallback (`src/schema_converter.py:65-69`). */
  def orderKey: Seq[String] =
    if (primaryKeys.nonEmpty) primaryKeys else columns.take(1).map(_.name)

  /** Spark schema. Nullability carried per-field
    * (`src/schema_converter.py:51-52` Nullable(T) parity). */
  def toStructType: StructType = StructType(columns.map { c =>
    StructField(c.name,
      TypeMapper.toSparkType(c.dataType, c.numericPrecision, c.numericScale),
      nullable = c.isNullable)
  })

  /** CDC variant: appends `_version` / `_deleted` meta columns, mirroring
    * `generate_cdc_table` (`src/schema_converter.py:85-122`; columns
    * appended `:101-103`). `_version` is a µs-epoch stamp → LongType;
    * `_deleted` is 0/1 → IntegerType. */
  def toCdcStructType: StructType = StructType(
    toStructType.fields ++ Seq(
      StructField(SchemaModel.VersionCol, LongType, nullable = false),
      StructField(SchemaModel.DeletedCol, IntegerType, nullable = false)))
}

object SchemaModel {
  /** CDC meta column names (`src/schema_converter.py:101-103`). */
  val VersionCol = "_version"
  val DeletedCol = "_deleted"
  /** Deterministic tie-break for duplicate `_version` values (SURVEY.md
    * §2.7: the reference stamps one version per event-batch, so dups are
    * possible; we add an ingest sequence for a stable survivor). */
  val SeqCol = "_ingest_seq"

  /** Recover a [[TableSchema]] from a Spark `StructType` (the harness's
    * parquet footer stands in for INFORMATION_SCHEMA — SURVEY.md §1.3). */
  def fromStructType(
      name: String, st: StructType, primaryKeys: Seq[String]): TableSchema = {
    val cols = st.fields.map { f =>
      val (ty, p, s) = f.dataType match {
        case ByteType          => ("tinyint", None, None)
        case ShortType         => ("smallint", None, None)
        case IntegerType       => ("int", None, None)
        case LongType          => ("bigint", None, None)
        case FloatType         => ("float", None, None)
        case DoubleType        => ("double", None, None)
        case d: DecimalType    => ("decimal", Some(d.precision), Some(d.scale))
        case BooleanType       => ("boolean", None, None)
        case DateType          => ("date", None, None)
        case TimestampType     => ("datetime", None, None)
        case BinaryType        => ("blob", None, None)
        case _                 => ("text", None, None)
      }
      ColumnInfo(f.name, ty, f.nullable,
        columnKey = if (primaryKeys.contains(f.name)) "PRI" else "",
        numericPrecision = p, numericScale = s)
    }
    TableSchema(name, cols.toSeq, primaryKeys)
  }
}

/** Identifier validation gate — injection defense parity with
  * `validate_identifier` (`src/mysql_client.py:13-32`,
  * `src/clickhouse_client.py:12-31`): `^[a-zA-Z_][a-zA-Z0-9_]*$`.
  * Spark parameterization makes injection moot; kept for parity of
  * rejection behavior (SURVEY.md §2.3 P7). */
object Identifiers {
  private val Valid = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  def isValid(id: String): Boolean =
    id != null && id.nonEmpty && Valid.matches(id)

  /** Throws `IllegalArgumentException` on invalid identifiers, like the
    * reference raises `ValueError` (`src/mysql_client.py:29-32`). */
  def validate(id: String, what: String = "identifier"): String = {
    require(isValid(id), s"Invalid $what: '$id'")
    id
  }
}
