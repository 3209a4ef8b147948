package graft.model

import org.apache.spark.sql.types._

/** MySQL type-string → Spark `DataType` mapping.
  *
  * Re-expresses the reference's static MySQL→ClickHouse map
  * (`src/schema_converter.py:3-37`, conversion logic `:41-54`) as a total
  * function onto Spark's type system. Differences (all documented in
  * SURVEY.md §1.2):
  *   - decimal precision is clamped to Spark's max 38 (ClickHouse allows 76;
  *     the reference never clamps — `src/schema_converter.py:44-47`);
  *   - `bit` → `LongType` (no unsigned 64-bit in Spark; overflow edge is the
  *     same class of caveat the reference documents for UNSIGNED,
  *     `README.md:590`);
  *   - binary/blob → `BinaryType` (a strict improvement over the reference's
  *     `String`);
  *   - unknown types fall back to `StringType`
  *     (`src/schema_converter.py:49`).
  *
  * Nullability is carried on `StructField`, not the `DataType` (Spark has no
  * `Nullable(T)` wrapper — `src/schema_converter.py:51-52` parity lives in
  * [[SchemaModel.toStructType]]).
  */
object TypeMapper {

  /** Default decimal precision/scale when MySQL reports none
    * (`src/schema_converter.py:44-47`). */
  val DefaultDecimalPrecision = 10
  val DefaultDecimalScale     = 0

  /** Map a lower-cased MySQL base type (no length suffix) to Spark.
    * Total: anything unrecognized → `StringType`.
    *
    * UNSIGNED is detected from the type string ("int unsigned" is how
    * MySQL reports it) and each unsigned integer WIDENS to the next Spark
    * type that holds its full range — closing the reference's documented
    * overflow limitation ("UNSIGNED INT mapped to signed types — may
    * overflow on large values", `README.md:590`): u8→Short, u16→Int,
    * u24→Int (max 16,777,215 fits), u32→Long, and u64→Decimal(20,0), the
    * only type that holds values above 2^63−1. The widened columns cost
    * one size class at rest; silent negative wraparound at 100 TB costs
    * a re-backfill. */
  def toSparkType(
      mysqlType: String,
      numericPrecision: Option[Int] = None,
      numericScale: Option[Int] = None): DataType = {
    // Strip length/enum payload: "varchar(255)" -> "varchar",
    // "decimal(10,2)" -> "decimal" (reference lower-cases the same way,
    // `src/schema_converter.py:42`, `src/mysql_client.py:117`).
    val lower = mysqlType.trim.toLowerCase
    val unsigned = lower.contains("unsigned")
    val base = lower.takeWhile(c => c != '(' && c != ' ')
    base match {
      case "tinyint"             => if (unsigned) ShortType else ByteType
      case "smallint"            => if (unsigned) IntegerType else ShortType
      case "mediumint"           => IntegerType // u24 max fits IntegerType
      case "int" | "integer"     => if (unsigned) LongType else IntegerType
      case "bigint" =>
        if (unsigned) DecimalType(20, 0) else LongType
      case "float"                          => FloatType
      case "double"                         => DoubleType
      case "decimal" | "numeric" =>
        val p = math.min(numericPrecision.getOrElse(DefaultDecimalPrecision),
                         DecimalType.MAX_PRECISION)
        val s = math.min(numericScale.getOrElse(DefaultDecimalScale), p)
        DecimalType(p, s)
      case "bit"                            => LongType
      case "bool" | "boolean"               => BooleanType
      case "date"                           => DateType
      case "datetime" | "timestamp"         => TimestampType
      case "time"                           => StringType // Spark has no TIME
      case "year"                           => ShortType
      case "char" | "varchar"               => StringType
      case "binary" | "varbinary"           => BinaryType
      case "tinyblob" | "blob" | "mediumblob" | "longblob" => BinaryType
      case "tinytext" | "text" | "mediumtext" | "longtext" => StringType
      case "enum" | "set"                   => StringType
      case "json"                           => StringType
      case _                                => StringType // fallback, :49
    }
  }
}
