package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, DataType, DateType, DecimalType, MapType, StructType, TimestampNTZType, TimestampType}

/** Driver-canonical output projection for the correctness gate.
  *
  * The verify harness stringifies a DECIMAL read from Spark parquet
  * differently from the same value read out of DuckDB (scale-preserving
  * `Decimal` string, e.g. "100.10"/"123.450000", vs float repr "100.1"/
  * "123.45") — identical values then hash differently. Round-1 evidence:
  * all 18 hash mismatches, and only those, had a decimal output column
  * containing at least one value whose decimal string differs from its
  * float repr; all values were bit-identical when both sides were read
  * through the same engine. DATE/TIMESTAMP columns only ever co-occurred
  * with those failures, so they are treated as unsafe too.
  *
  * Policy: the verify surface exposes only STRING / BOOLEAN / integer /
  * DOUBLE columns. All exact arithmetic stays in DECIMAL inside the query;
  * this projection applies one final correctly-rounded DECIMAL→DOUBLE cast
  * (IEEE nearest — identical in Spark and DuckDB for our magnitudes, where
  * the unscaled value is < 2^53) and renders DATE/TIMESTAMP as their
  * canonical string form (identical "yyyy-MM-dd [HH:mm:ss]" text in both
  * engines under UTC). Every oracle SQL mirrors the same outer casts.
  */
object OracleSafe {

  private def unsafeAnywhere(dt: DataType): Boolean = dt match {
    case _: DecimalType | DateType | TimestampType | TimestampNTZType => true
    case s: StructType => s.fields.exists(f => unsafeAnywhere(f.dataType))
    case a: ArrayType  => unsafeAnywhere(a.elementType)
    case m: MapType    => unsafeAnywhere(m.keyType) || unsafeAnywhere(m.valueType)
    case _ => false
  }

  def canon(df: DataFrame): DataFrame = {
    val cols: Array[Column] = df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType          => col(f.name).cast("double").as(f.name)
        case DateType | TimestampType | TimestampNTZType =>
          col(f.name).cast("string").as(f.name)
        case nested if unsafeAnywhere(nested) =>
          // no generic safe rewrite for nested unsafe types — fail at
          // Verify time rather than ship a hash-mismatching column
          throw new IllegalArgumentException(
            s"column ${f.name}: unsafe type nested inside ${f.dataType.sql}; " +
              "flatten or cast it in the query's final projection")
        case _                       => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
