package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Mirrors the reference's converter matrix
  * (`tests/test_schema_converter.py:10-174`, map completeness `:276-289`). */
class TypeMapperSpec extends AnyFunSuite with graft.GateCacheHygiene {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }
  import TypeMapper.toSparkType

  test("integer family") {
    assert(toSparkType("tinyint") == ByteType)
    assert(toSparkType("smallint") == ShortType)
    assert(toSparkType("mediumint") == IntegerType)
    assert(toSparkType("int") == IntegerType)
    assert(toSparkType("integer") == IntegerType)
    assert(toSparkType("bigint") == LongType)
    assert(toSparkType("bit") == LongType)
    assert(toSparkType("year") == ShortType)
  }

  test("UNSIGNED widens to the next range-holding type " +
      "(closes README.md:590 — no silent wraparound)") {
    assert(toSparkType("tinyint unsigned") == ShortType)
    assert(toSparkType("tinyint(1) unsigned") == ShortType)
    assert(toSparkType("smallint unsigned") == IntegerType)
    assert(toSparkType("mediumint unsigned") == IntegerType)
    assert(toSparkType("int unsigned") == LongType)
    assert(toSparkType("int(10) unsigned") == LongType)
    assert(toSparkType("integer unsigned") == LongType)
    // u64 max 18446744073709551615 > 2^63−1: only Decimal(20,0) holds it
    assert(toSparkType("bigint unsigned") == DecimalType(20, 0))
    assert(toSparkType("bigint(20) unsigned") == DecimalType(20, 0))
    // the widened type must actually hold each unsigned max
    assert(java.math.BigDecimal.valueOf(255L).precision <= 5) // Short ok
    assert(16777215L <= Int.MaxValue && 4294967295L <= Long.MaxValue)
    assert(new java.math.BigDecimal("18446744073709551615").precision == 20)
    // signed mappings unchanged by the suffix detection
    assert(toSparkType("bigint") == LongType)
    assert(toSparkType("int") == IntegerType)
  }

  test("float family") {
    assert(toSparkType("float") == FloatType)
    assert(toSparkType("double") == DoubleType)
  }

  test("decimal with explicit precision/scale") {
    assert(toSparkType("decimal", Some(10), Some(2)) == DecimalType(10, 2))
    assert(toSparkType("numeric", Some(5), Some(1)) == DecimalType(5, 1))
  }

  test("decimal defaults p=10 s=0 (src/schema_converter.py:44-47)") {
    assert(toSparkType("decimal") == DecimalType(10, 0))
  }

  test("decimal precision clamped to Spark max 38 (CH allows 76)") {
    assert(toSparkType("decimal", Some(76), Some(10)) == DecimalType(38, 10))
    assert(toSparkType("decimal", Some(40), Some(40)) == DecimalType(38, 38))
  }

  test("strings, binary, temporal, bool, enum/set/json") {
    assert(toSparkType("char") == StringType)
    assert(toSparkType("varchar") == StringType)
    assert(toSparkType("varchar(255)") == StringType)
    assert(toSparkType("text") == StringType)
    assert(toSparkType("longtext") == StringType)
    assert(toSparkType("binary") == BinaryType)
    assert(toSparkType("longblob") == BinaryType)
    assert(toSparkType("date") == DateType)
    assert(toSparkType("datetime") == TimestampType)
    assert(toSparkType("timestamp") == TimestampType)
    assert(toSparkType("time") == StringType)
    assert(toSparkType("bool") == BooleanType)
    assert(toSparkType("boolean") == BooleanType)
    assert(toSparkType("enum('a','b')") == StringType)
    assert(toSparkType("set('x')") == StringType)
    assert(toSparkType("json") == StringType)
  }

  test("unknown types fall back to String (tests/test_schema_converter.py:151-161)") {
    assert(toSparkType("geometry") == StringType)
    assert(toSparkType("point") == StringType)
    assert(toSparkType("weird_custom") == StringType)
  }

  test("case-insensitive and length-suffix tolerant") {
    assert(toSparkType("INT") == IntegerType)
    assert(toSparkType("VARCHAR(100)") == StringType)
    assert(toSparkType("Decimal(8,3)", Some(8), Some(3)) == DecimalType(8, 3))
  }

  test("property: total function — any type string maps to some DataType") {
    check(Prop.forAll(Gen.alphaNumStr) { s => toSparkType(s) != null })
  }

  test("property: decimal scale never exceeds precision, precision <= 38") {
    check(Prop.forAll(Gen.choose(1, 100), Gen.choose(0, 100)) { (p, sc) =>
      val t = toSparkType("decimal", Some(p), Some(sc)).asInstanceOf[DecimalType]
      t.scale <= t.precision && t.precision <= 38
    })
  }
}
