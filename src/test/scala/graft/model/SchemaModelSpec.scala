package graft.model

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixtures from FIXTURES.md §1-3 (reference `tests/conftest.py:62-141`,
  * no-PK fallback `tests/test_schema_converter.py:199-223`). */
class SchemaModelSpec extends AnyFunSuite with graft.GateCacheHygiene {

  val users = TableSchema("users", Seq(
    ColumnInfo("id", "int", isNullable = false, columnKey = "PRI",
      extra = "auto_increment"),
    ColumnInfo("email", "varchar(255)", isNullable = false, columnKey = "UNI"),
    ColumnInfo("name", "varchar(100)", isNullable = true),
    ColumnInfo("balance", "decimal", isNullable = true,
      numericPrecision = Some(10), numericScale = Some(2)),
    ColumnInfo("created_at", "datetime", isNullable = false)),
    primaryKeys = Seq("id"))

  test("users → StructType with nullability (FIXTURES.md §1)") {
    assert(users.toStructType == StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("email", StringType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("balance", DecimalType(10, 2), nullable = true),
      StructField("created_at", TimestampType, nullable = false))))
  }

  test("CDC struct appends _version/_deleted (src/schema_converter.py:101-103)") {
    val cdc = users.toCdcStructType
    assert(cdc.fields.takeRight(2).toSeq == Seq(
      StructField("_version", LongType, nullable = false),
      StructField("_deleted", IntegerType, nullable = false)))
    assert(cdc.fields.length == users.columns.length + 2)
  }

  test("composite PK ordering preserved (order_items, FIXTURES.md §2)") {
    val oi = TableSchema("order_items", Seq(
      ColumnInfo("order_id", "int", isNullable = false, columnKey = "PRI"),
      ColumnInfo("product_id", "int", isNullable = false, columnKey = "PRI"),
      ColumnInfo("quantity", "int", isNullable = false)),
      primaryKeys = Seq("order_id", "product_id"))
    assert(oi.orderKey == Seq("order_id", "product_id"))
  }

  test("no PK falls back to first column (src/schema_converter.py:65-69)") {
    val logs = TableSchema("logs", Seq(
      ColumnInfo("message", "text", isNullable = false),
      ColumnInfo("timestamp", "datetime", isNullable = false)),
      primaryKeys = Seq.empty)
    assert(logs.orderKey == Seq("message"))
  }

  test("fromStructType round-trips the Spark schema") {
    val st = users.toStructType
    val back = SchemaModel.fromStructType("users", st, Seq("id"))
    assert(back.toStructType == st)
    assert(back.primaryKeys == Seq("id"))
    assert(back.columns.find(_.name == "id").get.isPrimaryKey)
  }
}

/** FIXTURES.md §5 — injection-attempt identifiers
  * (reference `tests/test_clients.py:11-70`). */
class IdentifiersSpec extends AnyFunSuite with graft.GateCacheHygiene {
  test("valid identifiers accepted") {
    for (id <- Seq("users", "user_id", "_private", "table1", "Users_2"))
      assert(Identifiers.isValid(id), id)
  }
  test("injection attempts and malformed identifiers rejected") {
    for (id <- Seq("users; DROP TABLE users;--", "users' OR '1'='1",
        "users--", "users/**/", "123table", "my table", "table@name",
        "", "tab;le", "a-b", "näme"))
      assert(!Identifiers.isValid(id), id)
  }
  test("validate throws on invalid (src/mysql_client.py:29-32 parity)") {
    intercept[IllegalArgumentException] {
      Identifiers.validate("bad name")
    }
    assert(Identifiers.validate("good_name") == "good_name")
  }
}
