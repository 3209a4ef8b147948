package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Golden parity with `tests/test_schema_converter.py:150-270` on the
  * reference's own fixtures (`tests/conftest.py:63-141`): same schemas in,
  * byte-identical DDL out. The full-string asserts here are STRONGER than
  * the reference's contains-asserts — any drift in quoting, indentation,
  * engine clause, or column order fails. */
class ClickHouseDdlSpec extends AnyFunSuite {

  // conftest.py:63-108 `sample_table_schema`
  private val users = TableSchema(
    name = "users",
    columns = Seq(
      ColumnInfo("id", "int", isNullable = false, columnKey = "PRI",
        extra = "auto_increment"),
      ColumnInfo("email", "varchar", isNullable = false, columnKey = "UNI",
        characterMaximumLength = Some(255)),
      ColumnInfo("name", "varchar", isNullable = true,
        characterMaximumLength = Some(100)),
      ColumnInfo("balance", "decimal", isNullable = true,
        numericPrecision = Some(10), numericScale = Some(2)),
      ColumnInfo("created_at", "datetime", isNullable = false)),
    primaryKeys = Seq("id"))

  // conftest.py:113-141 `sample_composite_key_schema`
  private val orderItems = TableSchema(
    name = "order_items",
    columns = Seq(
      ColumnInfo("order_id", "int", isNullable = false, columnKey = "PRI"),
      ColumnInfo("product_id", "int", isNullable = false, columnKey = "PRI"),
      ColumnInfo("quantity", "int", isNullable = false)),
    primaryKeys = Seq("order_id", "product_id"))

  test("unknown type defaults to String (test_schema_converter.py:150)") {
    assert(ClickHouseDdl.chType(
      ColumnInfo("weird_col", "unknown_type", isNullable = false)) == "String")
  }

  test("bool/boolean map to Bool (:162)") {
    for (t <- Seq("bool", "boolean"))
      assert(ClickHouseDdl.chType(
        ColumnInfo("is_active", t, isNullable = false)) == "Bool")
  }

  test("basic CREATE TABLE — full golden string (:178)") {
    val sql = ClickHouseDdl.generateTable(users, "test_db")
    val expected =
      """CREATE TABLE IF NOT EXISTS `test_db`.`users`
        |(
        |    `id` Int32,
        |    `email` String,
        |    `name` Nullable(String),
        |    `balance` Nullable(Decimal(10, 2)),
        |    `created_at` DateTime
        |)
        |ENGINE = MergeTree()
        |ORDER BY (`id`)""".stripMargin
    assert(sql == expected)
  }

  test("composite primary key ORDER BY (:191)") {
    val sql = ClickHouseDdl.generateTable(orderItems, "test_db")
    assert(sql.contains("ORDER BY (`order_id`, `product_id`)"))
  }

  test("no primary key falls back to the first column (:197)") {
    val logs = TableSchema("logs", Seq(
      ColumnInfo("message", "text", isNullable = false),
      ColumnInfo("timestamp", "datetime", isNullable = false)), Seq.empty)
    assert(ClickHouseDdl.generateTable(logs, "test_db")
      .contains("ORDER BY (`message`)"))
  }

  test("empty relation falls back to tuple() (schema_converter.py:66-69)") {
    val empty = TableSchema("void", Seq.empty, Seq.empty)
    assert(ClickHouseDdl.generateTable(empty, "test_db")
      .contains("ORDER BY (tuple())"))
  }

  test("DROP TABLE — exact (:224)") {
    assert(ClickHouseDdl.generateDrop("users", "test_db") ==
      "DROP TABLE IF EXISTS `test_db`.`users`")
  }

  test("CDC table: meta columns + ReplacingMergeTree — full golden (:231)") {
    val sql = ClickHouseDdl.generateCdcTable(users, "test_db")
    val expected =
      """CREATE TABLE IF NOT EXISTS `test_db`.`users`
        |(
        |    `id` Int32,
        |    `email` String,
        |    `name` Nullable(String),
        |    `balance` Nullable(Decimal(10, 2)),
        |    `created_at` DateTime,
        |    `_version` UInt64,
        |    `_deleted` UInt8
        |)
        |ENGINE = ReplacingMergeTree(_version)
        |ORDER BY (`id`)""".stripMargin
    assert(sql == expected)
  }

  test("CDC view: FINAL + _deleted filter, meta columns hidden (:253)") {
    val sql = ClickHouseDdl.generateView("users", "test_db", users)
    val expected =
      """CREATE OR REPLACE VIEW `test_db`.`users_live` AS
        |SELECT `id`, `email`, `name`, `balance`, `created_at`
        |FROM `test_db`.`users` FINAL
        |WHERE _deleted = 0""".stripMargin
    assert(sql == expected)
    // the reference's negative assert: no meta columns in the SELECT list
    val selectList = sql.split("SELECT")(1).split("FROM")(0)
    assert(!selectList.contains("_version") && !selectList.contains("_deleted"))
  }
}
