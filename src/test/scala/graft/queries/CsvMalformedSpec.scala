package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.TestSpark

/** Pins the CSV malformed-record modes the x_csv_malformed gate doesn't
  * cover in-band: FAILFAST aborts on the first bad row, and the
  * column-pruning caveat (malformedness is relative to the columns the
  * query actually reads). */
class CsvMalformedSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dirWithBadRow: String = {
    val tmp = java.nio.file.Files.createTempDirectory("csvff").toString
    Seq("1,ok,10.5", "2,bad,NOT_A_NUMBER", "3,ok,2.25").toDF("value")
      .coalesce(1).write.mode("overwrite").text(tmp)
    tmp
  }
  private val schema = StructType.fromDDL("k BIGINT, tag STRING, v DOUBLE")

  test("FAILFAST aborts the job on the first malformed row") {
    val ff = spark.read.schema(schema).option("mode", "FAILFAST")
      .csv(dirWithBadRow)
    val e = intercept[org.apache.spark.SparkException] {
      ff.agg(sum(col("v"))).collect()
    }
    assert(e.getMessage.contains("MALFORMED_RECORD_IN_PARSING") ||
      Option(e.getCause).exists(_.getMessage
        .contains("MALFORMED_RECORD_IN_PARSING")))
  }

  test("malformedness is relative to the READ columns: an un-read bad column drops nothing") {
    val dm = spark.read.schema(schema).option("mode", "DROPMALFORMED")
      .csv(dirWithBadRow)
    // pruning follows the OPTIMIZED plan's required columns, not the
    // user's select list: even select(k, v).count() collapses to
    // count(1) and parses nothing — 3 rows. Only a plan that actually
    // MATERIALIZES v (collect, or an aggregate over v like the gate's
    // drop-side sum) forces the parse and the drop.
    assert(dm.count() == 3)
    assert(dm.select(col("k"), col("v")).count() == 3)
    assert(dm.select(col("k"), col("v")).collect().length == 2)
    assert(dm.agg(sum(col("v"))).head().getDouble(0) == 12.75)
  }
}
