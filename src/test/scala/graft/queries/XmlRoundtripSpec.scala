package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Pins for the native-XML roundtrip gate (queries/PipelineOps
  * `x_xml_roundtrip`): value fidelity against a parquet-direct aggregate,
  * and — the part the aggregate alone can't prove for arbitrary text —
  * lossless entity escaping of XML-hostile characters through the
  * writer+parser pair. */
class XmlRoundtripSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("x_xml_roundtrip equals the parquet-direct aggregate") {
    val dir = TestSpark.Sf0001
    val got = PipelineOps.queries("x_xml_roundtrip")(spark, dir)
      .select(col("nationkey"), col("n_suppliers"), col("key_sum"),
        col("n_names"), col("name_len_sum"))
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = Tables.read(spark, dir, "supplier")
      .groupBy(col("s_nationkey").cast("int").as("nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("s_suppkey")).as("ks"),
        countDistinct(col("s_name")).as("nn"),
        sum(length(col("s_name"))).as("nl"))
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == direct)
    assert(got.nonEmpty)
  }

  test("XML-hostile characters survive the write+read roundtrip exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_xml_esc").toString
    val rows = Seq(
      (1L, """a<b&c>"d'e"""),       // every XML entity in one value
      (2L, "tag-like <supplier>"),  // content that mimics the rowTag
      (3L, "  leading/trailing  "), // whitespace — parser trims it unless told not to
      (4L, "plain"))
    rows.toDF("k", "v").write.mode("overwrite").format("xml")
      .option("rowTag", "supplier").save(tmp)
    // ignoreSurroundingSpaces defaults to TRUE (element text is trimmed);
    // exact preservation needs it off — the footgun this test documents
    val back = spark.read.format("xml").option("rowTag", "supplier")
      .option("ignoreSurroundingSpaces", "false")
      .schema("k LONG, v STRING").load(tmp)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == rows.sortBy(_._1))
    val trimmed = spark.read.format("xml").option("rowTag", "supplier")
      .schema("k LONG, v STRING").load(tmp)
      .filter(col("k") === 3L).as[(Long, String)].head()
    assert(trimmed._2 == "leading/trailing", "default mode trims surrounding spaces")
  }
}
