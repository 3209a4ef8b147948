package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for named queries so pushdown /
  * broadcast / whole-stage-codegen can be audited (`sbt "runMain
  * graft.PlanCheck <sfDir> [query...]"`). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s3_scan_projection", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "w1_live_view", "w1_live_view_aggform", "topk_orders",
        "x_dedup_minhash_lsh", "x_ann_brute_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
