package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (n <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      println(f"$n: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
