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
    for ((n, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    for (n <- args; i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      println(f"$n run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
