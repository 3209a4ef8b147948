package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-facing registration of the engine's native expressions, so
  * `spark.sql` users get the same codegen'd kernels as the Column API:
  *
  *   SELECT graft_dot(a.embedding, b.embedding) ...
  *   SELECT explode(graft_shingles(text, 3)) ...
  *
  * (Session-scoped temp functions; a `SparkSessionExtensions`-based
  * injection would make them cluster-default — not needed for a library.)
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_dot",
      es => DotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "graft_shingles",
      es => WordShingles(es(0), intArg(es(1), "shingle width")))
  }
}
