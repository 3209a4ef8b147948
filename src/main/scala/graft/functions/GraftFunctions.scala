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
  * Two registration paths share the single [[builders]] definition:
  * session-scoped [[register]] (embedded/library use) and cluster-default
  * injection via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      require(es.length == n,
        s"$name expects $n arguments, got ${es.length}")
      b(es)
    }

  /** The one definition of every SQL function: (name, expression class
    * for EXPLAIN/DESCRIBE info, builder with arity check). */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct],
      arity("graft_dot", 2)(es => DotProduct(es(0), es(1)))),
    ("graft_shingles", classOf[WordShingles],
      arity("graft_shingles", 2)(es =>
        WordShingles(es(0), intArg(es(1), "shingle width")))))

  /** Session-scoped temp-function registration. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, b) =>
      Bridge.registerFunction(spark, name, b)
    }
}
