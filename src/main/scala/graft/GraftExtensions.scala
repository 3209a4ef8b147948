package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotProduct, WordShingles}

/** Cluster-default injection of the engine's native Catalyst expressions
  * via the public extensions hook:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes `graft_dot` / `graft_shingles` resolvable in every session of
  * the cluster (spark-submit / thrift-server / notebooks) without any
  * driver-side `GraftFunctions.register` call — the deployment story for
  * the SQL surface. Session-scoped registration
  * ([[graft.functions.GraftFunctions.register]]) remains for embedded use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (es: Seq[Expression]) =>
        WordShingles(es(0), intArg(es(1), "shingle width"))))
  }
}
