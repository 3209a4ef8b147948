package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.GraftFunctions

/** Cluster-default injection of the engine's native Catalyst expressions
  * via the public extensions hook:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes the [[graft.functions.GraftFunctions.builders]] functions
  * resolvable in every session of the cluster (spark-submit /
  * thrift-server / notebooks) without any driver-side
  * `GraftFunctions.register` call — the deployment story for the SQL
  * surface. Session-scoped registration remains for embedded use; both
  * paths share the same builder definitions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
}
