package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent materialized-view rewrite — ClickHouse "projections"
  * semantics (a table declares pre-aggregated alternates; the optimizer
  * silently answers matching queries from them) re-expressed as a custom
  * Catalyst `Rule[LogicalPlan]`, the extension tier the engine reserves
  * for semantics the declarative API can't reach: the USER's plan must
  * change without the user changing their query.
  *
  * Contract: an MV registered for base path P with grouping columns G and
  * measure columns M is a parquet table holding G plus, per m ∈ M, the
  * partial columns `_cnt` = count(*), `_sum_m`, `_min_m`, `_max_m` at
  * grouping granularity G. An `Aggregate` over a clean scan of P (column
  * projections plus filters that touch ONLY grouping columns — such a
  * predicate cuts whole MV groups exactly as it cuts the same groups'
  * base rows, so it is rebound by name and pushed onto the MV; any other
  * filter, computed input, or join disqualifies) whose grouping keys ⊆ G
  * and whose aggregates are count(*) / sum / min / max over M is answered
  * from the MV by RE-AGGREGATION: counts and sums add, mins min, maxes
  * max — the partial-states-merge law that makes the rewrite exact at ANY
  * coarser grouping. Anything outside the
  * contract is left untouched (the rule returns the node unchanged), so
  * soundness never depends on the matcher being clever — only on it being
  * conservative.
  *
  * At 100 TB this is the difference between a full fact-table scan and a
  * few thousand MV rows for every dashboard-style rollup; the rewrite also
  * composes with [[graft.queries.PipelineOps]]'s incremental MV refresh
  * gate (`x_incr_agg` maintains exactly such partial states).
  *
  * Install: session-scoped via `spark.experimental.extraOptimizations`
  * (the public hook for user optimizer rules — runs as the final batch, by
  * which time projection collapse has left the Aggregate directly over the
  * pruned scan). Output attribute ids of the rewritten subtree are
  * re-aliased to the ORIGINAL aggregate's `ExprId`s, so every consumer
  * above binds unchanged. Data types are verified equal before the swap is
  * committed; the one intentional widening is nullability (`sum` of
  * partials is nullable where `count(*)` was not — the count itself is
  * kept non-null by a coalesce-to-0, which matters exactly when a global
  * aggregate's input is filtered to empty).
  */
object MvRewrite {

  final case class MvDef(
      mvDf: DataFrame,
      groupCols: Set[String],
      measures: Set[String])

  /** Normalized base URI (scheme + authority + path; bare paths and
    * file:/ collapse together) → MV definition. */
  private val registry = new ConcurrentHashMap[String, MvDef]()

  /** Registry path identity. Local paths are scheme-insensitive
    * (`file:/x/y` ≡ `/x/y` — the equivalence the gates rely on), but any
    * OTHER filesystem keeps its full scheme + authority: collapsing
    * `s3://bucketA/data` and `s3://bucketB/data` to `/data` would let a
    * query over one table be answered from the other's MV (r9 ADVICE). */
  def normalizePath(p: String): String = {
    val u = new org.apache.hadoop.fs.Path(p).toUri
    val scheme = Option(u.getScheme).getOrElse("file")
    val auth = Option(u.getAuthority).getOrElse("")
    if (scheme == "file" && auth.isEmpty) u.getPath
    else s"$scheme://$auth${u.getPath}"
  }

  def register(
      spark: SparkSession,
      basePath: String,
      mvPath: String,
      groupCols: Seq[String],
      measures: Set[String]): Unit = {
    registry.put(normalizePath(basePath),
      MvDef(spark.read.parquet(mvPath), groupCols.toSet, measures))
    install(spark)
  }

  def clear(): Unit = registry.clear()

  /** Idempotently append the rule to the session's user-optimizer batch. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[MvAggregateRewrite])) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvAggregateRewrite
    }

  /** Root paths of every file-source relation in `plan` (normalized) —
    * the observable the gate and spec pin the rewrite on. */
  def scannedPaths(plan: LogicalPlan): Seq[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.map(p => normalizePath(p.toString))
      case _ => Nil
    }
  }.flatten

  /** The parsed shape of one aggregate output column. */
  private sealed trait Out
  private case class GroupOut(name: String) extends Out
  private case object CntOut extends Out
  private case class SumOut(m: String) extends Out
  private case class MinOut(m: String) extends Out
  private case class MaxOut(m: String) extends Out

  final class MvAggregateRewrite extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
      }

    /** Unwrap attribute-only projections and filters down to a single
      * file relation, collecting the filter conjuncts on the way — a
      * filter is admissible later only if it references grouping columns
      * alone (then it cuts whole MV groups, exactly as it cuts the same
      * groups' base rows). */
    private def unwrap(p: LogicalPlan, conds: Seq[Expression])
        : Option[(Seq[Expression], LogicalRelation)] = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c, conds)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, c) =>
        unwrap(c, conds :+ cond)
      case lr: LogicalRelation => Some((conds, lr))
      case _ => None
    }

    /** A filter conjunct is MV-pushable iff it is deterministic, free of
      * subqueries, and every column it touches is a grouping column. */
    private def pushable(cond: Expression, ddef: MvDef): Boolean =
      cond.deterministic &&
        cond.find(_.isInstanceOf[PlanExpression[_]]).isEmpty &&
        cond.references.forall(a => ddef.groupCols(a.name))

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
      cl <- unwrap(agg.child, Nil)
      (conds, lr) = cl
      fs <- lr.relation match {
        case f: HadoopFsRelation => Some(f); case _ => None
      }
      paths = fs.location.rootPaths.map(p => normalizePath(p.toString))
      ddef <- paths.headOption.flatMap(h => Option(registry.get(h)))
        if paths.nonEmpty && paths.forall(p => registry.get(p) == ddef)
        if conds.forall(pushable(_, ddef))
      // every grouping key must be a plain column the MV grouped by
      gnames <- traverse(agg.groupingExpressions) {
        case a: AttributeReference if ddef.groupCols(a.name) => Some(a.name)
        case _ => None
      }
      outs <- traverse(agg.aggregateExpressions)(parseOut(_, gnames.toSet, ddef))
        if outs.exists(o => !o._2.isInstanceOf[GroupOut]) // ≥1 real aggregate
      rewritten <- build(agg, ddef, gnames, outs, conds)
    } yield rewritten

    private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] =
      xs.foldLeft(Option(Vector.empty[B])) { (acc, x) =>
        acc.flatMap(v => f(x).map(v :+ _))
      }

    /** One result expression → (output name, parsed shape), or None when
      * anything falls outside the rewritable contract. */
    private def parseOut(ne: NamedExpression, gnames: Set[String],
        ddef: MvDef): Option[(String, Out)] = ne match {
      case a: AttributeReference if gnames(a.name) =>
        Some(a.name -> GroupOut(a.name))
      case al @ Alias(a: AttributeReference, _) if gnames(a.name) =>
        Some(al.name -> GroupOut(a.name))
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val out = ae.aggregateFunction match {
          case c: Count if c.children.forall(ch =>
              ch.foldable && ch.eval() != null) => Some(CntOut)
          case s: Sum => s.child match {
            case a: AttributeReference if ddef.measures(a.name) =>
              Some(SumOut(a.name))
            case _ => None
          }
          case m: Min => m.child match {
            case a: AttributeReference if ddef.measures(a.name) =>
              Some(MinOut(a.name))
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference if ddef.measures(a.name) =>
              Some(MaxOut(a.name))
            case _ => None
          }
          case _ => None
        }
        out.map(al.name -> _)
      case _ => None
    }

    /** Assemble the replacement in pure Catalyst: (optional) filter over
      * the MV relation with the query's grouping-column predicates
      * rebound by NAME to MV attributes, then one Aggregate whose result
      * aliases carry the ORIGINAL ExprIds so the parent plan binds
      * unchanged. Bails (None) on any dtype drift. */
    private def build(agg: Aggregate, ddef: MvDef, gnames: Seq[String],
        outs: Seq[(String, Out)], conds: Seq[Expression]): Option[LogicalPlan] = {
      val mvPlan = ddef.mvDf.queryExecution.analyzed
      val mvOut: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap
      // filter-only grouping columns count as needed too: a conjunct can
      // reference a grouping column that appears in no output, and the
      // rebind below would throw at optimizer time if the (mis-registered)
      // MV lacks it (r9 ADVICE)
      val needed = gnames ++
        conds.flatMap(_.references.map(_.name)) ++
        outs.collect {
          case (_, CntOut)    => "_cnt"
          case (_, SumOut(m)) => s"_sum_$m"
          case (_, MinOut(m)) => s"_min_$m"
          case (_, MaxOut(m)) => s"_max_$m"
        }
      // a mis-registered MV (missing partial columns) must mean "no
      // rewrite", never an optimizer-time exception
      if (!needed.forall(mvOut.contains)) return None
      val child: LogicalPlan =
        if (conds.isEmpty) mvPlan
        else org.apache.spark.sql.catalyst.plans.logical.Filter(
          conds.map(_.transformUp {
            case a: AttributeReference => mvOut(a.name)
          }).reduce(And), mvPlan)
      def fin(f: AggregateFunction): AggregateExpression =
        AggregateExpression(f, Complete, isDistinct = false)
      val resultExprs = agg.output.zip(outs).map { case (o, (_, shape)) =>
        val e: Expression = shape match {
          case GroupOut(g) => mvOut(g)
          // a GLOBAL aggregate (no grouping keys) still emits one row when
          // its input is empty — the MV may be empty, or a pushed
          // grouping-column filter may cut every MV row — and there
          // count(*) must be 0 while Sum(_cnt) is NULL (r9 ADVICE,
          // medium). sum/min/max over the same empty input are NULL in
          // the un-rewritten query too, so only the count needs the
          // coalesce; for grouped queries every surviving group has ≥1 MV
          // row and the fallback literal is dead.
          case CntOut      =>
            Coalesce(Seq(fin(Sum(mvOut("_cnt"))), Literal(0L)))
          case SumOut(m)   => fin(Sum(mvOut(s"_sum_$m")))
          case MinOut(m)   => fin(Min(mvOut(s"_min_$m")))
          case MaxOut(m)   => fin(Max(mvOut(s"_max_$m")))
        }
        Alias(e, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
      val ok = resultExprs.zip(agg.output).forall {
        case (n, o) => n.dataType == o.dataType
      }
      if (!ok) None
      else Some(Aggregate(gnames.distinct.map(mvOut), resultExprs, child))
    }
  }
}
