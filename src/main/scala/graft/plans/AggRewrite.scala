package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.DoubleType

/** Materialized-aggregate rewrite — the MV-selection step classical
  * engines pair with incremental view maintenance (our
  * [[graft.operators.Materialize]] keeps the state current; reference
  * analog: Phoenix picks a covered index the same way in
  * cc/optimize/QueryOptimizer.java — swap the scan target when a
  * registered artifact answers the query).
  *
  * A registered view holds `(groupCols, cnt, sum_m/min_m/max_m per
  * measure)` at `statePath` ([[graft.operators.Materialize.aggregate]]'s
  * layout). A query aggregate rewrites onto the state when:
  *  - it scans the registered base path (plain parquet or the graftpk
  *    V2 source), optionally through a column-pruning Project;
  *  - its grouping columns are a SUBSET of the view's (equality uses
  *    the state at its own grain; a strict subset ROLLS UP: sums of
  *    sums, min of mins, count(*) = sum(cnt) — all decomposable);
  *  - every aggregate is a plain (no DISTINCT / FILTER) SUM / MIN /
  *    MAX over a view measure, or COUNT(*) / COUNT(1).
  *
  * The rewritten aggregate runs over group-cardinality rows instead of
  * the fact table — at 100 TB that is the difference between a scan and
  * a lookup. Output exprIds and types are preserved (state measures are
  * DOUBLE; results cast back to the original aggregate's type), so the
  * surrounding plan is untouched. Sums that exceed 2^53 lose integer
  * precision in the DOUBLE state — the documented trade of this state
  * layout.
  *
  * Staleness contract: the registrant guarantees the state covers the
  * base (register after [[graft.operators.Materialize.refresh]]; drop
  * before mutating without refresh) — the same freshness contract every
  * refresh-based MV system has.
  */
object GraftAggViews {
  /** @param statePath [[graft.operators.Materialize]]-layout parquet
    * @param groupCols the view's grouping columns
    * @param measures  measure columns with sum_/min_/max_ state */
  case class AggViewDef(statePath: String, groupCols: Seq[String],
      measures: Seq[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, AggViewDef]()

  def register(basePath: String, view: AggViewDef): Unit =
    registry.put(norm(basePath), view)
  def drop(basePath: String): Unit = registry.remove(norm(basePath))
  def lookup(basePath: String): Option[AggViewDef] =
    Option(registry.get(norm(basePath)))

  private def norm(p: String) =
    p.stripPrefix("file:").stripSuffix("/")

  val DisabledConf = "spark.graft.aggRewrite.disabled"
}

case class AggRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (spark.conf.get(GraftAggViews.DisabledConf, "false") == "true") plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, outputs, child, _) =>
        rewrite(groupings, outputs, child).getOrElse(agg)
    }

  /** The scanned base path plus any residual filter, looking through
    * pruning Projects. A filter is carried back (to re-apply on the
    * state) rather than rejected — group-column predicates ("the sum
    * for source X") are the most common MV hit. */
  private def scannedPath(plan: LogicalPlan)
      : Option[(String, Option[Expression])] = plan match {
    case Project(list, child) if list.forall(_.isInstanceOf[Attribute]) =>
      scannedPath(child)
    case org.apache.spark.sql.catalyst.plans.logical
        .Filter(cond, child) =>
      scannedPath(child).flatMap {
        case (p, None) => Some((p, Some(cond)))
        case _ => None // two filter layers: keep it simple, bail
      }
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if fs.location.rootPaths.size == 1 =>
          Some((fs.location.rootPaths.head.toUri.getPath, None))
        case _ => None
      }
    case rel: DataSourceV2Relation =>
      rel.table match {
        case t: graft.sources.GraftPkTable =>
          Some((t.name().stripPrefix("graftpk:"), None))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(groupings: Seq[Expression],
      outputs: Seq[NamedExpression], child: LogicalPlan)
      : Option[LogicalPlan] = {
    val (path, residual) = scannedPath(child).getOrElse(return None)
    val view = GraftAggViews.lookup(path).getOrElse(return None)
    val groupNames = groupings.map {
      case a: AttributeReference => a.name
      case _ => return None // expression grouping: not this view's grain
    }
    if (!groupNames.toSet.subsetOf(view.groupCols.toSet)) return None
    // a residual filter must touch only GROUP columns — a measure
    // predicate filters individual fact rows, which the state can't see
    if (!residual.forall(_.references.map(_.name).toSet
        .subsetOf(view.groupCols.toSet))) return None
    // answerability PRE-CHECK before any state I/O: pattern-only, no
    // attributes needed — a bailing query (avg, count(col), DISTINCT)
    // must not pay a parquet schema read per planning pass
    def answerableFn(
        fn: org.apache.spark.sql.catalyst.expressions.aggregate
          .AggregateFunction): Boolean = fn match {
      // count(*) / count(1); a NULL literal means count-of-nothing
      // (always 0), which the state can't distinguish from count(*)
      case Count(Seq(Literal(v, _))) => v != null
      case Sum(ar: AttributeReference, _) => view.measures.contains(ar.name)
      case Min(ar: AttributeReference) => view.measures.contains(ar.name)
      case Max(ar: AttributeReference) => view.measures.contains(ar.name)
      case _ => false
    }
    val answerable = outputs.forall {
      case a: AttributeReference => groupNames.contains(a.name)
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty &&
          answerableFn(ae.aggregateFunction)
      case _ => false
    }
    if (!answerable) return None
    val state = spark.read.parquet(view.statePath)
      .queryExecution.analyzed
    val stateAttr: Map[String, Attribute] =
      state.output.map(a => a.name -> a).toMap
    // a stale/mismatched registration (state missing expected columns)
    // must refuse the rewrite, never crash planning
    val needed = view.groupCols ++ Seq("cnt") ++
      view.measures.flatMap(m => Seq(s"sum_$m", s"min_$m", s"max_$m"))
    if (!needed.forall(stateAttr.contains)) return None

    def merged(fnCol: Attribute,
        mk: Expression => org.apache.spark.sql.catalyst.expressions
          .aggregate.AggregateFunction): Expression =
      AggregateExpression(mk(fnCol), Complete, isDistinct = false)

    val newOutputs: Seq[NamedExpression] = outputs.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(stateAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        val e: Expression = ae.aggregateFunction match {
          case Count(_) =>
            // COUNT over zero state rows must stay 0, not SUM's NULL
            org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
              merged(stateAttr("cnt"), Sum(_)), Literal(0L)))
          case Sum(ar: AttributeReference, _) =>
            Cast(merged(stateAttr(s"sum_${ar.name}"), Sum(_)), ae.dataType)
          case Min(ar: AttributeReference) =>
            Cast(merged(stateAttr(s"min_${ar.name}"), Min(_)), ae.dataType)
          case Max(ar: AttributeReference) =>
            Cast(merged(stateAttr(s"max_${ar.name}"), Max(_)), ae.dataType)
          case other => throw new IllegalStateException(
            s"unreachable: pre-checked aggregate $other")
        }
        Alias(e, name)(exprId = al.exprId, qualifier = al.qualifier,
          explicitMetadata = al.explicitMetadata)
      case other => throw new IllegalStateException(
        s"unreachable: pre-checked output $other")
    }
    // equality of grain: a per-group Aggregate over one-row-per-group
    // state is still cheapest expressed as an Aggregate (sums of one
    // row) — and the SAME shape serves the rollup case, so emit one
    // form: Aggregate over the (possibly filtered) state keyed by the
    // queried columns
    val source = residual match {
      case Some(cond) =>
        val remapped = cond.transformUp {
          case a: AttributeReference => stateAttr(a.name)
        }
        org.apache.spark.sql.catalyst.plans.logical.Filter(remapped, state)
      case None => state
    }
    Some(Aggregate(groupNames.map(stateAttr), newOutputs, source))
  }
}
