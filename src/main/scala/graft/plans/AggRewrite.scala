package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Materialized-aggregate rewrite — the MV-selection step classical
  * engines pair with incremental view maintenance (our
  * [[graft.operators.Materialize]] keeps the state current; reference
  * analog: Phoenix picks a covered index the same way in
  * cc/optimize/QueryOptimizer.java — swap the scan target when a
  * registered artifact answers the query).
  *
  * A registered view holds `(groupCols, cnt, cnt_m/sum_m/min_m/max_m
  * per measure)` at `statePath`
  * ([[graft.operators.Materialize.aggregate]]'s layout). `statePath`
  * may be either a concrete state directory or a [[graft.operators
  * .Materialize]] MV ROOT (a directory with a `meta` pointer) — the
  * root form resolves the CURRENT `state_v<N>` through the meta
  * pointer at rewrite time, so a refresh that rotates the state
  * directory is picked up without re-registering (the pointer read
  * costs one small parquet footer, on par with the schema check the
  * rewrite already pays). A query aggregate rewrites onto the state
  * when:
  *  - it scans the registered base path (plain parquet or the graftpk
  *    V2 source), optionally through a column-pruning Project;
  *  - its grouping columns are a SUBSET of the view's (equality uses
  *    the state at its own grain; a strict subset ROLLS UP: sums of
  *    sums, min of mins, count(*) = sum(cnt) — all decomposable);
  *  - every aggregate is a plain (no DISTINCT / FILTER) SUM / MIN /
  *    MAX / AVG / COUNT(col) over a view measure, or COUNT(*) /
  *    COUNT(1). AVG derives as SUM(sum_m)/SUM(cnt_m) (its standard
  *    decomposition); COUNT(col) is SUM(cnt_m), the per-measure
  *    non-null count.
  *
  * The rewritten aggregate runs over group-cardinality rows instead of
  * the fact table — at 100 TB that is the difference between a scan and
  * a lookup. Output exprIds and types are preserved, so the surrounding
  * plan is untouched. The state is typed EXACTLY per measure (Spark's
  * own sum widening: Long for integrals, Decimal(p+10, s) for decimals,
  * Double only for floats), so a served SUM/COUNT/MIN/MAX equals the
  * fact-table answer bit-for-bit — including integral sums past 2^53.
  * AVG over an integral measure divides the EXACT sum by the exact
  * count in one double division, at least as accurate as the direct
  * aggregate's double accumulation (equal whenever the sum fits 2^53,
  * more accurate beyond). AVG over a DECIMAL measure is refused:
  * replicating Spark's decimal-division scale rules bit-for-bit is not
  * worth a plausible-but-off-by-ULP answer.
  *
  * Staleness contract: the registrant guarantees the state covers the
  * base (register an MV root, or refresh before querying; drop before
  * mutating without refresh) — the same freshness contract every
  * refresh-based MV system has.
  */
object GraftAggViews {
  /** @param statePath a concrete [[graft.operators.Materialize]]-layout
    *                  parquet state dir, OR an MV root containing a
    *                  `meta` pointer (resolved to the current state_v
    *                  at rewrite time — refresh-safe)
    * @param groupCols the view's grouping columns
    * @param measures  measure columns with cnt_/sum_/min_/max_ state */
  case class AggViewDef(statePath: String, groupCols: Seq[String],
      measures: Seq[String])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, AggViewDef]()

  def register(basePath: String, view: AggViewDef): Unit =
    registry.put(norm(basePath), view)
  def drop(basePath: String): Unit = registry.remove(norm(basePath))
  def lookup(basePath: String): Option[AggViewDef] =
    Option(registry.get(norm(basePath)))

  // normalize through the Hadoop Path/URI machinery so every spelling
  // of the same location ("file:///data/fact", "hdfs://nn:8020/data/
  // fact", "/data/fact", trailing slash) keys identically — the probe
  // side (HadoopFsRelation rootPaths.head.toUri.getPath) yields the
  // scheme-less path, and a string-stripped "file:" left "///path"
  // that could never match it
  private def norm(p: String) = scala.util.Try(
      new org.apache.hadoop.fs.Path(p).toUri.getPath)
    .toOption.filter(_.nonEmpty).getOrElse(p).stripSuffix("/")

  val DisabledConf = "spark.graft.aggRewrite.disabled"
}

case class AggRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (spark.conf.get(GraftAggViews.DisabledConf, "false") == "true") plan
    else plan.transformUp {
      case agg @ Aggregate(groupings, outputs, child, _) =>
        rewrite(groupings, outputs, child).getOrElse(agg)
    }

  /** A registered path resolves through the Materialize meta pointer
    * when one exists (MV-root registration); a concrete state dir is
    * used as-is. Any read failure refuses the rewrite — planning must
    * never crash on a stale registration. */
  private def resolveState(p: String): Option[String] = scala.util.Try {
    // probe through the Hadoop FileSystem of the PATH's scheme, not
    // java.io.File — an MV root on hdfs:///s3a:// (or spelled file:///)
    // is invisible to the local-FS File API, which silently degraded
    // every such registration to "concrete state dir" and refused the
    // rewrite forever
    val meta = new org.apache.hadoop.fs.Path(p, "meta")
    val fs = meta.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(meta)) p
    else {
      val m = spark.read.parquet(meta.toString).head()
      s"$p/${graft.operators.Materialize.stateDir(m)}"
    }
  }.toOption

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
    // predicate filters individual fact rows, which the state can't
    // see — and must be DETERMINISTIC: a reference-free predicate like
    // rand() < p passes the subset check yet means "sample fact ROWS",
    // which re-applied to one-row-per-group state keeps whole groups
    if (!residual.forall(c => c.deterministic &&
        c.references.map(_.name).toSet
          .subsetOf(view.groupCols.toSet))) return None
    // answerability PRE-CHECK before any state I/O: pattern-only, no
    // attributes needed — a bailing query (decimal avg, DISTINCT) must
    // not pay a parquet schema read per planning pass
    def answerableFn(
        fn: org.apache.spark.sql.catalyst.expressions.aggregate
          .AggregateFunction): Boolean = fn match {
      // count(*) / count(1); a NULL literal means count-of-nothing
      // (always 0), which the state can't distinguish from count(*)
      case Count(Seq(Literal(v, _))) => v != null
      // count(col) = non-null count: served by the state's cnt_m
      case Count(Seq(ar: AttributeReference)) =>
        view.measures.contains(ar.name)
      case Sum(ar: AttributeReference, _) => view.measures.contains(ar.name)
      case Min(ar: AttributeReference) => view.measures.contains(ar.name)
      case Max(ar: AttributeReference) => view.measures.contains(ar.name)
      // avg = sum/cnt, both exact in the state; decimal refused (see
      // the scaladoc — Spark's decimal-division scale rules)
      case Average(ar: AttributeReference, _) =>
        view.measures.contains(ar.name) &&
          !ar.dataType.isInstanceOf[DecimalType]
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
    // a registered MV ROOT resolves to its current state_v dir through
    // the meta pointer — refresh rotates directories, and serving a
    // stale pinned dir would return pre-refresh aggregates forever
    val statePath = resolveState(view.statePath).getOrElse(return None)
    val state = scala.util.Try(spark.read.parquet(statePath)
      .queryExecution.analyzed).getOrElse(return None)
    val stateAttr: Map[String, Attribute] =
      state.output.map(a => a.name -> a).toMap
    // a stale/mismatched registration (state missing expected columns)
    // must refuse the rewrite, never crash planning
    val needed = view.groupCols ++ Seq("cnt") ++
      view.measures.flatMap(m =>
        Seq(s"cnt_$m", s"sum_$m", s"min_$m", s"max_$m"))
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
          // count(col) BEFORE the count(*) catch-all — both are Count
          case Count(Seq(ar: AttributeReference)) =>
            Coalesce(Seq(
              merged(stateAttr(s"cnt_${ar.name}"), Sum(_)), Literal(0L)))
          case Count(_) =>
            // COUNT over zero state rows must stay 0, not SUM's NULL
            Coalesce(Seq(merged(stateAttr("cnt"), Sum(_)), Literal(0L)))
          case Sum(ar: AttributeReference, _) =>
            Cast(merged(stateAttr(s"sum_${ar.name}"), Sum(_)), ae.dataType)
          case Min(ar: AttributeReference) =>
            Cast(merged(stateAttr(s"min_${ar.name}"), Min(_)), ae.dataType)
          case Max(ar: AttributeReference) =>
            Cast(merged(stateAttr(s"max_${ar.name}"), Max(_)), ae.dataType)
          case Average(ar: AttributeReference, _) =>
            // exact sum / exact count, one double division — all-NULL
            // groups yield NULL (null sum propagates), like direct avg
            Cast(Divide(
              Cast(merged(stateAttr(s"sum_${ar.name}"), Sum(_)),
                DoubleType),
              Cast(merged(stateAttr(s"cnt_${ar.name}"), Sum(_)),
                DoubleType)), ae.dataType)
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
