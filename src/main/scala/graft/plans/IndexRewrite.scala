package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import graft.sources.{GraftPk, GraftPkTable}

/** Secondary-index-as-materialized-projection rewrite — the Spark-native
  * analog of Phoenix's covered-index selection (reference:
  * cc/optimize/QueryOptimizer.java:103,652 — when a query's references
  * are covered by an index table and its predicate leads with the index
  * key, Phoenix swaps the scan to the index and never touches the base
  * table).
  *
  * Here an "index" is a PK-sorted parquet projection of the base table
  * (same rows, column subset, re-sorted by the indexed key — written by
  * `Layout`-style jobs). The optimizer rule rewrites
  * `Project(..., [Filter(...),] graftpk(base))` to the same plan over
  * `graftpk(index)` when every referenced column exists in the index and
  * the filter references the index's leading key — which then gets the
  * V2 source's key-range file pruning and sort-order reporting on the
  * indexed column for free. Output attribute ids are preserved via
  * aliases, so the surrounding plan is untouched.
  */
object GraftIndexes {
  /** @param indexPath sorted-projection location
    * @param indexPk   index key columns (leading column drives pruning) */
  case class IndexDef(indexPath: String, indexPk: Seq[String]) {
    lazy val schema: org.apache.spark.sql.types.StructType =
      GraftPk.inferSchema(indexPath)
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, IndexDef]()

  // synchronized: the cycle walk below is check-then-put — two
  // concurrent register() calls (a→b and b→a) could each pass the walk
  // before either put lands, creating exactly the ping-pong cycle the
  // check exists to prevent. Registrations are rare control-plane
  // calls; a lock costs nothing.
  def register(basePath: String, index: IndexDef): Unit = synchronized {
    // validate HERE, not during planning: a malformed registration
    // (empty key, missing/empty index dir) would otherwise throw
    // inside the optimizer rule and fail EVERY query on the base table
    require(index.indexPk.nonEmpty,
      s"index for $basePath needs at least one key column")
    require(index.indexPk.forall(index.schema.fieldNames.contains),
      s"index key ${index.indexPk} not in index schema " +
        s"${index.schema.fieldNames.mkString(",")}")
    // a self-referential registration (base as its own 'index') makes
    // every optimizer pass rewrite to a FRESH relation with new
    // exprIds — the fixpoint never converges and each query burns the
    // full optimizer iteration budget
    require(norm(basePath) != norm(index.indexPath),
      s"index path must differ from the base path ($basePath)")
    // same failure mode through a CYCLE (a→b registered, then b→a):
    // the rule would ping-pong the relation between the two paths every
    // optimizer iteration. Chains (a→b→c) are fine — they converge in
    // ≤ chain-length rewrites — so walk the existing chain from the new
    // index and refuse only if it leads back to the base.
    var hop = GraftIndexes.lookup(index.indexPath)
    var hops = 0
    while (hop.isDefined) {
      require(norm(hop.get.indexPath) != norm(basePath),
        s"registering $basePath -> ${index.indexPath} closes an index " +
          "cycle — the optimizer fixpoint would never converge")
      hops += 1
      require(hops <= registry.size, "index registry contains a cycle")
      hop = GraftIndexes.lookup(hop.get.indexPath)
    }
    registry.put(norm(basePath), index)
  }
  def drop(basePath: String): Unit = registry.remove(norm(basePath))
  def lookup(basePath: String): Option[IndexDef] =
    Option(registry.get(norm(basePath)))

  private def norm(p: String) =
    p.stripPrefix("file:").stripSuffix("/")
}

object IndexRewriteRule {
  /** Session conf disabling the rewrite (the Phoenix `NO_INDEX` hint —
    * reference cc/parse/HintNode.java). Statement-scoped use: set it,
    * force the statement's optimizedPlan, unset. */
  val DisabledConf = "spark.graft.indexRewrite.disabled"
}

case class IndexRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (spark.conf.get(IndexRewriteRule.DisabledConf, "false") == "true")
      plan
    else plan.transformUp {
      case p @ Project(list, Filter(cond, rel: DataSourceV2Relation)) =>
        rewrite(rel, list, Some(cond)).getOrElse(p)
      case p @ Project(list, rel: DataSourceV2Relation) =>
        rewrite(rel, list, None).getOrElse(p)
    }

  private def basePathOf(rel: DataSourceV2Relation): Option[String] =
    rel.table match {
      case t: GraftPkTable => Some(t.name().stripPrefix("graftpk:"))
      case _ => None
    }

  private def rewrite(rel: DataSourceV2Relation,
      list: Seq[NamedExpression], cond: Option[Expression])
      : Option[LogicalPlan] = try {
    for {
      base <- basePathOf(rel)
      idx <- GraftIndexes.lookup(base)
      refs = (list.flatMap(_.references) ++
        cond.toSeq.flatMap(_.references)).map(_.name).toSet
      // covered: every referenced column exists in the index projection
      if refs.subsetOf(idx.schema.fieldNames.toSet)
      // type-faithful: the parent plan binds by exprId, so the alias
      // that swaps in an index attribute MUST carry the base column's
      // exact type — a stale/regenerated index with e.g. id BIGINT over
      // a base id INT would make codegen read 8 bytes where 4 were
      // promised, silently. Nullability may only narrow (a nullable
      // index column under a non-null base attr re-opens null paths the
      // parent already eliminated).
      if refs.forall { n =>
        (rel.output.find(_.name == n),
          idx.schema.fields.find(_.name == n)) match {
          case (Some(ba), Some(f)) =>
            ba.dataType == f.dataType && (!f.nullable || ba.nullable)
          case _ => false
        }
      }
      // worthwhile: the predicate drives the index's leading key (a
      // filterless covered projection also qualifies — thinner scan)
      if cond.forall(_.references.map(_.name).toSet
        .contains(idx.indexPk.head))
    } yield {
      val idxTable = new GraftPkTable(idx.schema, idx.indexPath,
        idx.indexPk.toArray)
      val newRel = DataSourceV2Relation.create(idxTable, None, None)
      val byName: Map[String, Attribute] =
        newRel.output.map(a => a.name -> a).toMap
      def remap(e: Expression): Expression = e.transformUp {
        case a: AttributeReference => byName(a.name)
      }
      // preserve the original output exprIds so the parent plan resolves
      val newList = list.map {
        case ar: AttributeReference =>
          Alias(byName(ar.name), ar.name)(exprId = ar.exprId)
        case al: Alias =>
          Alias(remap(al.child), al.name)(exprId = al.exprId,
            qualifier = al.qualifier,
            explicitMetadata = al.explicitMetadata)
        case other => remap(other).asInstanceOf[NamedExpression]
      }
      cond match {
        case Some(c) => Project(newList, Filter(remap(c), newRel))
        case None => Project(newList, newRel)
      }
    }
  } catch {
    // a registration gone stale AFTER register-time validation (index
    // dir deleted, files moved) must refuse the rewrite and leave the
    // base-table plan intact — never fail the user's query in the
    // optimizer
    case _: IllegalArgumentException | _: java.io.IOException |
        _: java.io.UncheckedIOException => None
  }
}

/** SparkSessionExtensions hook: `.withExtensions(GraftExtensions.install)`
  * or `spark.sql.extensions=graft.plans.GraftSparkExtensions`. */
class GraftSparkExtensions
    extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(IndexRewriteRule)
    e.injectOptimizerRule(AggRewriteRule)
  }
}
