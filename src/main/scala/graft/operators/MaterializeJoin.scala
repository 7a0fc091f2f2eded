package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftCatalog

/** Incremental maintenance of an aggregate over a TWO-TABLE equi-join
  * where BOTH sides mutate — the general binary-join IVM the star path
  * deliberately excludes (a [[Materialize.StarDerive]] dimension is
  * fingerprint-FROZEN; here the "dimension" side may churn freely and
  * the fold stays exact).
  *
  * V = γ_G(R ⋈ₖ S), INNER equi-join on same-named key columns.
  * The delta rule is the classic signed (counting) form (Griffin &
  * Libkin, SIGMOD 1995; Blakeley et al., SIGMOD 1986):
  *
  *   Δ(R ⋈ S) = ΔR ⋈ S_old  ∪  R_new ⋈ ΔS
  *
  * with R_new = R_old + ΔR absorbing the ΔR ⋈ ΔS cross term into the
  * second leg. Each signed delta row (insert +1, retraction pre-image
  * −1, reconstructed from the change log exactly like
  * [[Materialize.refresh]]'s retraction slice) joins the OTHER side at
  * the right point in time: S_old is the catalog's as-of read at the
  * version the state last folded ([[GraftCatalog.snapshotAsOf]]), so
  * no change is double-counted however the two logs interleave.
  *
  * Per-refresh cost is O(delta × join fan-out), NOT O(R) + O(S): each
  * leg's "other side" scan is semi-join-bounded to the delta's join
  * keys, and for a single-column key the scan also gets the delta
  * keys' [min, max] zone filter — when the key is the other table's PK
  * or its layout is key-clustered ([[Layout]]), parquet row-group
  * stats skip the untouched base, the same pruning discipline the
  * single-table refresh applies to its own log
  * ([[Materialize.preImageChanges]]). COUNT/SUM fold algebraically
  * through the signed weights; MIN/MAX retraction groups ride the same
  * extremum gate as the single-table fold (a retracted joined value
  * that neither ties nor crosses the state's extremum proves NO
  * recompute is needed), and the gated-in groups recompute from the
  * joined snapshots restricted to those groups with IN-pushdown on the
  * plain group columns.
  *
  * Scope guard: both tables must be TTL-free (time-based expiry of
  * JOINED rows needs both sides' expiry windows crossed — refused, not
  * silently wrong); either table compacting since the last fold
  * (history discarded) forces a full rebuild, detected exactly like
  * the single-table path. State layout matches
  * [[Materialize.aggregate]] (cnt / cnt_m / sum_m / min_m / max_m), so
  * everything downstream of a single-table MV (serving, reads) works
  * unchanged.
  *
  * Reference: apache/phoenix maintains only single-table secondary
  * indexes and has no join-view maintenance
  * (phoenix-core-client/src/main/java/org/apache/phoenix/compile/
  * JoinCompiler.java:1 computes joins per query); this operator is the
  * warehouse-side generalization a 100 TB fact-to-fact dashboard
  * needs.
  */
object MaterializeJoin {

  /** Equi-join spec: same-named `keys` in both tables; every non-key
    * column name must be unique across the two tables (the joined row
    * is R's columns ++ S's non-key columns).
    *
    * `leftKeysImmutable` / `rightKeysImmutable` declare that a side's
    * join-key VALUES never change across versions of a PK (the
    * FK-never-rewritten shape — a lineitem's orderkey is fixed at
    * insert). Under that contract the refresh reads that side's
    * delta-bounded slice through a raw-log prefilter BELOW the
    * last-wins collapse ([[GraftCatalog.snapshotPrefiltered]]), where
    * parquet row-group stats prune the untouched base — without it,
    * a non-PK join key can only filter ABOVE the collapse and the
    * leg's "other side" pays a full scan per refresh (shuffle still
    * delta-bounded, read not). Keys that ARE the side's PK need no
    * declaration: a grouping-key filter pushes below the collapse
    * already. Declaring immutability for a key that mutates yields
    * SILENTLY WRONG winners — it is a contract, not a hint. */
  final case class JoinSpec(left: String, right: String,
      keys: Seq[String],
      leftKeysImmutable: Boolean = false,
      rightKeysImmutable: Boolean = false)

  /** Test/diagnostic instrumentation, single-writer (same contract as
    * [[Materialize.LastRefresh]]). */
  private[graft] object LastRefresh {
    @volatile var affectedGroups: Long = -1L
    @volatile var recomputeRan: Boolean = false
  }

  private def requireNoTtl(cat: GraftCatalog, table: String): Unit =
    require(cat.ttlSeconds(table).isEmpty,
      s"join-MV maintenance requires TTL-free tables; '$table' has a " +
        "TTL (joined-row expiry would need both sides' windows crossed)")

  private def joinedSnapshot(cat: GraftCatalog, js: JoinSpec)
      : DataFrame =
    cat.snapshot(js.left).join(cat.snapshot(js.right), js.keys)

  private def validate(cat: GraftCatalog, js: JoinSpec,
      groupCols: Seq[String], measures: Seq[String]): Unit = {
    requireNoTtl(cat, js.left); requireNoTtl(cat, js.right)
    val lf = cat.spec(js.left).schema.fieldNames.toSeq
    val rf = cat.spec(js.right).schema.fieldNames.toSeq
    js.keys.foreach { k =>
      require(lf.contains(k) && rf.contains(k),
        s"join key '$k' must exist in both '${js.left}' and " +
          s"'${js.right}'")
    }
    val dup = (lf.filterNot(js.keys.contains) intersect
      rf.filterNot(js.keys.contains))
    require(dup.isEmpty,
      s"non-key columns must be unique across the join: $dup appear " +
        "in both tables (rename at the catalog schema)")
    val joined = (lf ++ rf).distinct
    (groupCols ++ measures).foreach(c => require(joined.contains(c),
      s"column '$c' not present in the joined schema $joined"))
  }

  private def highWater(cat: GraftCatalog, table: String): Long =
    cat.changeLog(table)
      .agg(coalesce(max(col("_version")), lit(-1L))).head.getLong(0)

  private def writeMeta(spark: SparkSession, path: String,
      js: JoinSpec, vL: Long, vR: Long, groupCols: Seq[String],
      measures: Seq[String], stateDirName: String): Unit = {
    import spark.implicits._
    Seq((js.left, js.right, js.keys, vL, vR, groupCols, measures,
        stateDirName, js.leftKeysImmutable, js.rightKeysImmutable))
      .toDF("left", "right", "keys", "last_vl", "last_vr",
        "group_cols", "measures", "state_dir", "left_imm", "right_imm")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  private def meta(spark: SparkSession, path: String)
      : org.apache.spark.sql.Row =
    spark.read.parquet(s"$path/meta").head()

  private def specOf(m: org.apache.spark.sql.Row): JoinSpec =
    JoinSpec(m.getAs[String]("left"), m.getAs[String]("right"),
      m.getSeq[String](m.fieldIndex("keys")),
      leftKeysImmutable = m.schema.fieldNames.contains("left_imm") &&
        m.getAs[Boolean]("left_imm"),
      rightKeysImmutable = m.schema.fieldNames.contains("right_imm") &&
        m.getAs[Boolean]("right_imm"))

  /** Full build: aggregate the joined current snapshots, persist,
    * record BOTH change-log high-water marks. */
  def build(cat: GraftCatalog, js: JoinSpec, groupCols: Seq[String],
      measures: Seq[String], path: String): (Long, Long) = {
    val spark = cat.changeLog(js.left).sparkSession
    validate(cat, js, groupCols, measures)
    val vL = highWater(cat, js.left)
    val vR = highWater(cat, js.right)
    val agg = Materialize.aggregate(joinedSnapshot(cat, js), groupCols,
      measures)
    // flip-don't-overwrite: same naming discipline as Materialize
    val nd = s"state_v${vL}_$vR"
    agg.write.mode(SaveMode.Overwrite).parquet(s"$path/$nd")
    writeMeta(spark, path, js, vL, vR, groupCols, measures, nd)
    (vL, vR)
  }

  /** The maintained aggregate as a DataFrame (current persisted
    * state). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = meta(spark, path)
    spark.read.parquet(s"$path/${m.getAs[String]("state_dir")}")
  }

  /** Register the join MV so [[graft.plans.AggRewriteRule]] serves a
    * matching aggregate-over-INNER-join query from the state — the
    * `DimJoinDef.innerState` contract: INNER joins of exactly these
    * tables on exactly these keys serve; LEFT joins and un-joined
    * bare-fact aggregates refuse (the state never counted unmatched
    * fact rows). Staleness safety is the snapshot-cache design's: the
    * rewrite only fires on PURE cache scans of BOTH tables, and any
    * mutation to either makes its cache stale, reverting the query to
    * the collapse plan. Refresh both snapshot caches after
    * [[refresh]]. */
  def registerForRewrite(cat: GraftCatalog, path: String): Unit = {
    val spark = cat.session
    val m = meta(spark, path)
    val js = specOf(m)
    val groupCols = m.getSeq[String](m.fieldIndex("group_cols"))
    val measures = m.getSeq[String](m.fieldIndex("measures"))
    val rf = cat.spec(js.right).schema.fieldNames.toSet
    // state columns living on the RIGHT side serve through the dim
    // join — identity-mapped, the state stores the dim's own names
    val attrs = (groupCols ++ measures)
      .filter(c => rf.contains(c) && !js.keys.contains(c))
      .map(c => c -> c).toMap
    graft.plans.GraftAggViews.register(cat.tablePath(js.left),
      graft.plans.GraftAggViews.AggViewDef(path, groupCols, measures,
        dims = Seq(graft.plans.GraftAggViews.DimJoinDef(
          cat.tablePath(js.right), factKeys = js.keys,
          dimKeys = js.keys, dimAttrs = attrs, innerState = true))))
  }

  /** Signed row-level delta of `table` since `lastV`: post images
    * weight +1, valid retraction pre-images weight −1 (the chain
    * telescopes for multi-version churn within one delta, exactly
    * like the single-table retraction slice — every within-delta post
    * is +1, so every within-delta pre-image was counted and retracts).
    * TTL-free tables only (enforced at build/refresh). */
  private def signedDelta(cat: GraftCatalog, table: String,
      lastV: Long): DataFrame = {
    val s = cat.spec(table)
    val fields = s.schema.fieldNames.toSeq
    val changes = Materialize.preImageChanges(cat.changeLogRaw(table),
      fields, s.pk, lastV)
    val hasPrev =
      col("_prev").isNotNull && !col("_prev").getField("__del")
    val posts = changes.where(!col("_deleted"))
      .select(fields.map(col) :+ lit(1L).as("__w"): _*)
    val pres = changes.where(hasPrev)
      .select(fields.map(f => col(s"_prev.$f").as(f)) :+
        lit(-1L).as("__w"): _*)
    posts.unionByName(pres)
  }

  /** The non-delta side of one delta-join leg, bounded to the delta's
    * join keys: a distinct-key semi-join caps the SHUFFLE, and for a
    * single-column key the delta's [min, max] zone filter bounds the
    * READ — below the last-wins collapse when that is sound (the key
    * is the side's PK, so a grouping-key filter pushes past the
    * aggregate on its own; or the spec declares the key immutable and
    * [[GraftCatalog.snapshotPrefiltered]] filters the raw log), where
    * parquet row-group stats skip the untouched base under any
    * key-clustered layout. Mutable non-PK keys keep the filter above
    * the collapse: still delta-bounded shuffle, full-scan read — the
    * honest fallback. */
  private def boundedSide(cat: GraftCatalog, table: String,
      asOf: Option[Long], delta: DataFrame, keys: Seq[String],
      immutable: Boolean): DataFrame = {
    def plain: DataFrame = asOf match {
      case Some(v) => cat.snapshotAsOf(table, v)
      case None => cat.snapshot(table)
    }
    val zone: Option[Option[(Any, Any)]] =
      if (keys.size != 1) None
      else scala.util.Try {
        val b = delta.agg(min(col(keys.head)), max(col(keys.head))).head
        if (b.isNullAt(0)) Some(None) // delta keys all NULL: no match
        else Some(Some((b.get(0), b.get(1))))
      }.getOrElse(None) // un-orderable key type: semi-join only
    val pkIsKey = keys.toSet == cat.spec(table).pk.toSet
    val ranged = zone match {
      case Some(None) => plain.where(lit(false))
      case Some(Some((lo, hi))) =>
        val cond = col(keys.head).between(lit(lo), lit(hi))
        // below-collapse read bound when sound; the PK case gets it
        // from Catalyst's grouping-key pushdown on the plain snapshot
        if (immutable && !pkIsKey)
          cat.snapshotPrefiltered(table, cond, asOf)
        else plain.where(cond)
      case None => plain
    }
    val dk = delta.select(keys.map(c => col(c).as(s"__k_$c")): _*)
      .distinct()
    val cond = keys.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    ranged.join(dk, cond, "left_semi")
  }

  /** Fold both tables' writes since the last refresh into the
    * persisted joined-aggregate state. Returns the new (leftV, rightV)
    * high-water pair (== the old pair when neither table changed). */
  def refresh(cat: GraftCatalog, path: String): (Long, Long) = {
    val spark = cat.session
    val m = meta(spark, path)
    val js = specOf(m)
    requireNoTtl(cat, js.left); requireNoTtl(cat, js.right)
    val lastVL = m.getAs[Long]("last_vl")
    val lastVR = m.getAs[Long]("last_vr")
    val groupCols = m.getSeq[String](m.fieldIndex("group_cols"))
    val measures = m.getSeq[String](m.fieldIndex("measures"))
    val marksOf: String => (Long, Long) = t =>
      cat.changeLogRaw(t).agg(
        coalesce(max(col("_version")), lit(-1L)),
        coalesce(min(col("_version")), lit(Long.MaxValue))).head match {
        case r => (r.getLong(0), r.getLong(1))
      }
    val (newVL, minVL) = marksOf(js.left)
    val (newVR, minVR) = marksOf(js.right)
    if (newVL == lastVL && newVR == lastVR) return (lastVL, lastVR)
    // either log compacted past the fold point → only a rebuild is
    // correct (the history the state summarizes is gone)
    if (minVL > lastVL || minVR > lastVR) {
      build(cat, js, groupCols, measures, path)
      return (highWater(cat, js.left), highWater(cat, js.right))
    }

    //   Δ(R ⋈ S) = ΔR ⋈ S_old  ∪  R_new ⋈ ΔS
    // S_old is the as-of read at the RIGHT's fold point; R_new the
    // current left snapshot — the cross term ΔR ⋈ ΔS lands exactly
    // once (in the second leg). Joined weight = the delta row's sign
    // (the snapshot side is all +1).
    val dL = signedDelta(cat, js.left, lastVL)
    val dR = signedDelta(cat, js.right, lastVR)
    val sOld = boundedSide(cat, js.right, Some(lastVR), dL, js.keys,
      js.rightKeysImmutable)
    val rNew = boundedSide(cat, js.left, None, dR, js.keys,
      js.leftKeysImmutable)
    val legL = dL.join(sOld, js.keys)
    val legR = rNew.join(dR, js.keys)
    val delta = legL.unionByName(legR, allowMissingColumns = false)

    val state = read(spark, path)
    val stT: String => DataType = c => state.schema(c).dataType
    val mT: String => DataType = mm => stT(s"min_$mm")

    def carry(smin: String => Column, rmin: String => Column,
        smax: String => Column, rmax: String => Column): Seq[Column] =
      measures.flatMap(mm => Seq(
        smin(mm).cast(mT(mm)).as(s"__smin_$mm"),
        smax(mm).cast(mT(mm)).as(s"__smax_$mm"),
        rmin(mm).cast(mT(mm)).as(s"__rmin_$mm"),
        rmax(mm).cast(mT(mm)).as(s"__rmax_$mm")))
    val nul: String => Column = _ => lit(null)

    val stateRows = state
      .withColumn("__retr", lit(0)).withColumn("__instate", lit(1))
      .select(col("*") +: carry(mm => col(s"min_$mm"), nul,
        mm => col(s"max_$mm"), nul): _*)
    // the SAME aggregate layout the build uses (type-strict union)
    val postRows = Materialize.aggregate(
        delta.where(col("__w") > 0).drop("__w"), groupCols, measures)
      .withColumn("__retr", lit(0)).withColumn("__instate", lit(0))
      .select(col("*") +: carry(nul, nul, nul, nul): _*)
    val retr = delta.where(col("__w") < 0).drop("__w")
    val retrRows = retr
      .groupBy(groupCols.map(col): _*)
      .agg((-count(lit(1))).as("cnt"),
        measures.flatMap(mm => Seq(
          (-count(col(mm))).cast(stT(s"cnt_$mm")).as(s"cnt_$mm"),
          (-sum(col(mm))).cast(stT(s"sum_$mm")).as(s"sum_$mm"),
          lit(null).cast(stT(s"min_$mm")).as(s"min_$mm"),
          lit(null).cast(stT(s"max_$mm")).as(s"max_$mm"),
          min(col(mm)).cast(mT(mm)).as(s"__rmin_$mm"),
          max(col(mm)).cast(mT(mm)).as(s"__rmax_$mm"))): _*)
      .withColumn("__retr", lit(1)).withColumn("__instate", lit(0))
      .select(col("*") +: measures.flatMap(mm => Seq(
        lit(null).cast(mT(mm)).as(s"__smin_$mm"),
        lit(null).cast(mT(mm)).as(s"__smax_$mm"))): _*)

    val merged = stateRows.unionByName(postRows).unionByName(retrRows)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        measures.flatMap(mm => Seq(
          sum(col(s"cnt_$mm")).as(s"cnt_$mm"),
          sum(col(s"sum_$mm")).as(s"sum_$mm"),
          min(col(s"min_$mm")).as(s"min_$mm"),
          max(col(s"max_$mm")).as(s"max_$mm"))) ++
          Seq(max(col("__retr")).as("__retr"),
            max(col("__instate")).as("__instate")) ++
          measures.flatMap(mm => Seq(
            min(col(s"__smin_$mm")).as(s"__smin_$mm"),
            max(col(s"__smax_$mm")).as(s"__smax_$mm"),
            min(col(s"__rmin_$mm")).as(s"__rmin_$mm"),
            max(col(s"__rmax_$mm")).as(s"__rmax_$mm"))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // extremum gate — identical algebra to the single-table fold:
      // only a retraction group where some retracted joined value ties
      // or crosses the prior state's min/max (or that the state never
      // held) recomputes; every other group folded algebraically.
      val needsRecompute = col("__instate") === 0 ||
        measures.map(mm =>
          col(s"__rmin_$mm").isNotNull && (col(s"__smin_$mm").isNull ||
            col(s"__rmin_$mm") <= col(s"__smin_$mm") ||
            col(s"__rmax_$mm") >= col(s"__smax_$mm")))
          .foldLeft(lit(false))(_ || _)
      val internals = Seq("__retr", "__instate") ++
        measures.flatMap(mm => Seq(s"__smin_$mm", s"__smax_$mm",
          s"__rmin_$mm", s"__rmax_$mm"))
      val kept = merged
        .where((col("__retr") === 0 || !needsRecompute) &&
          col("cnt") > 0)
        .drop(internals: _*)
      val affected = merged.where(col("__retr") > 0 && needsRecompute)
        .select(groupCols.map(c => col(c).as(s"__a_$c")): _*)
      val affectedCount = affected.count()
      LastRefresh.affectedGroups = affectedCount
      LastRefresh.recomputeRan = affectedCount > 0
      val affRows =
        if (affectedCount > 0 && affectedCount <= 1024)
          Some(affected.collect().toSeq)
        else None
      val out = if (affectedCount == 0) kept
        else kept.unionByName(recomputeJoined(cat, js, groupCols,
          measures, affected, affRows))
      val nd = s"state_v${newVL}_$newVR"
      out.write.mode(SaveMode.Overwrite).parquet(s"$path/$nd")
      writeMeta(spark, path, js, newVL, newVR, groupCols, measures, nd)
      (newVL, newVR)
    } finally merged.unpersist()
  }

  /** Affected-group recompute over the CURRENT joined snapshots,
    * bounded to the gated-in groups: an IN prefilter on each plain
    * group column reaches its owning side's scan (below the join), and
    * the affected semi-join caps the aggregate itself — delta-group-
    * sized work against the join, never the full γ(R ⋈ S). */
  private def recomputeJoined(cat: GraftCatalog, js: JoinSpec,
      groupCols: Seq[String], measures: Seq[String],
      affected: DataFrame,
      affRows: Option[Seq[org.apache.spark.sql.Row]]): DataFrame = {
    val affCond = groupCols.map(c => col(c) <=> col(s"__a_$c"))
      .reduce(_ && _)
    val prefilter: Column = affRows match {
      case Some(rows) if groupCols.nonEmpty =>
        groupCols.map { c =>
          val idx = groupCols.indexOf(c)
          val vs = rows.map(_.get(idx)).distinct
          val nonNull = vs.filterNot(_ == null)
          val base: Column =
            if (nonNull.isEmpty) lit(false)
            else col(c).isInCollection(nonNull)
          if (vs.contains(null)) base || col(c).isNull else base
        }.reduce(_ && _)
      case _ => lit(true)
    }
    Materialize.aggregate(
      joinedSnapshot(cat, js).where(prefilter)
        .join(affected, affCond, "left_semi"),
      groupCols, measures)
  }
}
