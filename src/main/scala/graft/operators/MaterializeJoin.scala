package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftCatalog

/** Incremental maintenance of an aggregate over an equi-join of a FACT
  * table and N side tables where EVERY table mutates — the general
  * join IVM the star path deliberately excludes (a
  * [[Materialize.StarDerive]] dimension is fingerprint-FROZEN; here
  * every side may churn freely and the fold stays exact).
  *
  * V = γ_G(F ⋈ₖ₁ S₁ ⋈ₖ₂ … ⋈ₖₙ Sₙ), INNER equi-joins on same-named key
  * columns, each side's keys living on the FACT (the star/galaxy
  * shape). The delta rule is the signed (counting) telescoping
  * expansion (Blakeley et al., SIGMOD 1986; Griffin & Libkin, SIGMOD
  * 1995) — for two sides:
  *
  *   Δ(F⋈S₁⋈S₂) = ΔF ⋈ S₁_old ⋈ S₂_old
  *              ∪ F_new ⋈ ΔS₁ ⋈ S₂_old
  *              ∪ F_new ⋈ S₁_new ⋈ ΔS₂
  *
  * — sides BEFORE the delta factor read NEW, sides AFTER read OLD
  * (as-of the version the state last folded,
  * [[GraftCatalog.snapshotAsOf]]), so every cross term lands exactly
  * once however the logs interleave. Each signed delta row (insert +1,
  * retraction pre-image −1, reconstructed from the change log exactly
  * like [[Materialize.refresh]]'s retraction slice) carries its weight
  * through the joins (snapshots are all +1).
  *
  * Per-refresh cost is O(delta × join fan-out), NOT O(F) + Σ O(Sᵢ):
  * every leg's non-delta reads are key-bounded — a distinct-key
  * semi-join caps the SHUFFLE, and the delta's [min, max] key zone
  * bounds the READ below the last-wins collapse (PK keys via
  * Catalyst's grouping-key pushdown; non-PK fact FKs under the
  * declared-immutability contract via
  * [[GraftCatalog.snapshotPrefiltered]]). COUNT/SUM fold algebraically
  * through the signed weights; MIN/MAX retraction groups ride the same
  * extremum gate as the single-table fold, and gated-in groups
  * recompute from the joined current snapshots restricted to those
  * groups with IN-pushdown on the plain group columns.
  *
  * Scope guard: every table must be TTL-free (time-based expiry of
  * JOINED rows needs all sides' expiry windows crossed — refused, not
  * silently wrong); any table compacting since the last fold (history
  * discarded) forces a full rebuild. State layout matches
  * [[Materialize.aggregate]] (cnt / cnt_m / sum_m / min_m / max_m), so
  * everything downstream of a single-table MV (serving, reads,
  * rewrite) works unchanged.
  *
  * Reference: apache/phoenix maintains only single-table secondary
  * indexes and has no join-view maintenance
  * (phoenix-core-client/src/main/java/org/apache/phoenix/compile/
  * JoinCompiler.java:1 computes joins per query); this operator is the
  * warehouse-side generalization a 100 TB fact-to-fact dashboard
  * needs.
  */
object MaterializeJoin {

  /** One side of the chain: same-named `keys` in the fact and this
    * table. `sideKeysImmutable` / `factKeysImmutable` declare that the
    * key VALUES never change across versions of a PK on that side
    * (the FK-fixed-at-insert shape) — under the contract the refresh
    * zone-filters that side's RAW log below the last-wins collapse
    * ([[GraftCatalog.snapshotPrefiltered]]), where parquet row-group
    * stats prune the untouched base; without it a non-PK key only
    * filters ABOVE the collapse and the leg pays a full read (shuffle
    * still delta-bounded). Keys that ARE the table's PK need no
    * declaration. The contract is ENFORCED: build sweeps the full
    * history and every refresh sweeps its delta window, REFUSING on an
    * unsafe key mutation (a change without an intervening tombstone —
    * delete-then-reinsert under a new key is provably safe and stays
    * allowed) instead of surfacing stale winners. */
  final case class SideSpec(table: String, keys: Seq[String],
      sideKeysImmutable: Boolean = false,
      factKeysImmutable: Boolean = false)

  /** Fact ⋈ N mutating sides, every side's keys on the fact. */
  final case class ChainSpec(fact: String, sides: Seq[SideSpec])

  /** The binary special case, kept as the primary API: `keys` exist in
    * both tables; see [[SideSpec]] for the immutability contract. */
  final case class JoinSpec(left: String, right: String,
      keys: Seq[String],
      leftKeysImmutable: Boolean = false,
      rightKeysImmutable: Boolean = false) {
    private[operators] def chain: ChainSpec =
      ChainSpec(left, Seq(SideSpec(right, keys,
        sideKeysImmutable = rightKeysImmutable,
        factKeysImmutable = leftKeysImmutable)))
  }

  /** Test/diagnostic instrumentation, single-writer (same contract as
    * [[Materialize.LastRefresh]]). */
  private[graft] object LastRefresh {
    @volatile var affectedGroups: Long = -1L
    @volatile var recomputeRan: Boolean = false
  }

  private def requireNoTtl(cat: GraftCatalog, table: String): Unit =
    require(cat.ttlSeconds(table).isEmpty,
      s"join-MV maintenance requires TTL-free tables; '$table' has a " +
        "TTL (joined-row expiry would need all sides' windows crossed)")

  private def joinedSnapshot(cat: GraftCatalog, cs: ChainSpec)
      : DataFrame =
    cs.sides.foldLeft(cat.snapshot(cs.fact)) { (acc, s) =>
      acc.join(cat.snapshot(s.table), s.keys)
    }

  private def validate(cat: GraftCatalog, cs: ChainSpec,
      groupCols: Seq[String], measures: Seq[String],
      grains: Seq[(String, String)] = Seq.empty): Unit = {
    require(cs.sides.nonEmpty, "a join MV needs at least one side")
    requireNoTtl(cat, cs.fact)
    val ff = cat.spec(cs.fact).schema.fieldNames.toSeq
    val allKeys = cs.sides.flatMap(_.keys).toSet
    cs.sides.foreach { s =>
      requireNoTtl(cat, s.table)
      val sf = cat.spec(s.table).schema.fieldNames.toSeq
      s.keys.foreach { k =>
        require(ff.contains(k) && sf.contains(k),
          s"join key '$k' must exist in both '${cs.fact}' (fact) and " +
            s"'${s.table}'")
      }
    }
    // every non-key column name unique across ALL tables (the joined
    // row is fact columns ++ each side's non-key columns)
    val perTable = (cs.fact +: cs.sides.map(_.table)).map(t =>
      t -> cat.spec(t).schema.fieldNames.toSeq.filterNot(allKeys.contains))
    val dup = perTable.flatMap(_._2).groupBy(identity)
      .collect { case (c, vs) if vs.size > 1 => c }
    require(dup.isEmpty,
      s"non-key columns must be unique across the join: ${dup.toSeq} " +
        "appear in more than one table (rename at the catalog schema)")
    val joined = perTable.flatMap(_._2) ++ allKeys
    val grainNames = grains.map(_._1).toSet
    (groupCols ++ measures).filterNot(grainNames.contains)
      .foreach(c => require(joined.contains(c),
        s"column '$c' not present in the joined schema $joined"))
  }

  private def highWater(cat: GraftCatalog, table: String): Long =
    cat.changeLog(table)
      .agg(coalesce(max(col("_version")), lit(-1L))).head.getLong(0)

  /** table → join-key columns the spec declares immutable on it. */
  private def declaredImmutable(cs: ChainSpec)
      : Map[String, Seq[String]] = {
    val fact = cs.sides.filter(_.factKeysImmutable)
      .flatMap(_.keys).distinct
    val entries =
      (if (fact.nonEmpty) Seq(cs.fact -> fact) else Nil) ++
        cs.sides.filter(_.sideKeysImmutable).map(s => s.table -> s.keys)
    entries.groupBy(_._1)
      .map { case (t, vs) => t -> vs.flatMap(_._2).distinct }
  }

  /** ENFORCE the declared-immutability contract over `table`'s history
    * since `sinceV` (−1 = all of it, the build-time sweep): a declared
    * key whose value differs from the row's immediately-previous LIVE
    * version is the unsafe mutation — [[GraftCatalog
    * .snapshotPrefiltered]] would surface the stale version as a
    * phantom winner. A key change ACROSS A TOMBSTONE (delete, then
    * re-insert under a new key) is provably safe — the tombstone wins
    * any slice that keeps only the old key's history, so the row is
    * correctly absent there — and stays allowed. Build sweeps the full
    * log and every refresh sweeps its own delta window (whose lag
    * pre-images cross the window boundary), so any unsafe mutation is
    * caught at the first fold that could read it wrong; compaction
    * discards history but also forces a rebuild, which re-sweeps. */
  private def requireImmutable(cat: GraftCatalog, table: String,
      immKeys0: Seq[String], sinceV: Long): Unit = {
    // PK components are constant per row by construction — only
    // genuinely mutable columns need the sweep
    val immKeys = immKeys0.filterNot(cat.spec(table).pk.contains)
    if (immKeys.isEmpty) return
    val s = cat.spec(table)
    val changes = Materialize.preImageChanges(cat.changeLogRaw(table),
      s.schema.fieldNames.toSeq, s.pk, sinceV)
    val hasPrev =
      col("_prev").isNotNull && !col("_prev").getField("__del")
    val mutated = immKeys
      .map(k => !(col(k) <=> col(s"_prev.$k"))).reduce(_ || _)
    val bad = changes.where(hasPrev && mutated).limit(1).count()
    require(bad == 0,
      s"join key(s) ${immKeys.mkString(", ")} of '$table' are declared " +
        "immutable but changed across row versions — the declaration " +
        "is a correctness contract (a prefiltered read would surface " +
        "a stale version as the winner). Rebuild the MV without the " +
        "declaration, or delete-then-reinsert instead of overwriting " +
        "the key")
  }

  private def writeMeta(spark: SparkSession, path: String,
      cs: ChainSpec, vF: Long, vS: Seq[Long], groupCols: Seq[String],
      measures: Seq[String], stateDirName: String,
      sketches: Seq[(String, Int)], topks: Seq[(String, Int)],
      grains: Seq[(String, String)]): Unit = {
    import spark.implicits._
    Seq((cs.fact, cs.sides.map(_.table), cs.sides.map(_.keys),
        cs.sides.map(_.sideKeysImmutable),
        cs.sides.map(_.factKeysImmutable),
        vF, vS, groupCols, measures, stateDirName,
        sketches.map(_._1), sketches.map(_._2.toLong),
        topks.map(_._1), topks.map(_._2.toLong),
        grains.map(_._1), grains.map(_._2),
        spark.conf.get("spark.sql.session.timeZone")))
      .toDF("fact", "side_tables", "side_keys", "side_imms",
        "fact_imms", "last_vf", "last_vs", "group_cols", "measures",
        "state_dir", "sketch_cols", "sketch_ks", "topk_cols",
        "topk_caps", "grain_cols", "grain_sqls", "grain_tz")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  private def grainsOf(m: org.apache.spark.sql.Row)
      : Seq[(String, String)] =
    m.getSeq[String](m.fieldIndex("grain_cols"))
      .zip(m.getSeq[String](m.fieldIndex("grain_sqls")))

  private def sketchesOf(m: org.apache.spark.sql.Row)
      : Seq[(String, Int)] =
    m.getSeq[String](m.fieldIndex("sketch_cols"))
      .zip(m.getSeq[Long](m.fieldIndex("sketch_ks")).map(_.toInt))

  private def topksOf(m: org.apache.spark.sql.Row): Seq[(String, Int)] =
    m.getSeq[String](m.fieldIndex("topk_cols"))
      .zip(m.getSeq[Long](m.fieldIndex("topk_caps")).map(_.toInt))

  private def meta(spark: SparkSession, path: String)
      : org.apache.spark.sql.Row =
    spark.read.parquet(s"$path/meta").head()

  private def specOf(m: org.apache.spark.sql.Row): ChainSpec = {
    val tables = m.getSeq[String](m.fieldIndex("side_tables"))
    // nested parquet arrays deserialize as mutable.ArraySeq — convert
    val keys = m.getSeq[scala.collection.Seq[String]](
      m.fieldIndex("side_keys")).map(_.toSeq)
    val sImm = m.getSeq[Boolean](m.fieldIndex("side_imms"))
    val fImm = m.getSeq[Boolean](m.fieldIndex("fact_imms"))
    ChainSpec(m.getAs[String]("fact"),
      tables.indices.map(i =>
        SideSpec(tables(i), keys(i), sImm(i), fImm(i))))
  }

  /** Full build: aggregate the joined current snapshots, persist,
    * record EVERY table's change-log high-water mark. */
  def build(cat: GraftCatalog, cs: ChainSpec, groupCols: Seq[String],
      measures: Seq[String], path: String,
      sketches: Seq[(String, Int)] = Seq.empty,
      topks: Seq[(String, Int)] = Seq.empty,
      grainExprs: Seq[(String, String)] = Seq.empty)
      : (Long, Seq[Long]) = {
    val spark = cat.session
    validate(cat, cs, groupCols,
      measures ++ sketches.map(_._1) ++ topks.map(_._1), grainExprs)
    // contract sweep over the FULL history: a pre-build unsafe key
    // mutation would corrupt every future prefiltered read
    declaredImmutable(cs).foreach { case (t, ks) =>
      requireImmutable(cat, t, ks, sinceV = -1L)
    }
    val vF = highWater(cat, cs.fact)
    val vS = cs.sides.map(s => highWater(cat, s.table))
    val agg = Materialize.aggregate(
      Materialize.withGrains(joinedSnapshot(cat, cs), grainExprs),
      groupCols, measures, sketches, topks)
    // flip-don't-overwrite: same naming discipline as Materialize
    val nd = s"state_v${vF}_${vS.mkString("_")}"
    agg.write.mode(SaveMode.Overwrite).parquet(s"$path/$nd")
    writeMeta(spark, path, cs, vF, vS, groupCols, measures, nd,
      sketches, topks, grainExprs)
    (vF, vS)
  }

  /** Binary sugar for [[build]]. */
  def build(cat: GraftCatalog, js: JoinSpec, groupCols: Seq[String],
      measures: Seq[String], path: String): (Long, Long) = {
    val (vF, vS) = build(cat, js.chain, groupCols, measures, path)
    (vF, vS.head)
  }

  /** The maintained aggregate as a DataFrame (current persisted
    * state). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = meta(spark, path)
    spark.read.parquet(s"$path/${m.getAs[String]("state_dir")}")
  }

  /** Delete every `state_v*` dir the current meta no longer references
    * and return the bytes reclaimed — the flip-don't-overwrite
    * discipline leaves one dir per refresh behind, so a long-maintained
    * join MV accumulates dead state. Same caller contract as
    * [[Materialize.vacuum]]: run when no reader of a superseded dir is
    * in flight. */
  def vacuum(spark: SparkSession, path: String): Long = {
    val live = meta(spark, path).getAs[String]("state_dir")
    def size(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.map(size).sum).getOrElse(0L)
      else f.length()
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete()
    }
    Option(new java.io.File(path).listFiles).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("state_v") &&
        d.getName != live)
      .map { d => val b = size(d); del(d); b }.sum
  }

  /** Register the join MV so [[graft.plans.AggRewriteRule]] serves a
    * matching aggregate-over-INNER-join query from the state — one
    * `DimJoinDef.innerState` per side: INNER joins of exactly these
    * tables on exactly these keys serve; LEFT joins, or a query
    * omitting ANY side, refuse (the state never counted unmatched fact
    * rows). Staleness safety is the snapshot-cache design's: the
    * rewrite only fires on PURE cache scans of every table, and any
    * mutation to any of them makes its cache stale, reverting the
    * query to the collapse plan. Refresh every snapshot cache after
    * [[refresh]]. */
  def registerForRewrite(cat: GraftCatalog, path: String): Unit = {
    val spark = cat.session
    val m = meta(spark, path)
    val cs = specOf(m)
    val groupCols = m.getSeq[String](m.fieldIndex("group_cols"))
    val measures = m.getSeq[String](m.fieldIndex("measures"))
    val served = groupCols ++ measures ++
      sketchesOf(m).map(_._1) ++ topksOf(m).map(_._1)
    val dims = cs.sides.map { s =>
      val sf = cat.spec(s.table).schema.fieldNames.toSet
      // state columns living on THIS side serve through its join —
      // identity-mapped, the state stores the side's own names
      // (sketch/top-terms argument columns included, so a dim-side
      // distinct-count serves too)
      val attrs = served
        .filter(c => sf.contains(c) && !s.keys.contains(c))
        .map(c => c -> c).toMap
      graft.plans.GraftAggViews.DimJoinDef(cat.tablePath(s.table),
        factKeys = s.keys, dimKeys = s.keys, dimAttrs = attrs,
        innerState = true)
    }
    graft.plans.GraftAggViews.register(cat.tablePath(cs.fact),
      graft.plans.GraftAggViews.AggViewDef(path, groupCols, measures,
        sketches = sketchesOf(m).toMap, dims = dims,
        topks = topksOf(m).toMap))
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

  /** The non-delta factor of one delta-join leg, bounded to the
    * delta's join keys: a distinct-key semi-join caps the SHUFFLE, and
    * for a single-column key the delta's [min, max] zone filter bounds
    * the READ — below the last-wins collapse when that is sound (the
    * key is the table's PK, so a grouping-key filter pushes past the
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
    // a key that is a SUBSET of the PK still pushes below the collapse
    // (any grouping-column filter does) — no prefilter needed
    val pkIsKey = keys.toSet.subsetOf(cat.spec(table).pk.toSet)
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

  /** Binary sugar for `refresh` returning the (left, right)
    * high-water pair. */
  def refreshBinary(cat: GraftCatalog, path: String): (Long, Long) = {
    val (vF, vS) = refresh(cat, path)
    (vF, vS.head)
  }

  /** Fold every table's writes since the last refresh into the
    * persisted joined-aggregate state. Returns the new (factV, sideVs)
    * high-water marks (== the stored ones when nothing changed). */
  def refresh(cat: GraftCatalog, path: String): (Long, Seq[Long]) = {
    val spark = cat.session
    val m = meta(spark, path)
    val cs = specOf(m)
    requireNoTtl(cat, cs.fact)
    cs.sides.foreach(s => requireNoTtl(cat, s.table))
    val lastVF = m.getAs[Long]("last_vf")
    val lastVS = m.getSeq[Long](m.fieldIndex("last_vs"))
    val groupCols = m.getSeq[String](m.fieldIndex("group_cols"))
    val measures = m.getSeq[String](m.fieldIndex("measures"))
    val sketches = sketchesOf(m)
    val topks = topksOf(m)
    val grains = grainsOf(m)
    if (sketches.nonEmpty || topks.nonEmpty)
      graft.functions.GraftFunctions.registerKernels(spark)
    // a grain expression (date_trunc et al.) is evaluated under the
    // SESSION time zone — folding new deltas under a different tz than
    // the state's would split/merge grain groups wrongly: rebuild
    val grainTzChanged = grains.nonEmpty &&
      m.getAs[String]("grain_tz") !=
        spark.conf.get("spark.sql.session.timeZone")
    val marksOf: String => (Long, Long) = t =>
      cat.changeLogRaw(t).agg(
        coalesce(max(col("_version")), lit(-1L)),
        coalesce(min(col("_version")), lit(Long.MaxValue))).head match {
        case r => (r.getLong(0), r.getLong(1))
      }
    val (newVF, minVF) = marksOf(cs.fact)
    val sideMarks = cs.sides.map(s => marksOf(s.table))
    val newVS = sideMarks.map(_._1)
    if (newVF == lastVF && newVS == lastVS) return (lastVF, lastVS)
    // any log compacted past the fold point → only a rebuild is
    // correct (the history the state summarizes is gone)
    val compacted = minVF > lastVF ||
      sideMarks.map(_._2).zip(lastVS).exists { case (mn, lv) => mn > lv }
    if (compacted || grainTzChanged)
      return build(cat, cs, groupCols, measures, path, sketches, topks,
        grains)

    // telescoping legs: Δfact against every side OLD; per side i,
    // fact NEW ⋈ sides<i NEW ⋈ Δside_i ⋈ sides>i OLD — each leg's
    // non-delta factors key-bounded by the accumulated signed join
    // contract sweep over THIS delta window (lag pre-images cross the
    // window boundary, so a mutation of a declared-immutable key is
    // caught at the first fold that could read it wrong)
    val imm = declaredImmutable(cs)
    imm.get(cs.fact).foreach(ks =>
      requireImmutable(cat, cs.fact, ks, lastVF))
    cs.sides.zipWithIndex.foreach { case (s, j) =>
      imm.get(s.table).foreach(ks =>
        requireImmutable(cat, s.table, ks, lastVS(j)))
    }
    // each delta / accumulated leg is read SEVERAL times (its zone
    // bound, its distinct-key set, the join itself, and the two-pass
    // post/retraction fold below) — cache them, they are delta-sized
    val cached = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def cache(df: DataFrame): DataFrame = {
      val c = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += c; c
    }
    val factLeg = cs.sides.zipWithIndex
      .foldLeft(cache(signedDelta(cat, cs.fact, lastVF))) {
        case (acc, (s, j)) =>
          cache(acc.join(boundedSide(cat, s.table, Some(lastVS(j)),
            acc, s.keys, s.sideKeysImmutable), s.keys))
      }
    val sideLegs = cs.sides.indices.map { i =>
      val si = cs.sides(i)
      val d = cache(signedDelta(cat, si.table, lastVS(i)))
      val withFact = cache(d.join(boundedSide(cat, cs.fact, None, d,
        si.keys, si.factKeysImmutable), si.keys))
      cs.sides.zipWithIndex.filterNot(_._2 == i)
        .foldLeft(withFact) { case (acc, (s, j)) =>
          val asOf = if (j < i) None else Some(lastVS(j))
          cache(acc.join(boundedSide(cat, s.table, asOf, acc, s.keys,
            s.sideKeysImmutable), s.keys))
        }
    }
    // grain columns derive per JOINED row (fact/side columns are in
    // every leg), so one withGrains over the unioned delta covers
    // post rows and retraction pre-images alike
    val delta = Materialize.withGrains(
      sideLegs.foldLeft(factLeg)(
        _.unionByName(_, allowMissingColumns = false)), grains)

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
        delta.where(col("__w") > 0).drop("__w"), groupCols, measures,
        sketches, topks)
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
      .select(col("*") +: (measures.flatMap(mm => Seq(
        lit(null).cast(mT(mm)).as(s"__smin_$mm"),
        lit(null).cast(mT(mm)).as(s"__smax_$mm"))) ++
        // sketches cannot retract (a hash can't be un-inserted, a
        // SpaceSaving count can't be un-counted) — the NULL rides the
        // union and the gate below recomputes the group
        sketches.map { case (d, _) =>
          lit(null).cast(BinaryType).as(s"kmv_$d") } ++
        topks.map { case (t, _) =>
          lit(null).cast(BinaryType).as(s"topk_$t") }): _*)

    val merged = stateRows.unionByName(postRows).unionByName(retrRows)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        measures.flatMap(mm => Seq(
          sum(col(s"cnt_$mm")).as(s"cnt_$mm"),
          sum(col(s"sum_$mm")).as(s"sum_$mm"),
          min(col(s"min_$mm")).as(s"min_$mm"),
          max(col(s"max_$mm")).as(s"max_$mm"))) ++
          sketches.map { case (d, _) =>
            call_function("kmv_union_agg", col(s"kmv_$d"))
              .as(s"kmv_$d") } ++
          topks.map { case (t, _) =>
            call_function("top_terms_union_agg", col(s"topk_$t"))
              .as(s"topk_$t") } ++
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
        lit(sketches.nonEmpty || topks.nonEmpty) ||
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
        else kept.unionByName(recomputeJoined(cat, cs, groupCols,
          measures, affected, affRows, sketches, topks, grains))
      val nd = s"state_v${newVF}_${newVS.mkString("_")}"
      out.write.mode(SaveMode.Overwrite).parquet(s"$path/$nd")
      writeMeta(spark, path, cs, newVF, newVS, groupCols, measures, nd,
        sketches, topks, grains)
      (newVF, newVS)
    } finally {
      merged.unpersist()
      cached.foreach(_.unpersist())
    }
  }

  /** Affected-group recompute over the CURRENT joined snapshots,
    * bounded to the gated-in groups: an IN prefilter on each plain
    * group column reaches its owning table's scan (below the joins),
    * and the affected semi-join caps the aggregate itself —
    * delta-group-sized work against the join, never the full γ. */
  private def recomputeJoined(cat: GraftCatalog, cs: ChainSpec,
      groupCols: Seq[String], measures: Seq[String],
      affected: DataFrame,
      affRows: Option[Seq[org.apache.spark.sql.Row]],
      sketches: Seq[(String, Int)] = Seq.empty,
      topks: Seq[(String, Int)] = Seq.empty,
      grains: Seq[(String, String)] = Seq.empty): DataFrame = {
    val affCond = groupCols.map(c => col(c) <=> col(s"__a_$c"))
      .reduce(_ && _)
    val grainNames = grains.map(_._1).toSet
    val plainCols = groupCols.filterNot(grainNames.contains)
    // IN-prefilter only over PLAIN group columns — grain columns do
    // not exist below withGrains; the affected semi-join (over ALL
    // group columns, after grains derive) carries exactness
    val prefilter: Column = affRows match {
      case Some(rows) if plainCols.nonEmpty =>
        plainCols.map { c =>
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
      Materialize.withGrains(joinedSnapshot(cat, cs).where(prefilter),
          grains)
        .join(affected, affCond, "left_semi"),
      groupCols, measures, sketches, topks)
  }
}
