package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftCatalog

/** Incremental materialized-aggregate maintenance (IVM) over the
  * catalog's change log.
  *
  * A grouped aggregate (cnt / per-measure non-null cnt / sum / min /
  * max, avg derived as sum over cnt) is persisted once, then kept
  * current by folding in only the writes SINCE the last refresh — the
  * standard incremental-view-maintenance split (Griffin & Libkin,
  * SIGMOD 1995):
  *
  *  - COUNT and SUM are self-invertible: insertions add, retractions
  *    (the PRE image of an update, or a delete) subtract — delta-sized
  *    work, no base-table access;
  *  - MIN / MAX are not invertible under retraction: a group that lost
  *    a row is recomputed from the snapshot, but ONLY those groups (a
  *    semi-join on the retraction-affected group keys). Insert-only
  *    groups merge with least/greatest directly. An append-only corpus
  *    (the common training-data shape) never pays the recompute.
  *
  * State typing is EXACT per measure — the whole point of serving a
  * 100 TB sum from the state is that the fact-table answer and the
  * state answer are the same integer: integral measures keep Spark's
  * own sum widening (LongType), decimals widen to
  * DecimalType(p+10 bounded, s) exactly as a direct `sum()` would, and
  * only genuinely floating measures accumulate as DOUBLE. min/max stay
  * in the measure's native type. (A DOUBLE-typed state silently loses
  * integer exactness past 2^53 — precisely the regime a fact-table MV
  * exists for.)
  *
  * State lives under `path`/state_v<version> with a tiny meta pointer —
  * refresh writes the NEXT version's directory and flips the pointer,
  * so it never overwrites an input it is reading (same policy as the
  * ANN index persistence) and past states remain queryable.
  *
  * Scale: refresh cost is O(delta) + a state-sized merge join keyed on
  * the group columns + (only under retractions) a snapshot pass
  * filtered to affected groups — under a group-clustered layout
  * ([[Layout]] z-order / bucketing) that pass prunes to the touched
  * partitions.
  */
object Materialize {

  /** Derived GRAIN group columns (e.g. a daily rollup's
    * `day = date_trunc('DAY', ts)`): computed from each row wherever
    * rows are grouped — the snapshot build, the delta's post/pre
    * images, the expiry slice, and the affected-group recompute — so
    * the incremental fold algebra is untouched (a grain column is just
    * a group column whose value is derivable from the row). Names must
    * appear in `groupCols`; expressions are SQL over the table's
    * columns and are persisted in the meta pointer so refresh re-derives
    * them without the caller. */
  private def withGrains(df: DataFrame,
      grains: Seq[(String, String)]): DataFrame =
    grains.foldLeft(df) { case (d, (c, sql)) => d.withColumn(c, expr(sql)) }

  private def grainsOf(meta: org.apache.spark.sql.Row)
      : Seq[(String, String)] =
    if (!meta.schema.fieldNames.contains("grain_cols")) Seq.empty
    else meta.getSeq[String](meta.fieldIndex("grain_cols"))
      .zip(meta.getSeq[String](meta.fieldIndex("grain_sqls")))

  /** Full build: aggregate the current snapshot, persist it, record the
    * change-log high-water mark the state covers and the wall-clock
    * refresh point (the TTL expiry low-water mark for the next
    * incremental refresh). */
  def build(cat: GraftCatalog, table: String, groupCols: Seq[String],
      measures: Seq[String], path: String,
      grainExprs: Seq[(String, String)] = Seq.empty): Long = {
    val spark = cat.changeLog(table).sparkSession
    import spark.implicits._
    // sample the clock BEFORE constructing the snapshot: its TTL cutoff
    // is evaluated at plan-construction time, and stamping meta with a
    // LATER clock would start the next refresh's expiry window past
    // rows that expired during the build — they would be counted in
    // this state yet never retracted
    val ts = cat.clock()
    val v = highWater(cat, table)
    // NEVER overwrite the directory the live meta points to: a rebuild
    // triggered by ALTER SET TTL (or a legacy meta) keeps the
    // high-water mark, so the default name collides with the state
    // being served — and SaveMode.Overwrite deletes the target first,
    // stranding the pointer on a crash mid-write. Suffix with the
    // refresh stamp instead (the same flip-don't-overwrite rule the
    // expiry-only refresh path follows).
    val stateDirName = scala.util.Try(
        stateDir(spark.read.parquet(s"$path/meta").head())).toOption match {
      case Some(cur) =>
        val cand = s"state_v${v}r$ts"
        // an injectable test clock can repeat a stamp — never reuse the
        // exact live dir name under any clock
        if (cand == cur) s"${cand}n${System.nanoTime()}" else cand
      case None => s"state_v$v"
    }
    require(grainExprs.map(_._1).forall(groupCols.contains),
      s"grain columns ${grainExprs.map(_._1)} must appear in " +
        s"groupCols $groupCols")
    aggregate(withGrains(cat.snapshot(table), grainExprs),
        groupCols, measures)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$stateDirName")
    Seq((v, groupCols, measures, ts, stateDirName,
        cat.ttlSeconds(table).getOrElse(-1L),
        grainExprs.map(_._1), grainExprs.map(_._2),
        spark.conf.get("spark.sql.session.timeZone")))
      .toDF("last_version", "group_cols", "measures", "refresh_ts",
        "state_dir", "ttl_at_refresh", "grain_cols", "grain_sqls",
        "grain_tz")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    v
  }

  /** The current state directory per the meta pointer. An expiry-only
    * refresh rotates the state WITHOUT a new version number (expiry
    * doesn't write the log), so the directory name — not the version —
    * is the pointer. */
  private[graft] def stateDir(meta: org.apache.spark.sql.Row): String =
    if (meta.schema.fieldNames.contains("state_dir"))
      meta.getAs[String]("state_dir")
    else s"state_v${meta.getLong(0)}"

  /** The maintained aggregate as a DataFrame (current persisted state). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").head()
    spark.read.parquet(s"$path/${stateDir(m)}")
  }

  /** Fold writes since the last refresh into the persisted state.
    * Returns the new high-water version (== old one when nothing
    * changed, in which case no new state is written).
    *
    * Incremental folding requires the change log to still CONTAIN the
    * history the state summarizes: after [[GraftCatalog.compact]]
    * (history discarded, rows rewritten under one new version) the
    * delta-since-lastV would re-count every surviving row — detected
    * via the RAW log's minimum version and handled with a full rebuild
    * at the new mark, which is always correct.
    *
    * A finite TTL does NOT force a rebuild: rows whose `_ts` crossed
    * the TTL boundary since the last refresh (alive then, expired now)
    * are treated as retractions — their groups recompute from the
    * snapshot exactly like update/delete retractions. The expiry scan
    * carries a `_ts` range predicate (last cutoff ≤ _ts < new cutoff)
    * that reaches the parquet scan, and batches share one `_ts` value
    * per file, so file-level min/max stats prune the probe to the
    * files written in that window — append-mostly TTL tables refresh
    * delta-sized. The expiry cutoff is sampled once per refresh from
    * the catalog clock; rows landing within the few ms between that
    * sample and the affected-group snapshot read land on whichever
    * side the snapshot's own cutoff picks — any refresh-based MV has
    * this boundary, it just has to pick one. */
  def refresh(cat: GraftCatalog, table: String, path: String): Long = {
    val spark = cat.changeLog(table).sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val lastV = meta.getLong(0)
    val groupCols = meta.getSeq[String](1)
    val measures = meta.getSeq[String](2)
    val grains = grainsOf(meta)
    val ttl = cat.ttlSeconds(table)
    val nowMs = cat.clock()
    val rawLog = cat.changeLogRaw(table)
    // ONE raw-log scan serves both marks (previously two full log scans
    // per refresh): the TTL-alive maximum version — the same cutoff
    // algebra the filtered changeLog applies, sampled from the SAME
    // nowMs the expiry window below uses — and the RAW minimum (the
    // compaction detector; the filtered minimum rises as rows expire,
    // which is not a compaction)
    val aliveForHw: Column = ttl.map(t =>
        col("_ts").isNull ||
          col("_ts") >= lit(new java.sql.Timestamp(nowMs - t * 1000L)))
      .getOrElse(lit(true))
    val marks = rawLog.agg(
      coalesce(max(when(aliveForHw, col("_version"))), lit(-1L)),
      coalesce(min(col("_version")), lit(Long.MaxValue))).head
    val newV = marks.getLong(0)
    val minV = marks.getLong(1)
    // expiry writes nothing to the log, so under a TTL an unchanged
    // high-water mark does NOT mean an unchanged table — time alone
    // retracts rows, and an early return here would serve them forever
    if (newV == lastV && ttl.isEmpty) return lastV
    val hasRefreshTs = meta.schema.fieldNames.contains("refresh_ts")
    // an ALTER SET TTL between refreshes invalidates the expiry-window
    // algebra in BOTH directions (a shortened TTL leaves rows below the
    // new window start unretracted; a lengthened/removed one can't
    // resurrect already-retracted rows) — field missing (legacy meta)
    // or value changed, either way only a rebuild is correct
    val ttlChanged =
      !meta.schema.fieldNames.contains("ttl_at_refresh") ||
        meta.getAs[Long]("ttl_at_refresh") != ttl.getOrElse(-1L)
    // grain SQL (date_trunc over a timestamp) evaluates under the
    // SESSION timezone: a refresh from a different-tz session would
    // derive post/pre/expiry grain values at boundaries the persisted
    // state's groups don't use — phantom negative groups, stale real
    // ones, silently. The build tz rides the meta; any mismatch (or a
    // grain meta predating the field) is only correct as a rebuild,
    // which re-derives every group under the CURRENT session tz.
    val sessionTz = spark.conf.get("spark.sql.session.timeZone")
    val grainTzChanged = grains.nonEmpty &&
      (!meta.schema.fieldNames.contains("grain_tz") ||
        meta.getAs[String]("grain_tz") != sessionTz)
    if (minV > lastV || !hasRefreshTs || ttlChanged || grainTzChanged)
      return build(cat, table, groupCols, measures, path, grains)
    val lastRefreshMs = meta.getAs[Long]("refresh_ts")
    // alive-at-now cutoff for post images; None ⇒ no expiry
    val nowCut = ttl.map(t => new java.sql.Timestamp(nowMs - t * 1000L))
    val lastCut = ttl.map(t =>
      new java.sql.Timestamp(lastRefreshMs - t * 1000L))
    if (newV == lastV) {
      // expiry-only interval: refresh iff something actually crossed
      // the boundary — the probe is the same _ts-pruned scan the
      // retraction slice uses, so an idle table costs a footer read
      val crossed = rawLog.where(col("_version") <= lastV &&
          !col("_deleted") && col("_ts").isNotNull &&
          col("_ts") >= lit(lastCut.get) && col("_ts") < lit(nowCut.get))
        .limit(1).count()
      if (crossed == 0) return lastV
    }
    val aliveNow: Column = nowCut
      .map(c => col("_ts").isNull || col("_ts") >= lit(c))
      .getOrElse(lit(true))
    val state = spark.read.parquet(s"$path/${stateDir(meta)}")
    val stT: String => DataType = c => state.schema(c).dataType

    val s = cat.spec(table)
    val fields = s.schema.fieldNames.toSeq
    val changes = preImageChanges(rawLog, fields, s.pk, lastV)
    val hasPrev = col("_prev").isNotNull && !col("_prev").getField("__del")

    // typed zero/null contributions matching the persisted state schema
    // exactly (unionByName is type-strict)
    def zeroMeasures: Seq[Column] = measures.flatMap(m => Seq(
      lit(null).cast(stT(s"cnt_$m")).as(s"cnt_$m"),
      lit(null).cast(stT(s"sum_$m")).as(s"sum_$m"),
      lit(null).cast(stT(s"min_$m")).as(s"min_$m"),
      lit(null).cast(stT(s"max_$m")).as(s"max_$m")))

    // union-merge instead of joins: groupBy treats NULL group values as
    // an ordinary group, so NULL keys merge correctly (a join-based
    // merge would never match them); `retr` marks groups that lost a
    // row — their min/max (not invertible) recompute below, so their
    // sum/min/max contributions here are irrelevant
    val stateRows = state
      .withColumn("retr", lit(0))
    // the SAME aggregate() the full build uses — the exactness
    // guarantee depends on the delta and the build producing identical
    // widened sum types for the type-strict unionByName merge below
    val postRows = aggregate(
        withGrains(changes.where(!col("_deleted") && aliveNow)
          .select(fields.map(col): _*), grains),
        groupCols, measures)
      .withColumn("retr", lit(0))
    val preRows = withGrains(changes.where(hasPrev)
        .select(fields.map(f => col(s"_prev.$f").as(f)): _*), grains)
      .groupBy(groupCols.map(col): _*)
      .agg((-count(lit(1))).as("cnt"), zeroMeasures: _*)
      .withColumn("retr", lit(1))
    // newly-expired slice: rows alive at the last refresh, expired now.
    // Candidates (not winners — a superseded row merely over-marks its
    // group for recompute, which is always correct) in the _ts window;
    // legacy NULL stamps never expire.
    val expRows = (nowCut, lastCut) match {
      case (Some(nc), Some(lc)) =>
        withGrains(rawLog.where(col("_version") <= lastV &&
            !col("_deleted") && col("_ts").isNotNull &&
            col("_ts") >= lit(lc) && col("_ts") < lit(nc)), grains)
          .groupBy(groupCols.map(col): _*)
          .agg(lit(0L).as("cnt"), zeroMeasures: _*)
          .withColumn("retr", lit(1))
      case _ => null
    }
    val unioned = Option(expRows)
      .foldLeft(stateRows.unionByName(postRows).unionByName(preRows))(
        _ unionByName _)
    val merged = unioned
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        measures.flatMap(m => Seq(
          sum(col(s"cnt_$m")).as(s"cnt_$m"),
          sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m"))) :+
          max(col("retr")).as("retr"): _*)
    val affected = merged.where(col("retr") > 0)
      .select(groupCols.map(c => col(c).as(s"__a_$c")): _*)
    val affCond = groupCols.map(c => col(c) <=> col(s"__a_$c"))
      .reduce(_ && _) // null-safe: NULL groups recompute too
    val recomputed = aggregate(
      withGrains(cat.snapshot(table), grains)
        .join(affected, affCond, "left_semi"),
      groupCols, measures)
    // a distinct target dir always — an expiry-only refresh keeps the
    // version number, so suffix it to avoid overwriting the state
    // being read
    val newDir =
      if (newV > lastV) s"state_v$newV" else s"state_v${newV}e$nowMs"
    merged.where(col("retr") === 0 && col("cnt") > 0).drop("retr")
      .unionByName(recomputed)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$newDir")
    import spark.implicits._
    Seq((newV, groupCols, measures, nowMs, newDir,
        ttl.getOrElse(-1L), grains.map(_._1), grains.map(_._2),
        sessionTz))
      .toDF("last_version", "group_cols", "measures", "refresh_ts",
        "state_dir", "ttl_at_refresh", "grain_cols", "grain_sqls",
        "grain_tz")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    newV
  }

  /** Delta rows with their typed pre-images (`_prev`, NULL for first
    * writes), via lag over PK — the same shape as the catalog's
    * cdcImages.
    *
    * The lag must see each PK's pre-window history, so the `_version >
    * lastV` filter cannot be pushed below the window — but pre-images
    * are only needed for PKs that actually appear in the delta, so the
    * window's INPUT is semi-join-pruned to those PKs first. The delta
    * PK scan itself file-prunes on `_version` (each batch writes one
    * version per file, so parquet min/max stats skip pre-delta files),
    * making the whole pre-image pass O(delta + touched-PK history)
    * rather than O(log): without the prune, every refresh shuffled the
    * ENTIRE raw change log by PK — correct, but O(table) per refresh at
    * 100 TB even for an insert-only delta. */
  private[graft] def preImageChanges(rawLog: DataFrame,
      fields: Seq[String], pk: Seq[String], lastV: Long): DataFrame = {
    val nonPk = fields.filterNot(pk.contains)
    val ord = struct(col("_version") +: nonPk.map(col): _*)
    val w = Window.partitionBy(pk.map(col): _*).orderBy(ord.asc)
    val rowS = struct(fields.map(col) :+ col("_deleted").as("__del"): _*)
    val deltaPks = rawLog.where(col("_version") > lastV)
      .select(pk.map(c => col(c).as(s"__d_$c")): _*).distinct()
    val touchedCond = pk.map(c => col(c) <=> col(s"__d_$c"))
      .reduce(_ && _) // null-safe: a NULL PK component still matches
    rawLog.join(deltaPks, touchedCond, "left_semi")
      .withColumn("_prev", lag(rowS, 1).over(w))
      .where(col("_version") > lastV)
  }

  /** The grouped aggregate both the full build and the affected-group
    * recompute use: per group, `cnt` (row count) and per measure the
    * non-null count `cnt_m` (serves COUNT(col) and the AVG derivation
    * sum/cnt), `sum_m` in Spark's own sum-widened type (Long for
    * integrals, Decimal(p+10, s) for decimals, Double only for floats
    * — exact where the direct aggregate is exact), and native-typed
    * `min_m` / `max_m`. */
  def aggregate(df: DataFrame, groupCols: Seq[String],
      measures: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        measures.flatMap(m => Seq(
          count(col(m)).as(s"cnt_$m"),
          sum(col(m)).as(s"sum_$m"),
          min(col(m)).as(s"min_$m"),
          max(col(m)).as(s"max_$m"))): _*)

  private def highWater(cat: GraftCatalog, table: String): Long =
    cat.changeLog(table).agg(coalesce(max(col("_version")), lit(-1L)))
      .head.getLong(0)
}
