package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Temporal join operators Spark lacks as built-ins: as-of join and
  * range (interval containment) join.
  *
  * Both are expressed as compositions of shuffle-friendly primitives —
  * the naive formulations (an inequality theta-join) degenerate to a
  * BroadcastNestedLoopJoin / cartesian product in Spark, which is
  * quadratic at corpus scale. The shapes here shuffle once on an
  * equi-key and never materialize a cross product:
  *
  *  - [[asofJoin]]: union-merge. Tag both sides, shuffle ONCE on the
  *    join key, sort each key group by time, and carry the latest right
  *    payload forward with a running `last(ignoreNulls)` window. One
  *    exchange, no join operator at all in the plan, O(n log n) per key
  *    group — the classic time-series merge shape.
  *  - [[rangeJoin]]: bucket the time axis into fixed-width chunks;
  *    intervals explode to the chunks they cover, points map to exactly
  *    one chunk, and the pair match becomes an equi-join on chunk id
  *    plus a residual containment filter. Shuffle keyed by chunk —
  *    AQE's skew-join splits hot chunks at runtime.
  */
object Temporal {

  /** As-of join: each left row picks up the payload of the LATEST right
    * row with the same key and `right.ts <= left.ts` (inclusive; strict
    * `<` with `inclusive = false`). Unmatched left rows keep null
    * payload columns (left-outer semantics).
    *
    * Implementation: the two sides are union-tagged and processed by a
    * single running window per key — `last(payload, ignoreNulls)` over
    * rows sorted by (ts, side) carries the most recent right payload to
    * every left row. Right rows sort BEFORE left rows at equal ts when
    * inclusive (so an equal-ts right row is visible) and after them when
    * strict. Among right rows with identical (key, ts) the ORDERABLE
    * payload columns are the final sort key, so the winner is
    * deterministic (field-wise max) regardless of partition layout;
    * rows identical in every orderable column but differing in an
    * unorderable one (a map) tie arbitrarily.
    *
    * Scale shape: ONE hash exchange on the key + a per-key sort — the
    * same cost as the sort side of a sort-merge join, with no range
    * explosion and no per-row probing. Left rows with a null timestamp
    * sort first and therefore match nothing; right rows with a null
    * timestamp are DROPPED before the union (NULL <= t is never true,
    * so they can match no left row). Null keys group together like any
    * groupBy key.
    *
    * Hot-key boundary: all events of one key land in one window group,
    * so a single pathologically hot key serializes into one task — this
    * is inherent to as-of semantics (the running "latest right row"
    * state is a per-key chain). At 100 TB the mitigation is
    * [[asofJoinBucketed]]: pre-bucket the time axis coarsely, carry each
    * bucket's closing right row into the next, and run the same
    * union-merge per (key, bucket) — same answer, parallelism = #buckets
    * per key.
    *
    * @param left      probe side; ALL its columns are preserved
    * @param right     build side; all columns except `key` become the
    *                  payload appended to matching left rows — names
    *                  must not collide with left's (rename beforehand)
    * @param key       equi-join key column present on both sides
    * @param leftTs    event-time column on the left
    * @param rightTs   event-time column on the right (part of the
    *                  payload, so callers see WHICH row matched)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      inclusive: Boolean = true): DataFrame =
    asofJoinMulti(left, right, Seq(key), leftTs, rightTs, inclusive)

  /** [[asofJoin]] with a composite equi-key: the key columns pack into
    * one struct for the single exchange (struct hash/equality = the
    * columns'), everything else identical. */
  def asofJoinMulti(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      inclusive: Boolean = true): DataFrame = {
    val t = asofTag(left, right, keys, leftTs, rightTs, inclusive,
      bucket = None)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__s").asc, col("__o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.l.union(t.r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__s") === t.leftSide && col("__l").isNotNull)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        t.payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** The as-of family's shared tag-and-union prologue on the
    * (__k[, __b], __t, __s, __o, __l, __r) shape. `__o` is the
    * deterministic tie-break: the ORDERABLE payload columns only, so a
    * map-typed payload rides along without making the sort key
    * unorderable (two right rows identical in ts and every orderable
    * column but differing in a map pick arbitrarily — strictly better
    * than the AnalysisException a full-payload sort key raised). */
  private case class AsofSides(l: DataFrame, r: DataFrame,
      payloadCols: Seq[String], leftSide: Int,
      lStruct: StructType, rStruct: StructType,
      tType: org.apache.spark.sql.types.DataType,
      oType: StructType)

  /** Validates the payload contract, encodes the boundary rule in the
    * side order (inclusive puts right FIRST at equal ts so an equal-ts
    * right row is visible; strict puts it after), and projects both
    * sides onto the tagged shape. Right rows with a null timestamp are
    * DROPPED: they would sort first (nulls-first asc) and be carried by
    * last(ignoreNulls) to every left row in the group — a match at time
    * -infinity — while SQL's NULL <= t is never true. Left null-ts rows
    * sort before all right rows and stay unmatched, as documented.
    * `bucket` derives the optional __b column per (side, ts column). */
  private def asofTag(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, inclusive: Boolean,
      bucket: Option[(DataFrame, String) => Column]): AsofSides = {
    require(keys.nonEmpty, "at least one key column")
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left: ${clash.mkString(", ")} " +
        "— rename the right side's columns before the as-of join")
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)
    val tType = left.schema(leftTs).dataType
    // tie-break over the ORDERABLE payload columns only (a map column
    // would make the whole sort key unorderable and fail analysis)
    val orderableFields = right.schema.fields
      .filterNot(f => keys.contains(f.name))
      .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(f.dataType))
    val oType = StructType(orderableFields)
    def tagged(df: DataFrame, ts: String, side: Int,
        lCol: Column, rCol: Column, oCol: Column): Seq[Column] =
      Seq(struct(keys.map(col): _*).as("__k")) ++
        bucket.map(b => b(df, ts).as("__b")) ++
        Seq(col(ts).cast(tType).as("__t"), lit(side).as("__s"),
          oCol.as("__o"), lCol.as("__l"), rCol.as("__r"))
    val l = left.select(tagged(left, leftTs, leftSide,
      struct(left.columns.map(col): _*), lit(null).cast(rStruct),
      lit(null).cast(oType)): _*)
    // the drop filters the CONVERTED value, not the raw column: a right
    // ts whose cast to the left's ts type cannot convert (e.g. an
    // unparsable string) would otherwise either slip through as null —
    // sorting at -infinity and forward-filling its payload to every
    // earlier left row — or, under ANSI mode, kill the job. try_cast
    // gives ONE behavior in both modes: the malformed row is dropped,
    // exactly like a null-ts row.
    val r = right.where(col(rightTs).try_cast(tType).isNotNull)
      .select(tagged(right, rightTs, rightSide,
        lit(null).cast(lStruct), struct(payloadCols.map(col): _*),
        struct(orderableFields.map(f => col(f.name)).toSeq: _*)): _*)
    AsofSides(l, r, payloadCols, leftSide, lStruct, rStruct, tType, oType)
  }

  /** [[asofJoinMulti]] with a bucketed time axis: the hot-key
    * mitigation. A plain as-of join serializes each key's events into
    * one window group; here the axis is chunked into `bucketWidth`-unit
    * buckets, each bucket's CLOSING right row (latest ts, same
    * field-wise-max tie-break) is forward-filled to later buckets as a
    * synthetic carry-in row, and the union-merge runs per (key, bucket)
    * — identical answer, parallelism = #buckets per key instead of 1.
    *
    * Cost: one extra per-(key,bucket) aggregate + a small spine window
    * whose row count is #(key,bucket) groups, not #events. Use when a
    * key's event count is too large for one task; otherwise
    * [[asofJoinMulti]]'s single exchange is cheaper.
    *
    * The timestamp columns must be time- or numeric-typed (the axis
    * must be bucketable); left rows with a null timestamp stay
    * unmatched, right rows with a null timestamp are dropped — same as
    * [[asofJoinMulti]].
    */
  /** Time/numeric → Long axis, shared by the bucketed as-of and range
    * joins: ONE dispatch so the two operators can never bucket the same
    * column differently (they were verbatim copies before). */
  private def axisLong(what: String)(df: DataFrame, c: String)
      : org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.DateType =>
        unix_timestamp(col(c)).cast(LongType)
      case _: org.apache.spark.sql.types.NumericType =>
        col(c).cast(LongType)
      case other => throw new IllegalArgumentException(
        s"$what axis column $c must be time or numeric, got $other")
    }

  def asofJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, bucketWidth: Long,
      inclusive: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive axis units")
    val axis = axisLong("bucketed as-of") _
    val t = asofTag(left, right, keys, leftTs, rightTs, inclusive,
      bucket = Some((df, c) => floor(axis(df, c) / bucketWidth)))
    val (l, r) = (t.l, t.r)
    // closing right row per (key, bucket): max_by on (ts, orderable
    // tie-break) — the same ordering the in-bucket merge uses; the
    // payload rides as the VALUE so map columns never enter the
    // comparison
    val closing = r.groupBy(col("__k"), col("__b"))
      .agg(max_by(struct(col("__t"), col("__r")),
        struct(col("__t"), col("__o"))).as("__c"))
    val cType = closing.schema("__c").dataType
    // forward-fill closings across the bucket spine: for each bucket a
    // left row occupies, the carry-in is the closing of the LATEST
    // earlier bucket (m=0 marker sorts before the same bucket's m=1
    // closing, so a bucket never sees its own closing as carry-in). The
    // spine has one row per (key, bucket) group — tiny next to the data.
    val spine = l.select(col("__k"), col("__b")).distinct()
      .select(col("__k"), col("__b"), lit(0).as("__m"),
        lit(null).cast(cType).as("__c"))
      .union(closing.select(col("__k"), col("__b"), lit(1).as("__m"),
        col("__c")))
    val wCarry = Window.partitionBy(col("__k"))
      .orderBy(col("__b").asc, col("__m").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry rows get a null ts so they sort first in their bucket (the
    // real carry ts is strictly before the bucket start by construction)
    val carryRows = spine
      .withColumn("__cin", last(col("__c"), ignoreNulls = true).over(wCarry))
      .where(col("__m") === 0 && col("__cin").isNotNull)
      .select(col("__k"), col("__b"),
        lit(null).cast(t.tType).as("__t"), lit(-1).as("__s"),
        lit(null).cast(t.oType).as("__o"),
        lit(null).cast(t.lStruct).as("__l"),
        col("__cin").getField("__r").as("__r"))
    val w = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").asc, col("__s").asc, col("__o").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r).union(carryRows)
      .withColumn("__mres", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__s") === t.leftSide && col("__l").isNotNull)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) ++
        t.payloadCols.map(c => col(s"__mres.$c").as(c)): _*)
  }

  /** Range (interval containment) join: every (point, interval) pair
    * with `lo <= pt <= hi` (both ends inclusive — SQL BETWEEN).
    *
    * Implementation: the time axis is chunked into `bucketWidth`-second
    * cells. Each interval explodes to the cells it covers (a `sequence`
    * + `explode`, bounded by `maxBucketsPerInterval`); each point maps
    * to exactly ONE cell, so the equi-join on cell id yields every
    * candidate pair exactly once (no post-join dedup) and the residual
    * BETWEEN filter removes same-cell near-misses.
    *
    * Scale shape: one hash exchange per side keyed by cell id — never a
    * nested-loop/cartesian plan. Pick `bucketWidth` near the typical
    * interval length: the interval side then explodes ~2× and each
    * point probes one cell. A pathological interval spanning the whole
    * axis would explode to the entire cell range, so intervals wider
    * than `maxBucketsPerInterval` cells fail LOUDLY (assert inside the
    * plan) instead of silently flooding the shuffle — at 100 TB you
    * split such outliers into their own broadcast-side pass.
    *
    * @param points    side with one timestamp column `ptCol`
    * @param intervals side with `loCol`/`hiCol` timestamp bounds;
    *                  column names must not collide with points'
    * @param bucketWidth cell width in seconds
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, ptCol: String,
      loCol: String, hiCol: String, bucketWidth: Long,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    val clash = intervals.columns.toSet.intersect(points.columns.toSet)
    require(clash.isEmpty,
      s"interval columns collide with point columns: ${clash.mkString(", ")}")
    require(bucketWidth > 0, "bucketWidth must be positive axis units")
    // the axis may be time (cells of bucketWidth seconds) or any numeric
    // (cells of bucketWidth raw units) — price bands, id ranges, offsets
    val axis = axisLong("range-join") _
    def cell(a: org.apache.spark.sql.Column) = floor(a / bucketWidth)
    val loCell = cell(axis(intervals, loCol))
    val hiCell = cell(axis(intervals, hiCol))
    val guarded = intervals
      // null-bounded or inverted intervals match nothing (SQL BETWEEN
      // semantics) — drop them BEFORE the width assert, which would
      // otherwise fire on the null condition
      .where(col(loCol) <= col(hiCol))
      // assert_true rides in a filter (coalesce(null-when-ok, true)) so
      // the optimizer cannot prune it as an unused projection
      .where(coalesce(
        assert_true(hiCell - loCell < maxBucketsPerInterval,
          concat(lit(s"rangeJoin: interval wider than " +
            s"$maxBucketsPerInterval buckets of ${bucketWidth}s — raise " +
            "bucketWidth or route outlier intervals to a broadcast pass " +
            "(interval at "), col(loCol).cast("string"), lit(")"))),
        lit(true)))
      .withColumn("__cell", explode(sequence(loCell, hiCell)))
    points
      .withColumn("__cell", cell(axis(points, ptCol)))
      .join(guarded, "__cell")
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__cell")
  }

  /** Regular-grid resample with forward fill (time-series gap fill):
    * for each key, one row per `stepSeconds` tick from the key's first
    * observation tick to its last, carrying the LATEST observation at
    * or before the tick (as-of semantics — the standard
    * downsample/gap-fill for irregular event series).
    *
    * Shape at scale: the tick spine derives from a per-key (min, max)
    * aggregate (rows = #keys) exploded scan-locally with sequence() —
    * never a driver loop — and the fill is ONE [[asofJoinMulti]]
    * (single key exchange, union-merge, no join operator). Guard: keys
    * whose span exceeds `maxTicksPerKey` ticks fail loudly (a years-
    * long span at 1s steps is a fat-finger, and the explode would
    * materialize it).
    *
    * @return one row per (key, tick) with the payload columns of the
    *         latest observation and its event time (`obs_ts`) */
  def resampleForwardFill(df: DataFrame, keyCol: String, tsCol: String,
      stepSeconds: Long, maxTicksPerKey: Long = 1000000L): DataFrame = {
    require(stepSeconds >= 1, s"stepSeconds must be >= 1, got $stepSeconds")
    val tick = floor(unix_seconds(col(tsCol)) / stepSeconds) * stepSeconds
    // null-ts rows are not observations and must not reach the span
    // guard: a key with ONLY null timestamps yields null lo/hi, the
    // null comparison reaches assert_true, and Spark's If takes the
    // error branch on a null predicate — the whole job would die on a
    // key that should simply produce no grid rows (rangeJoin
    // pre-filters identically)
    val bounds = df
      .where(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("__key"))
      .agg(min(tick).as("lo"), max(tick).as("hi"))
      .where(coalesce(
        assert_true((col("hi") - col("lo")) / stepSeconds <
          maxTicksPerKey,
          concat(lit(s"resampleForwardFill: key span exceeds " +
            s"$maxTicksPerKey ticks of ${stepSeconds}s — raise " +
            "stepSeconds or split the series (key "),
            col("__key").cast("string"), lit(")"))),
        lit(true)))
    val spine = bounds
      .select(col("__key"),
        explode(sequence(col("lo"), col("hi"), lit(stepSeconds)))
          .as("__tick"))
      .select(col("__key").as(keyCol),
        timestamp_seconds(col("__tick")).as("grid_ts"))
    val right = df.withColumnRenamed(tsCol, "obs_ts")
    asofJoinMulti(spine, right, Seq(keyCol), "grid_ts", "obs_ts")
  }

  /** DAU / rolling-window active users ("MAU") + stickiness per day —
    * the engagement rollup every event-log product report runs.
    *
    * Exact form: distinct (user, day) → each user-day contributes to
    * the `windowDays` window-ends it falls in (explode ×windowDays) →
    * per-day COUNT(DISTINCT user). The explode multiplies the DISTINCT
    * user-day table (already collapsed map-side), not the raw log —
    * but at 100 TB that is still windowDays × |user-days| shuffle rows,
    * which is what the sketch form exists to avoid.
    *
    * Sketch form (`exact = false`): ONE pass builds a per-day HLL
    * sketch of user ids (mergeable partial aggregate — the shuffle
    * carries #days fixed-size sketches, not user ids), and the rolling
    * union runs over the #days-row sketch table (×windowDays — still
    * tiny). `mau` is then the HLL estimate (±~2% at the default
    * lgConfigK); `dau` stays exact in both forms. This is the shape
    * that survives a 1000-executor corpus: the window merge never
    * touches corpus-sized data.
    *
    * Output: (day, dau, mau, stickiness = round(dau/mau, 8)), one row
    * per day present in the log. */
  def engagementRollup(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 30, exact: Boolean = true): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val ud = events.select(col(userCol).as("u"),
      graft.functions.GraftFunctions.toDateSpark(col(tsCol)).as("d"))
      // NULL users must not count: count(*) over the distinct user-day
      // table would include the (NULL, d) row in dau while
      // countDistinct/hll_sketch_agg both SKIP nulls in mau — dau could
      // exceed mau (stickiness > 1, or NULL on an all-null day)
      .where(col("u").isNotNull)
      .distinct()
    val dau = ud.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("dau")) // (u, d) already distinct
    val mau =
      if (exact)
        ud.select(col("u"),
            explode(sequence(lit(0), lit(windowDays - 1))).as("i"),
            col("d"))
          .select(col("u"), date_add(col("d"), col("i")).as("day"))
          .groupBy(col("day"))
          .agg(countDistinct(col("u")).as("mau"))
      else
        ud.groupBy(col("d"))
          .agg(hll_sketch_agg(col("u")).as("sk"))
          .select(col("sk"),
            explode(sequence(lit(0), lit(windowDays - 1))).as("i"),
            col("d"))
          .select(col("sk"), date_add(col("d"), col("i")).as("day"))
          .groupBy(col("day"))
          .agg(hll_union_agg(col("sk")).as("sku"))
          .select(col("day"), hll_sketch_estimate(col("sku")).as("mau"))
    dau.join(mau, "day")
      .withColumn("stickiness",
        round(col("dau").cast("double") / col("mau"), 8))
      .orderBy(col("day"))
  }

  // offset in whole periods between two unit-truncated timestamps;
  // weeks are Monday-truncated on both sides so day-diff is an exact
  // multiple of 7, months via months_between on exact month starts
  private def periodOffsetOf(unit: String, later: Column,
      earlier: Column): Column = unit match {
    case "week" => (datediff(later, earlier) / 7).cast("int")
    case "day" => datediff(later, earlier)
    case "month" => months_between(later, earlier).cast("int")
    case u => throw new IllegalArgumentException(
      s"retention unit must be week/day/month, got $u")
  }

  private def periodOffset(unit: String): Column =
    periodOffsetOf(unit, col("__p"), col("cohort"))

  /** Cohort retention: users grouped by their first-activity period
    * (calendar week by default), retention = distinct users still
    * active at each period offset — the standard product-analytics
    * rollup over an event log.
    *
    * Shape for scale: ONE entity-keyed shuffle. The per-user aggregate
    * collects the user's distinct active periods as a SET whose size is
    * bounded by the analysis window (weeks in range — a few dozen at
    * most), NOT by the user's event count: partial aggregation dedups
    * map-side, so a billion-event user still ships one small set.
    * Cohort (= min) and offsets derive from the set without a second
    * user-keyed pass, and the final (cohort, offset) aggregate is
    * periods² rows — trivially small. The naive two-pass form (min-ts
    * per user, join back over the raw log, then distinct) shuffles the
    * full event log twice.
    *
    * Returns (cohort, week_offset, n_users, retention) with retention
    * relative to the cohort's offset-0 size via a broadcast self-join
    * on the tiny aggregate.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      unit: String = "week"): DataFrame = {
    val perUser = events
      .select(col(userCol).as("__u"),
        date_trunc(unit, col(tsCol)).as("__p"))
      .groupBy(col("__u"))
      .agg(collect_set(col("__p")).as("__ps"))
    val offsets = perUser
      .select(col("__u"), array_min(col("__ps")).as("cohort"),
        explode(col("__ps")).as("__p"))
      .select(col("cohort"), periodOffset(unit).as("week_offset"))
      .groupBy(col("cohort"), col("week_offset"))
      // __ps was a set: one row per (user, period) — count(*) IS the
      // distinct-user count, no countDistinct shuffle needed
      .agg(count(lit(1)).as("n_users"))
    val sizes = offsets.where(col("week_offset") === 0)
      .select(col("cohort"), col("n_users").as("__size"))
    offsets.join(broadcast(sizes), "cohort")
      .withColumn("retention",
        round(col("n_users").cast("double") / col("__size"), 8))
      .drop("__size")
  }

  /** Period-over-period RETURN RATE at corpus scale via KMV sketches
    * ([[graft.functions.KmvAgg]]): for every period pair within
    * `maxLag`, ret(p, k) = |active(p) ∩ active(p+k)| / |active(p)| —
    * the distinct-intersection metric HLL cannot estimate.
    *
    * This is the SCALE path beside [[cohortRetention]]: the exact form
    * shuffles one row per (user, period) and keys a window on the
    * user; here ONE scan builds a fixed k-longs sketch per period
    * (partial/final aggregate — the exchange carries #periods
    * sketches, never user ids) and the pairwise combine runs on the
    * tiny per-period frame. Semantics note: this estimates RETURN rate
    * (activity at p AND p+k, any prior history), not first-touch
    * cohort retention — first-touch needs per-user state a
    * distinct-set sketch cannot carry; exact below k per period.
    *
    * @return (period, lag, n_active, n_returned, return_rate) for
    *         1 <= lag <= maxLag; row order is unspecified (callers
    *         sort) */
  def returnRateSketch(events: DataFrame, userCol: String, tsCol: String,
      unit: String = "week", maxLag: Int = 8, k: Int = 4096): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    graft.functions.GraftFunctions.registerKernels(events.sparkSession)
    // MATERIALIZED (eager checkpoint of the #periods-row aggregate)
    // before the self-join: both join sides reference this subtree, and
    // without pinning, the single-scan property would hang on Spark's
    // exchange-reuse happening to fire — a silent 2× corpus scan if an
    // AQE re-plan or a disabled reuse conf broke canonicalization
    val sk = events.where(col(userCol).isNotNull)
      .select(date_trunc(unit, col(tsCol)).as("period"),
        col(userCol).as("__u"))
      .groupBy(col("period"))
      .agg(call_function("kmv_sketch", xxhash64(col("__u")), lit(k))
        .as("sk"))
      .localCheckpoint()
    val later = sk.select(col("period").as("__p2"), col("sk").as("sk_b"))
    sk.join(broadcast(later), col("__p2") > col("period"))
      .withColumn("lag",
        periodOffsetOf(unit, col("__p2"), col("period")))
      .where(col("lag").between(1, maxLag))
      .select(col("period"), col("lag"),
        call_function("kmv_estimate", col("sk")).as("n_active"),
        call_function("kmv_intersect_estimate", col("sk"), col("sk_b"))
          .as("n_returned"))
      .withColumn("return_rate",
        round(col("n_returned") / col("n_active"), 8))
  }
}
