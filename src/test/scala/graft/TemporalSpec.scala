package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

/** Semantics and scale-shape tests for the temporal joins (as-of and
  * range): boundary inclusivity, unmatched-row nulls, determinism under
  * partition layout, equivalence to the naive theta-join, and the
  * loud-failure guard on pathological intervals.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def leftDf = {
    import spark.implicits._
    Seq(
      (1L, 10L, ts("2024-01-01 00:00:10")),
      (2L, 10L, ts("2024-01-01 00:00:20")),
      (3L, 10L, ts("2024-01-01 00:00:05")), // before any right row
      (4L, 20L, ts("2024-01-01 00:01:00")),
      (5L, 30L, ts("2024-01-01 00:00:30")) // key with no right rows
    ).toDF("id", "k", "t")
  }

  private def rightDf = {
    import spark.implicits._
    Seq(
      (10L, ts("2024-01-01 00:00:10"), "a"), // equal-ts tie with left id=1
      (10L, ts("2024-01-01 00:00:15"), "b"),
      (20L, ts("2024-01-01 00:00:59"), "c")
    ).toDF("k", "rt", "payload")
  }

  test("asof join picks the latest right row at-or-before each left row") {
    val out = Temporal.asofJoin(leftDf, rightDf, "k", "t", "rt")
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out === Map(
      1L -> "a", // inclusive: equal-ts right row is visible
      2L -> "b", // latest of the two earlier rows
      3L -> null, // left row precedes every right row
      4L -> "c",
      5L -> null)) // no right rows for the key
  }

  test("strict (exclusive) asof join hides the equal-ts right row") {
    val out = Temporal.asofJoin(leftDf, rightDf, "k", "t", "rt",
        inclusive = false)
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out(1L) === null) // ts equality no longer matches
    assert(out(2L) === "b")
  }

  test("asof join is invariant to partition layout") {
    val a = Temporal.asofJoin(leftDf, rightDf, "k", "t", "rt")
      .orderBy("id").collect().toSeq
    val b = Temporal.asofJoin(
        leftDf.repartition(7, col("t")), rightDf.repartition(5),
        "k", "t", "rt")
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("asof join plan has one key exchange and no join operator") {
    val plan = Temporal.asofJoin(leftDf, rightDf, "k", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"union-merge as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected the running window:\n$plan")
  }

  test("asof join matches the events-table theta-join semantics") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.t(spark, dir, "events")
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    val got = Temporal.asofJoin(clicks, purchases, "user_id", "ts", "p_ts")
      .select("event_id", "purchase_id").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // naive oracle: per click, the max-(ts, id) purchase at or before it
    val naive = clicks.as("c").join(purchases.as("p"),
        col("c.user_id") === col("p.user_id") &&
          col("c.ts") >= col("p.p_ts"), "left")
      .groupBy(col("c.event_id").as("event_id"))
      .agg(max_by(col("p.purchase_id"),
        struct(col("p.p_ts"), col("p.purchase_id"))).as("purchase_id"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got.nonEmpty && got === naive)
    assert(got.values.exists(_ >= 0), "fixture should produce matches")
  }

  test("asof join equals the naive theta-join on randomized inputs") {
    import spark.implicits._
    // seeded random keys/times with deliberate collisions (small domains)
    // so equal-ts ties and empty keys both occur
    val rng = new scala.util.Random(0xA50F)
    val left = (1L to 400L).map(i =>
      (i, (rng.nextInt(12) + 1).toLong,
        ts(f"2024-01-01 00:0${rng.nextInt(6)}%d:${rng.nextInt(60)}%02d")))
      .toDF("id", "k", "t")
    val right = Seq.tabulate(150)(i =>
      ((i + 1000).toLong, (rng.nextInt(16) + 1).toLong,
        ts(f"2024-01-01 00:0${rng.nextInt(6)}%d:${rng.nextInt(60)}%02d")))
      // unique (k, rt): the operator's tie contract is deterministic but
      // the naive oracle below needs a single max row per (k, rt)
      .toDF("rid", "k", "rt")
      .groupBy("k", "rt").agg(max("rid").as("rid"))
      .select("rid", "k", "rt")
    for (inclusive <- Seq(true, false)) {
      val got = Temporal.asofJoin(left, right, "k", "t", "rt", inclusive)
        .select("id", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val cond = if (inclusive) col("l.t") >= col("r.rt")
        else col("l.t") > col("r.rt")
      val naive = left.as("l")
        .join(right.as("r"), col("l.k") === col("r.k") && cond, "left")
        .groupBy(col("l.id").as("id"))
        .agg(max_by(col("r.rid"), struct(col("r.rt"), col("r.rid")))
          .as("rid"))
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(got === naive, s"inclusive=$inclusive")
      assert(got.values.exists(_ >= 0) && got.values.exists(_ < 0),
        "fixture must exercise both matched and unmatched rows")
    }
  }

  test("multi-key asof join keys on the full composite") {
    import spark.implicits._
    val l = Seq(
      (1L, 10L, "a", ts("2024-01-01 00:00:20")),
      (2L, 10L, "b", ts("2024-01-01 00:00:20"))
    ).toDF("id", "k1", "k2", "t")
    val r = Seq(
      (10L, "a", ts("2024-01-01 00:00:10"), "pay-a"),
      (10L, "b", ts("2024-01-01 00:00:15"), "pay-b"),
      (11L, "a", ts("2024-01-01 00:00:01"), "wrong-k1")
    ).toDF("k1", "k2", "rt", "payload")
    val out = Temporal.asofJoinMulti(l, r, Seq("k1", "k2"), "t", "rt")
      .select("id", "payload").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(out === Map(1L -> "pay-a", 2L -> "pay-b"))
  }

  test("range join works on a numeric axis") {
    import spark.implicits._
    val points = Seq((1L, 105L), (2L, 250L), (3L, 999L)).toDF("pid", "pt")
    val bands = Seq((10L, 100L, 199L), (20L, 200L, 299L))
      .toDF("band", "lo", "hi")
    val got = Temporal.rangeJoin(points, bands, "pt", "lo", "hi",
        bucketWidth = 50)
      .select("pid", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }

  test("range join handles negative numeric axes (floor cells)") {
    import spark.implicits._
    val points = Seq((1L, -105L), (2L, -1L), (3L, 49L)).toDF("pid", "pt")
    val bands = Seq((10L, -150L, -100L), (20L, -10L, 60L))
      .toDF("band", "lo", "hi")
    val got = Temporal.rangeJoin(points, bands, "pt", "lo", "hi",
        bucketWidth = 50)
      .select("pid", "band").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // floor(-1/50) = -1 ≠ truncation's 0: points and intervals must
    // agree on the cell of every negative coordinate
    assert(got === Set((1L, 10L), (2L, 20L), (3L, 20L)))
  }

  test("range join equals the naive theta-join incl. boundary rows") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == lo of interval 100
      (2L, ts("2024-01-03 12:00:00")),
      (3L, ts("2024-01-08 00:00:00")), // == hi of interval 100 (inclusive)
      (4L, ts("2024-01-08 00:00:01")), // just past hi
      (5L, ts("2024-03-01 00:00:00")) // matches nothing
    ).toDF("pid", "pt")
    val intervals = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")),
      (200L, ts("2024-01-02 00:00:00"), ts("2024-01-02 23:59:59")),
      (300L, ts("2024-01-07 00:00:00"), ts("2024-01-20 00:00:00"))
    ).toDF("iid", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = key(Temporal.rangeJoin(points, intervals,
      "pt", "lo", "hi", bucketWidth = 86400))
    val naive = key(points.crossJoin(intervals)
      .where(col("pt") >= col("lo") && col("pt") <= col("hi")))
    assert(got === naive)
    assert(naive === Set((1L, 100L), (2L, 100L), (3L, 100L),
      (3L, 300L), (4L, 300L)))
    // a (point, interval) pair must appear exactly once, not per cell
    val n = Temporal.rangeJoin(points, intervals,
      "pt", "lo", "hi", bucketWidth = 86400).count()
    assert(n === naive.size.toLong)
  }

  test("asof join: null-timestamp left rows match nothing") {
    import spark.implicits._
    val l = Seq((1L, 10L, Option(ts("2024-01-01 00:00:20"))),
        (2L, 10L, Option.empty[Timestamp]))
      .toDF("id", "k", "t")
    val out = Temporal.asofJoin(l, rightDf, "k", "t", "rt")
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(out(1L) === "b")
    assert(out(2L) === null,
      "as-of over an unknown time must not match")
  }

  test("asof join drops null-timestamp right rows (no -infinity match)") {
    import spark.implicits._
    // a null right ts would sort first (nulls-first) and last(ignoreNulls)
    // would carry its payload to EVERY left row until a later right row
    // overrides it — i.e. a match at time -infinity. NULL <= t is never
    // true, so such rows must match nothing.
    val r = Seq(
      (10L, Option.empty[Timestamp], "ghost"),
      (10L, Option(ts("2024-01-01 00:00:15")), "real")
    ).toDF("k", "rt", "payload")
    val out = Temporal.asofJoin(leftDf, r, "k", "t", "rt")
      .select("id", "payload").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    assert(out(1L) === null, "id=1 (t=10s) precedes the only real right row")
    assert(out(3L) === null, "id=3 (t=5s) precedes the only real right row")
    assert(out(2L) === "real")
  }

  test("bucketed asof join equals the plain asof join") {
    import spark.implicits._
    val rng = new scala.util.Random(0xB0C5E7)
    val left = (1L to 500L).map(i =>
      (i, (rng.nextInt(10) + 1).toLong,
        ts(f"2024-01-01 0${rng.nextInt(10)}%d:${rng.nextInt(60)}%02d:" +
          f"${rng.nextInt(60)}%02d")))
      .toDF("id", "k", "t")
    val right = Seq.tabulate(200)(i =>
      ((i + 1000).toLong, (rng.nextInt(14) + 1).toLong,
        ts(f"2024-01-01 0${rng.nextInt(10)}%d:${rng.nextInt(60)}%02d:" +
          f"${rng.nextInt(60)}%02d")))
      .toDF("rid", "k", "rt")
      .groupBy("k", "rt").agg(max("rid").as("rid"))
      .select("rid", "k", "rt")
    for {
      inclusive <- Seq(true, false)
      width <- Seq(60L, 3600L, 7L) // sub-minute, hour, prime odd width
    } {
      val plain = Temporal.asofJoin(left, right, "k", "t", "rt", inclusive)
        .orderBy("id").collect().toSeq
      val bucketed = Temporal.asofJoinBucketed(left, right, Seq("k"),
          "t", "rt", bucketWidth = width, inclusive)
        .orderBy("id").collect().toSeq
      assert(bucketed === plain, s"inclusive=$inclusive width=$width")
    }
  }

  test("bucketed asof join: null timestamps behave like the plain form") {
    import spark.implicits._
    val l = Seq((1L, 10L, Option(ts("2024-01-01 00:00:20"))),
        (2L, 10L, Option.empty[Timestamp]))
      .toDF("id", "k", "t")
    val r = Seq(
      (10L, Option.empty[Timestamp], "ghost"),
      (10L, Option(ts("2024-01-01 00:00:15")), "real")
    ).toDF("k", "rt", "payload")
    val out = Temporal.asofJoinBucketed(l, r, Seq("k"), "t", "rt",
        bucketWidth = 60)
      .select("id", "payload").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getString(1)))
      .toMap
    assert(out === Map(1L -> "real", 2L -> null))
  }

  test("bucketed asof join parallelizes one key across bucket groups") {
    import spark.implicits._
    // one pathologically hot key: the plain form puts all its rows in a
    // single window group; the bucketed form must partition the merge
    // window by (key, bucket)
    val left = (1L to 300L).map(i => (i, 1L, ts(
        f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00")))
      .toDF("id", "k", "t")
    val right = (0L until 300L by 7L).map(i => ((i + 1000L), 1L, ts(
        f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:30")))
      .toDF("rid", "k", "rt")
    val q = Temporal.asofJoinBucketed(left, right, Seq("k"), "t", "rt",
      bucketWidth = 600)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("__b"),
      s"merge window must be keyed by (key, bucket):\n$plan")
    val plain = Temporal.asofJoin(left, right, "k", "t", "rt")
      .orderBy("id").collect().toSeq
    assert(q.orderBy("id").collect().toSeq === plain)
  }

  test("range join drops inverted and null-bounded intervals") {
    import spark.implicits._
    val points = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("pid", "pt")
    val bad = Seq(
      (9L, Option(ts("2024-02-01 00:00:00")), Option(ts("2024-01-01 00:00:00"))),
      (10L, Option.empty[Timestamp], Option(ts("2024-03-01 00:00:00"))),
      (11L, Option(ts("2024-01-01 00:00:00")), Option.empty[Timestamp])
    ).toDF("iid", "lo", "hi")
    // SQL BETWEEN semantics: no matches, and in particular no crash from
    // the width assert seeing a null condition
    assert(Temporal.rangeJoin(points, bad, "pt", "lo", "hi",
      bucketWidth = 86400).count() === 0L)
  }

  test("range join fails loudly on an interval wider than the cap") {
    import spark.implicits._
    val points = Seq((1L, ts("2024-01-05 00:00:00"))).toDF("pid", "pt")
    val wide = Seq(
      (9L, ts("2024-01-01 00:00:00"), ts("2026-01-01 00:00:00"))
    ).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      Temporal.rangeJoin(points, wide, "pt", "lo", "hi",
        bucketWidth = 86400, maxBucketsPerInterval = 30).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("rangeJoin")),
      s"expected the rangeJoin guard message, got: $ex")
  }

  test("range join plans an equi-shuffle, never a nested loop") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q_range_join")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join on the cell id:\n$plan")
  }

  test("cohort retention: hand-built log, known cohorts and offsets") {
    import spark.implicits._
    // weeks (Mondays): 2024-01-01, -08, -15. u1 joins w0 active w0+w2;
    // u2 joins w0 only; u3 joins w1, active w1+w2; duplicate events in
    // one week must not double-count
    val ev = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-03 11:00:00"),
      (1L, "2024-01-16 09:00:00"),
      (2L, "2024-01-04 08:00:00"),
      (3L, "2024-01-09 12:00:00"), (3L, "2024-01-18 23:00:00"))
      .map { case (u, t) => (u, ts(t)) }.toDF("u", "t")
    val got = Temporal.cohortRetention(ev, "u", "t")
      .orderBy($"cohort", $"week_offset")
      .collect()
      .map(r => (r.getTimestamp(0).toString.substring(0, 10),
        r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L, 1.0),
      ("2024-01-01", 2, 1L, 0.5),
      ("2024-01-08", 0, 1L, 1.0),
      ("2024-01-08", 1, 1L, 1.0)))
    // monthly cohorts take the same path
    val m = Temporal.cohortRetention(ev, "u", "t", unit = "month")
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(m == Seq((0, 3L)))
    intercept[IllegalArgumentException] {
      Temporal.cohortRetention(ev, "u", "t", unit = "hour")
    }
  }

  test("resample forward-fill: grid bounds, gap fill, loud span guard") {
    import spark.implicits._
    // key 1: obs at :00:10 and :02:10 → 30s grid :00:00..:02:00, the
    // first tick PRECEDES the first obs (null payload), later ticks
    // carry v=1 until :02:00 (still v=1 — obs :02:10 is after the
    // tick); key 2: single obs → single tick
    val ev = Seq((1L, "2024-05-01 00:00:10", 1.0),
      (1L, "2024-05-01 00:02:10", 2.0),
      (2L, "2024-05-01 07:00:05", 9.0))
      .map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "t", "v")
    val got = Temporal.resampleForwardFill(ev, "k", "t", 30L)
      .orderBy($"k", $"grid_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, "2024-05-01 00:00:00.0", None),
      (1L, "2024-05-01 00:00:30.0", Some(1.0)),
      (1L, "2024-05-01 00:01:00.0", Some(1.0)),
      (1L, "2024-05-01 00:01:30.0", Some(1.0)),
      (1L, "2024-05-01 00:02:00.0", Some(1.0)),
      (2L, "2024-05-01 07:00:00.0", None)))
    // a fat-finger span (years at 1s) fails loudly instead of exploding
    val wide = Seq((1L, ts("2020-01-01 00:00:00"), 1.0),
      (1L, ts("2026-01-01 00:00:00"), 2.0)).toDF("k", "t", "v")
    val err = intercept[Exception] {
      Temporal.resampleForwardFill(wide, "k", "t", 1L).collect()
    }
    assert(err.toString.contains("resampleForwardFill"))
  }

  test("engagement rollup: exact dau/mau on a hand log; sketch mode " +
      "tracks exact within 2%") {
    import spark.implicits._
    // u1 active d1,d2; u2 active d1; u3 active d3. window=2:
    // d1: dau 2, mau{u1,u2}=2; d2: dau 1, mau[d1,d2]{u1,u2}=2;
    // d3: dau 1, mau[d2,d3]{u1,u3}=2
    val ev = Seq((1L, "2024-03-01 10:00:00"), (1L, "2024-03-02 09:00:00"),
      (1L, "2024-03-01 23:00:00"), (2L, "2024-03-01 05:00:00"),
      (3L, "2024-03-03 12:00:00"))
      .map { case (u, t) => (u, ts(t)) }.toDF("u", "t")
    val got = Temporal.engagementRollup(ev, "u", "t", windowDays = 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 2L, 2L, 1.0),
      ("2024-03-02", 1L, 2L, 0.5),
      ("2024-03-03", 1L, 2L, 0.5)))
    // NULL users count in NEITHER side: count(*) over the distinct
    // user-day table included (NULL, d) in dau while countDistinct and
    // the HLL both skip nulls in mau — dau could exceed mau (stickiness
    // > 1, or NULL on an all-null day)
    val withNulls = ev.union(Seq(
        (Option.empty[Long], ts("2024-03-01 11:00:00")),
        (Option.empty[Long], ts("2024-03-04 08:00:00"))) // null-only day
      .toDF("u", "t"))
    val gotN = Temporal.engagementRollup(withNulls, "u", "t", windowDays = 2)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(gotN.toSeq == got.toSeq,
      s"null users must not create days or inflate dau: ${gotN.toSeq}")
    // sketch mode on the real fixture: estimate within 2% per day
    val events = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val exact = Temporal.engagementRollup(events, "user_id", "ts",
        windowDays = 7)
      .collect().map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    val approx = Temporal.engagementRollup(events, "user_id", "ts",
        windowDays = 7, exact = false)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2)))
    approx.foreach { case (day, _, est) =>
      val truth = exact(day)
      assert(math.abs(est - truth) <= math.max(1, truth * 0.02),
        s"$day: hll $est vs exact $truth")
    }
    // the sketch plan never explodes user ids — its only explode runs
    // over the per-day sketch rows
    val plan = Temporal.engagementRollup(events, "user_id", "ts",
      windowDays = 7, exact = false).queryExecution.optimizedPlan.toString
    assert(plan.contains("hll_union_agg") || plan.contains("HllUnionAgg"),
      s"sketch mode must merge sketches:\n$plan")
  }

  test("cohort retention shuffles the log once: no window, no second " +
      "log-wide exchange") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q_cohort_retention")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"cohort retention must not use a window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the log-wide shuffle is the user-keyed set aggregate, and it is
    // PARTIAL before the exchange — map-side dedup is what bounds a
    // billion-event user to one small set on the wire
    assert(plan.contains("partial_collect_set") ||
      plan.contains("collect_set"), s"expected set aggregate:\n$plan")
    // the cohort-size join rides broadcast, never a log-sized shuffle
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("round-9 second review pins: unparsable right ts dropped, map " +
      "payloads orderable-tie-break, all-null-ts key resamples to zero") {
    import spark.implicits._
    import graft.operators.Temporal
    // right ts that casts to null must be DROPPED, not sort at -inf
    val l = Seq((1L, "2024-01-05 00:00:00")).toDF("k", "lt")
      .withColumn("lt", col("lt").cast("timestamp"))
    val rBad = Seq((1L, "not-a-time", "junk"),
      (1L, "2024-01-02 00:00:00", "real")).toDF("k", "rt", "payload")
    val m = Temporal.asofJoin(l, rBad, "k", "lt", "rt").collect().head
    assert(m.getAs[String]("payload") == "real",
      "an unparsable right timestamp must never forward-fill")
    // map-typed payload: previously failed analysis (unorderable sort
    // key); now rides along with the orderable columns as tie-break
    val rMap = Seq((1L, "2024-01-01 00:00:00", Map("a" -> "1")))
      .toDF("k", "rt", "attrs")
      .withColumn("rt", col("rt").cast("timestamp"))
    val mm = Temporal.asofJoin(l, rMap, "k", "lt", "rt").collect().head
    assert(mm.getAs[Map[String, String]]("attrs") == Map("a" -> "1"))
    // a key whose every ts is null produces zero grid rows, not a
    // misleading span-guard error
    val nulls = Seq((9L, null.asInstanceOf[java.sql.Timestamp], 1.0))
      .toDF("k", "ts", "v")
    assert(Temporal.resampleForwardFill(nulls, "k", "ts", 60).count() == 0)
  }

  test("returnRateSketch tracks the exact pairwise intersection; " +
      "exact below k per period") {
    import spark.implicits._
    // small synthetic: 3 weeks, known overlaps, all under k → EXACT
    def w(d: Int, u: Long) = (u, ts(f"2024-03-$d%02d 10:00:00"))
    val ev = (
      (1L to 100L).map(w(4, _)) ++        // week of Mar 4: u1..100
      (51L to 150L).map(w(11, _)) ++      // week of Mar 11: u51..150
      (101L to 130L).map(w(18, _))        // week of Mar 18: u101..130
    ).toDF("u", "t")
    // key by EPOCH instant, not Timestamp.toString: the string renders
    // in the JVM default timezone (only the Spark session is pinned
    // UTC), so a host west of UTC would shift every date string
    def utc(d: String) = java.sql.Timestamp.from(
      java.time.Instant.parse(d + "T00:00:00Z"))
    val got = Temporal.returnRateSketch(ev, "u", "t", unit = "week",
        maxLag = 2, k = 1024)
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // |active(w1)|=100, |w1 ∩ w2|=50, |w1 ∩ w3|=0 (u101.. not in w1? u101..130 vs w1 u1..100 → empty)
    assert(got((utc("2024-03-04"), 1)) == ((100.0, 50.0)),
      s"w1->w2: ${got((utc("2024-03-04"), 1))}")
    assert(got((utc("2024-03-04"), 2))._2 == 0.0)
    assert(got((utc("2024-03-11"), 1)) == ((100.0, 30.0)),
      s"w2->w3: ${got((utc("2024-03-11"), 1))}")
    // fixture: estimates track the exact pairwise intersections
    val events = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .where(pmod(col("event_id") * 31 + col("user_id"), lit(7)) === 0)
    val approx = Temporal.returnRateSketch(events, "user_id", "ts",
        unit = "week", maxLag = 3, k = 4096)
      .collect().map(r => (r.getTimestamp(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    val up = events.select(date_trunc("week", col("ts")).as("p"),
      col("user_id").as("u")).distinct().cache()
    try {
      val exN = up.groupBy(col("p")).count().collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val a = up.toDF("pa", "u")
      val b = up.toDF("pb", "u")
      val exI = a.join(b, "u").where(col("pb") > col("pa"))
        .groupBy(col("pa"), col("pb")).count().collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1)) -> r.getLong(2))
        .toMap
      assert(approx.nonEmpty, "fixture must produce period pairs")
      approx.foreach { case ((p, lag), (nAct, nRet)) =>
        val tAct = exN(p).toDouble
        assert(math.abs(nAct - tAct) / tAct < 0.10,
          s"$p active: est $nAct vs exact $tAct")
        val p2 = new java.sql.Timestamp(
          p.getTime + lag.toLong * 7 * 86400000L)
        val tRet = exI.getOrElse((p, p2), 0L).toDouble
        val slack = math.max(0.25 * tRet, 0.05 * tAct)
        assert(math.abs(nRet - tRet) <= slack,
          s"($p, +$lag): est $nRet vs exact $tRet (slack $slack)")
      }
    } finally { up.unpersist(); () }
  }
}
