package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.SetOps

/** KMV distinct sketches: exact below k, partition-invariant state,
  * bounded estimator error, and the cross-source overlap operator
  * agreeing with the exact gram-join report. */
class KmvSketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("kmv: exact regime below k — estimate, intersection and jaccard " +
      "are exact counts") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // A = 0..999, B = 500..1499 → |A|=|B|=1000, |A∩B|=500, k=4096 > all
    val df = ((0L until 1000L).map(("a", _)) ++
        (500L until 1500L).map(("b", _))).toDF("s", "v")
    val sk = df.groupBy($"s")
      .agg(call_function("kmv_sketch", xxhash64($"v"), lit(4096)).as("sk"))
    val m = sk.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .toMap
    val one = spark.sql("SELECT 1").select(
      call_function("kmv_estimate", lit(m("a"))).as("na"),
      call_function("kmv_estimate", lit(m("b"))).as("nb"),
      call_function("kmv_intersect_estimate", lit(m("a")), lit(m("b")))
        .as("ni"),
      call_function("kmv_jaccard", lit(m("a")), lit(m("b"))).as("j"),
      call_function("kmv_estimate",
        call_function("kmv_union", lit(m("a")), lit(m("b")))).as("nu"))
      .collect()(0)
    assert(one.getDouble(0) == 1000.0 && one.getDouble(1) == 1000.0,
      s"below k the sketch holds everything — estimates must be exact: $one")
    assert(one.getDouble(2) == 500.0,
      s"exact-regime intersection must be the true count: ${one.getDouble(2)}")
    assert(math.abs(one.getDouble(3) - 500.0 / 1500.0) < 1e-12)
    assert(one.getDouble(4) == 1500.0,
      s"exact-regime union must be the true count: ${one.getDouble(4)}")
  }

  test("kmv: sketch state is partition-invariant (the k smallest " +
      "distinct hashes do not depend on layout) and dedups repeats") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // heavy repetition: distinct count must ignore multiplicity
    val vals = (0L until 20000L).flatMap(v => Seq.fill(1 + (v % 3).toInt)(v))
    def sketch(parts: Int): Array[Byte] =
      vals.toDF("v").repartition(parts)
        .agg(call_function("kmv_sketch", xxhash64($"v"), lit(1024)))
        .collect()(0).getAs[Array[Byte]](0)
    val s1 = sketch(1)
    val s13 = sketch(13)
    assert(java.util.Arrays.equals(s1, s13),
      "the k-minimum-values state must be identical under any partitioning")
    val est = spark.sql("SELECT 1")
      .select(call_function("kmv_estimate", lit(s1)))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.10,
      s"estimate $est should be within ~3σ (σ≈1/√k≈3%) of 20000")
  }

  test("kmv_union_agg: re-aggregation equals a direct sketch over the " +
      "union, is partition-invariant, skips NULLs, min-k on mixed k") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // per-group sketches (the MV-state shape), then rolled up: the
    // re-aggregated sketch must BYTE-equal a sketch built directly
    // over all values — the property coarser-grain serving rests on
    val df = ((0L until 800L).map(("a", _)) ++
      (400L until 1200L).map(("b", _)) ++
      (0L until 300L).map(("c", _))).toDF("s", "v")
    val perGroup = df.groupBy($"s")
      .agg(call_function("kmv_sketch", xxhash64($"v"), lit(512)).as("sk"))
    def rollup(parts: Int): Array[Byte] = perGroup.repartition(parts)
      .agg(call_function("kmv_union_agg", $"sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val direct = df.agg(
        call_function("kmv_sketch", xxhash64($"v"), lit(512)))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(rollup(1), direct),
      "union-agg of per-group sketches must equal the direct sketch")
    assert(java.util.Arrays.equals(rollup(1), rollup(7)),
      "union-agg must be merge-order/partitioning invariant")
    // NULL rows skip; all-NULL aggregates to NULL
    val withNull = perGroup.select($"sk")
      .unionByName(Seq(1).toDF("x").select(lit(null).cast("binary").as("sk")))
    assert(java.util.Arrays.equals(
      withNull.agg(call_function("kmv_union_agg", $"sk"))
        .collect()(0).getAs[Array[Byte]](0), direct))
    assert(Seq(1, 2).toDF("x").select(lit(null).cast("binary").as("sk"))
      .agg(call_function("kmv_union_agg", $"sk"))
      .collect()(0).isNullAt(0), "all-NULL input must yield NULL")
    // mixed k unions at min(k) — the only θ both sketches can support
    val k256 = df.where($"s" === "a").agg(
        call_function("kmv_sketch", xxhash64($"v"), lit(256)).as("sk"))
    val mixed = perGroup.where($"s" === "b").select($"sk")
      .unionByName(k256)
      .agg(call_function("kmv_union_agg", $"sk"))
      .collect()(0).getAs[Array[Byte]](0)
    val estK = spark.sql("SELECT 1").select(
      call_function("kmv_estimate", lit(mixed))).collect()(0).getDouble(0)
    // 1200 distinct total > 256: estimation regime under the min k
    assert(math.abs(estK - 1200.0) / 1200.0 < 0.25,
      s"mixed-k union estimate $estK should approximate 1200")
  }

  test("kmv: the exact-regime k=2^20 buffer grows on demand — a small " +
      "input stays exact and partition-invariant without preallocating " +
      "the 16 MB table") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // 5000 distinct values force several table doublings (1024-slot
    // start, 75% fill) but never reach saturation — the growth path,
    // the merge-of-grown-tables path, and exactness all in one shape
    def sketch(parts: Int): Array[Byte] =
      (0L until 5000L).toDF("v").repartition(parts)
        .agg(call_function("kmv_sketch", xxhash64($"v"), lit(1 << 20)))
        .collect()(0).getAs[Array[Byte]](0)
    val s1 = sketch(1)
    val s7 = sketch(7)
    assert(java.util.Arrays.equals(s1, s7),
      "growth schedule must not leak into the sketch value")
    val est = spark.sql("SELECT 1")
      .select(call_function("kmv_estimate", lit(s1)))
      .collect()(0).getDouble(0)
    assert(est == 5000.0, s"below-k estimate must be exact, got $est")
  }

  test("kmv: estimation regime — intersection and jaccard within " +
      "tolerance of truth") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // |A|=30k, |B|=30k, |A∩B|=10k (A=0..30k, B=20k..50k), k=2048
    val df = ((0L until 30000L).map(("a", _)) ++
        (20000L until 50000L).map(("b", _))).toDF("s", "v")
    val m = df.groupBy($"s")
      .agg(call_function("kmv_sketch", xxhash64($"v"), lit(2048)).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val r = spark.sql("SELECT 1").select(
      call_function("kmv_intersect_estimate", lit(m("a")), lit(m("b")))
        .as("ni"),
      call_function("kmv_jaccard", lit(m("a")), lit(m("b"))).as("j"))
      .collect()(0)
    // intersection sample size ≈ k × jaccard ≈ 2048/5 → σ ≈ 5%; allow 4σ
    assert(math.abs(r.getDouble(0) - 10000.0) / 10000.0 < 0.20,
      s"intersection estimate ${r.getDouble(0)} vs true 10000")
    assert(math.abs(r.getDouble(1) - 0.2) < 0.05,
      s"jaccard estimate ${r.getDouble(1)} vs true 0.2")
  }

  test("kmv: scalar ops reject non-sketch binary payloads with a typed " +
      "error, not a garbage-length crash") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(Array[Byte](1, 2, 3), // shorter than the header
        Array.fill[Byte](32)(0x7f), // garbage header (k out of range)
        { val b = java.nio.ByteBuffer.allocate(16)
          b.putInt(1024); b.putInt(5); b.array() } // n vs length mismatch
    ).foreach { payload =>
      val e = intercept[Exception](spark.sql("SELECT 1")
        .select(call_function("kmv_estimate", lit(payload))).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("kmv_sketch")),
        s"expected a typed kmv error, got: ${msgs(e)}")
    }
  }

  test("kmv: a non-foldable k is a typed ANALYSIS error, not an " +
      "opaque eval crash") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("a", 64), ("b", 128)).toDF("s", "n")
    val e = intercept[org.apache.spark.sql.AnalysisException](
      df.groupBy().agg(expr("kmv_sketch(xxhash64(s), n)")).collect())
    assert(e.getMessage.contains("foldable"),
      s"expected the foldable-k contract in the error, got: " +
        e.getMessage)
    // ... and an out-of-range foldable k still errors with the range
    val e2 = intercept[Exception](
      df.groupBy().agg(expr("kmv_sketch(xxhash64(s), 4)")).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e2).exists(m => m.contains("[16, 2^20]") ||
      m.contains("16")), s"expected the k range, got: ${msgs(e2)}")
  }

  test("approxSourceOverlap agrees with the exact cross-source report " +
      "on the fixture and combines via broadcast") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val g = Tables.t(spark, dir, "documents")
      .select($"source", split(lower(trim($"text")), "\\s+").as("w"))
      .select($"source",
        explode(graft.operators.Dedup.shinglesFromWords($"w", 5)).as("g"))
    val approx = SetOps.approxSourceOverlap(g, "source", xxhash64($"g"),
      k = 4096)
    // the pairwise combine must broadcast the tiny per-source aggregate
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"),
      "the #sources-row self-combine must be a broadcast, not a shuffle")
    // and the sketch build must run partial/final (map-side combine:
    // the exchange carries #sources sketches, not the gram rows)
    assert(plan.contains("ObjectHashAggregate") &&
        plan.contains("partial_kmv_sketch"),
      s"kmv_sketch must aggregate partial/final:\n$plan")
    val got = approx.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // exact truth per pair
    val distinctG = g.distinct().cache()
    try {
      val exactN = distinctG.groupBy($"source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val a = distinctG.toDF("source_a", "g")
      val b = distinctG.toDF("source_b", "g")
      val exactShared = a.join(b, "g").where($"source_a" < $"source_b")
        .groupBy($"source_a", $"source_b").agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got.keySet == exactShared.keySet ||
        exactShared.keySet.subsetOf(got.keySet),
        "every exact-overlapping pair must appear")
      got.foreach { case ((sa, sb), (na, nb, ni)) =>
        val (ta, tb) = (exactN(sa).toDouble, exactN(sb).toDouble)
        assert(math.abs(na - ta) / ta < 0.10,
          s"$sa cardinality: est $na vs exact $ta")
        assert(math.abs(nb - tb) / tb < 0.10,
          s"$sb cardinality: est $nb vs exact $tb")
        val ti = exactShared.getOrElse((sa, sb), 0L).toDouble
        // absolute slack scaled to the union: small overlaps carry the
        // estimator's union-level noise
        val slack = math.max(0.25 * ti, 0.02 * (ta + tb))
        assert(math.abs(ni - ti) <= slack,
          s"($sa,$sb) shared: est $ni vs exact $ti (slack $slack)")
      }
    } finally { distinctG.unpersist(); () }
  }
}
