package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomLite
import graft.operators.Membership

/** Bloom-filter kernel and prefilter-join properties: no false
  * negatives (the load-bearing guarantee), bounded false-positive rate
  * at the advertised sizing, byte-identical filters under any partition
  * layout (OR-merge associativity), and exactness of the prefiltered
  * semi-join vs the plain one. */
class BloomSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def buildFilter(keys: Seq[Long], numBits: Int, k: Int,
      parts: Int): Array[Byte] = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    keys.toDF("key").repartition(parts)
      .agg(call_function("bloom_build", col("key"),
        lit(numBits), lit(k)).as("f"))
      .head().getAs[Array[Byte]](0)
  }

  test("no false negatives, ever") {
    val keys = (0L until 5000L).map(i => i * 2654435761L)
    val f = buildFilter(keys, numBits = 1 << 16, k = 5, parts = 7)
    assert(keys.forall(BloomLite.contains(f, _)))
  }

  test("false-positive rate is near the analytic bound at 10 bits/key") {
    val keys = (0L until 5000L)
    val f = buildFilter(keys, numBits = 50000, k = 5, parts = 4)
    val probes = (100000L until 200000L)
    val fp = probes.count(BloomLite.contains(f, _)).toDouble / probes.size
    // (1 - e^{-kn/m})^k at k=5, n/m=1/10 ≈ 0.009; allow 3× headroom
    assert(fp < 0.03, s"false-positive rate $fp too high")
    assert(fp > 0.0, "a sized-down filter should show SOME false positives")
  }

  test("filter bytes are identical under any partition layout") {
    val keys = (0L until 2000L).map(i => i * 31L)
    val a = buildFilter(keys, 1 << 14, 4, parts = 1)
    val b = buildFilter(keys, 1 << 14, 4, parts = 13)
    val c = buildFilter(keys.reverse, 1 << 14, 4, parts = 5)
    assert(java.util.Arrays.equals(a, b) && java.util.Arrays.equals(b, c))
  }

  test("probe agrees between interpreted eval and codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val keys = (0L until 100L)
    val f = buildFilter(keys, 1 << 12, 4, parts = 2)
    val probed = (0L until 300L).toDF("key")
      .withColumn("hit", call_function("bloom_contains",
        lit(f), col("key")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 300L).foreach { i =>
      assert(probed(i) === BloomLite.contains(f, i),
        s"codegen/interpreted disagreement at $i")
    }
    assert((0L until 100L).forall(probed(_)))
  }

  test("bloom semi-join is exact vs the plain semi-join") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val keys = e.where(col("event_type") === "purchase")
      .select(col("user_id")).distinct().where(col("user_id") % 3 === 0)
    val got = Membership.bloomSemiJoin(e, keys, "user_id", "user_id",
        numBits = 1 << 14)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val exact = e.join(keys, Seq("user_id"), "left_semi")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got === exact)
    assert(exact.nonEmpty, "fixture should produce matches")
  }

  test("bloom semi-join rejects mismatched key types loudly") {
    import spark.implicits._
    // xxhash64 output depends on the input TYPE: INT 7 and BIGINT 7 hash
    // differently, so a silent type mismatch would drop true matches in
    // the prefilter while the exact join would have coerced them
    val big = Seq(1L, 2L, 3L).toDF("k")
    val keysInt = Seq(1, 2).toDF("k") // INT vs big's BIGINT
    val ex = intercept[IllegalArgumentException] {
      Membership.bloomSemiJoin(big, keysInt, "k", "k")
    }
    assert(ex.getMessage.contains("key types must match"))
    // and the explicit cast the message prescribes restores exactness
    val got = Membership.bloomSemiJoin(big,
        keysInt.select(col("k").cast("long").as("k")), "k", "k")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L))
  }

  test("non-deterministic keys plans are pinned once: the operator " +
      "checkpoints, deterministic plans don't pay the extra job") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Sample
    val big = (0L until 200L).toDF("k")
    val keys = (0L until 100L).toDF("k")
    // keys evaluates TWICE inside bloomSemiJoin (Bloom agg + verify
    // join): a sample/limit/rand-derived plan can draw differently per
    // evaluation under recompute or layout change, and a key in the
    // verify draw but not the Bloom draw is silently killed by the
    // prefilter. The fix pins ONE materialization — so no Sample node
    // may survive into the result plan.
    val sampled = Membership.bloomSemiJoin(big, keys.sample(0.5), "k", "k",
      numBits = 1 << 12)
    assert(sampled.queryExecution.analyzed
        .find(_.isInstanceOf[Sample]).isEmpty,
      "a Sample keys plan must be checkpointed, not re-evaluated per side")
    // and the pinned result is internally exact: every returned row's
    // key is in the (single) drawn key set, counted stably
    assert(sampled.count() === sampled.count())
    // a deterministic keys plan keeps its lazy plan (no checkpoint job):
    // the Project over the range source must still be visible
    val det = Membership.bloomSemiJoin(big, keys.where($"k" < 10L),
      "k", "k", numBits = 1 << 12)
    assert(det.queryExecution.analyzed.find(p =>
        p.getClass.getSimpleName == "LogicalRDD").isEmpty,
      "deterministic keys must not pay a checkpoint materialization")
    assert(det.collect().map(_.getLong(0)).toSet === (0L until 10L).toSet)
  }

  test("empty key set: filter rejects everything, semi-join is empty") {
    import spark.implicits._
    val keys = (0L until 100L)
    val f = buildFilter(keys.filter(_ => false), 1 << 12, 4, parts = 3)
    assert(keys.forall(!BloomLite.contains(f, _)),
      "an empty-set filter must reject every probe")
    val e = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"))
    val none = e.where(col("user_id") < 0).select(col("user_id"))
    assert(Membership.bloomSemiJoin(e, none, "user_id", "user_id",
      numBits = 1 << 12).count() === 0L)
  }

  test("prefilter runs scan-local: bloom probe sits below the join") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q_bloom_blocklist")(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"),
      s"bloom probe must appear in the plan:\n$plan")
    // the corpus side must NOT hash-exchange before the bloom probe:
    // the probe's Filter has a scan (or the broadcast cross join) below
    // it, never a hashpartitioning exchange
    val probeIdx = plan.indexOf("bloom_contains")
    val scanIdx = plan.indexOf("Scan parquet", probeIdx)
    val exchIdx = plan.indexOf("hashpartitioning", probeIdx)
    assert(scanIdx >= 0 && (exchIdx < 0 || scanIdx < exchIdx),
      s"corpus must stream into the probe without a shuffle:\n$plan")
  }
}
