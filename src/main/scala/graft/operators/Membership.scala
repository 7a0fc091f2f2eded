package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Membership operators for corpus-scale filtering against a keyed set
  * (blocklists, allowlists, eval-set ids): the Bloom-prefilter join.
  *
  * The naive semi-join shuffles the ENTIRE corpus on the key even though
  * almost no rows match a (comparatively tiny) blocklist. Here the set is
  * collapsed into one broadcast Bloom filter
  * ([[graft.functions.BloomBuildAgg]]) and non-members are dropped
  * scan-locally — two hashes per row, no exchange — before the exact
  * join verifies the survivors (Bloom false positives removed), so the
  * result is EXACT while the shuffle carries only candidate matches.
  * This is the membership analog of Spark's runtime row-level filtering,
  * made explicit and tunable (filter size/hash count) per use.
  */
object Membership {

  /** Exact semi-join of `big` against `keys`, Bloom-prefiltered.
    *
    * @param big     corpus side (streamed; never fully shuffled)
    * @param keys    key-set side — expected orders of magnitude smaller
    *                than `big`; the Bloom filter must be sized to it
    *                (numBits ≳ 10× distinct keys for ~1% FP)
    * @param bigKey  join column on `big`
    * @param keyCol  join column on `keys`
    */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keyCol: String, numBits: Int = 1 << 20,
      numHashes: Int = 5): DataFrame = {
    // xxhash64 output depends on the INPUT TYPE, not just the value: an
    // INT 7 and a BIGINT 7 hash differently, so a type mismatch between
    // the two sides would make the prefilter silently drop true matches
    // (the exact join would have coerced them). Demand identical types —
    // the caller casts one side explicitly.
    val bt = big.schema(bigKey).dataType
    val kt = keys.schema(keyCol).dataType
    require(bt == kt,
      s"bloomSemiJoin key types must match exactly: $bigKey is " +
        s"${bt.catalogString} but $keyCol is ${kt.catalogString} — " +
        "cast one side before the join (xxhash64 is type-sensitive, so " +
        "mismatched types silently drop true matches in the prefilter)")
    graft.functions.GraftFunctions.registerKernels(big.sparkSession)
    // the keys plan is evaluated TWICE below (Bloom aggregate + exact
    // verify join). A non-deterministic plan (sample, limit-without-
    // order, rand-derived) would give the two evaluations different key
    // sets, and a row in the verify draw but not the Bloom draw is
    // silently killed by the prefilter — pin ONE materialization first.
    // Deterministic plans skip the extra job.
    val keysOnce = {
      import org.apache.spark.sql.catalyst.plans.logical.{Sample, LocalLimit, GlobalLimit, Sort}
      val plan = keys.queryExecution.analyzed
      val nonDet = plan.find {
        case _: Sample => true
        case _: LocalLimit | _: GlobalLimit =>
          // a limit over unordered input picks arbitrary rows per run
          plan.find(_.isInstanceOf[Sort]).isEmpty
        case p => p.expressions.exists(e => !e.deterministic)
      }.isDefined
      if (nonDet) keys.localCheckpoint() else keys
    }
    val filter = keysOnce.agg(
      call_function("bloom_build", xxhash64(col(keyCol)),
        lit(numBits), lit(numHashes)).as("__bloom"))
    val verified = keysOnce.select(col(keyCol).as(bigKey)).distinct()
    big
      // single-row filter: broadcast once, probe scan-locally
      .crossJoin(broadcast(filter))
      .where(call_function("bloom_contains", col("__bloom"),
        xxhash64(col(bigKey))))
      .drop("__bloom")
      // exact verification pass removes Bloom false positives; only the
      // prefilter survivors reach this join
      .join(verified, Seq(bigKey), "left_semi")
  }
}
