package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The shuffle-byte budget gate's trip-wire: proves the audit actually
  * measures exchange bytes and that a deliberately widened shuffle (the
  * regression class the budgets exist for — a lost projection shipping
  * payloads through an exchange) breaches a budget derived from the
  * narrow measurement. The committed budgets themselves live in
  * src/main/resources/shuffle_budgets.txt and gate `runMain
  * graft.ShuffleAudit` at sf0.1. */
class ShuffleAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("budgets resource parses and covers the sf0.1 default probe set") {
    val b = ShuffleAudit.budgets
    assert(b.nonEmpty, "shuffle_budgets.txt must be committed")
    assert(b.keys.forall(_.startsWith("sf")), "keys are <sf>/<query>")
    assert(b.values.forall(_ > 0))
    assert(b.contains("sf0.1/q_dedup_minhash") && b.contains("sf0.1/q1_agg"))
  }

  test("widened shuffle breaches the budget derived from the narrow run") {
    import spark.implicits._
    val base = spark.range(20000).toDF("k")
      .withColumn("g", col("k") % 97)
    // narrow: only (g, partial counts) ride the exchange
    val (nEx, narrowBytes, unmeasured) =
      ShuffleAudit.measure(base.groupBy("g").count())
    assert(nEx >= 1, "grouped agg must have an exchange")
    assert(narrowBytes > 0, "exchange bytes must be measured, not zero")
    assert(unmeasured == 0, "shuffleBytesWritten must exist on every exchange")
    val budgets = Map("sfX/q_trip" -> narrowBytes * 3)
    assert(ShuffleAudit.budgetBreaches(
      Seq("q_trip" -> narrowBytes), budgets, "sfX").isEmpty,
      "narrow run must sit inside its own 3x budget")
    // widened: a ~1 KB INCOMPRESSIBLE payload column rides the same
    // g-keyed exchange — consumed by a WINDOW aggregate, which runs
    // post-shuffle with no partial step, so Catalyst can neither prune
    // the column below the exchange nor shrink it map-side (the
    // lost-projection failure mode); per-row sha chains so the shuffle
    // codec can't compress the regression away
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("k")
    val (_, wideBytes, _) = ShuffleAudit.measure(
      base.withColumn("payload", concat_ws("",
          transform(sequence(lit(0), lit(15)),
            i => sha2(concat(col("k").cast("string"), i.cast("string")), 256))))
        .withColumn("p1", first(col("payload")).over(w))
        .groupBy("g").agg(max(length(col("p1"))).as("n")))
    assert(wideBytes > narrowBytes * 3,
      s"widened shuffle ($wideBytes) must dwarf the narrow one ($narrowBytes)")
    val breaches = ShuffleAudit.budgetBreaches(
      Seq("q_trip" -> wideBytes), budgets, "sfX")
    assert(breaches.size == 1 && breaches.head.contains("q_trip"),
      s"widened shuffle must trip the budget gate: $breaches")
    // a scale with no budget line reports nothing (no false gate)
    assert(ShuffleAudit.budgetBreaches(
      Seq("q_trip" -> wideBytes), budgets, "sfOther").isEmpty)
  }
}
