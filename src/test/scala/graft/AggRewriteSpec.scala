package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Materialize
import graft.plans.GraftAggViews

/** The materialized-aggregate rewrite: a matching query aggregate must
  * scan the registered state instead of the fact, roll up to coarser
  * grains, refuse what the state can't answer exactly, and restore the
  * fact scan when disabled or dropped. */
class AggRewriteSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  test("agg rewrite: state scan replaces fact scan, rollup, guards") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_aggrw_base").toString
    val statePath = java.nio.file.Files
      .createTempDirectory("graft_aggrw_state").toString
    Seq((1L, "a", "x", 10L), (2L, "a", "y", 20L), (3L, "b", "x", 30L),
      (4L, "b", "y", 5L), (5L, "c", "x", 7L), (6L, "a", "x", 2L))
      .toDF("k", "g", "s", "x")
      .write.mode("overwrite").parquet(base)
    val fact = spark.read.parquet(base)
    Materialize.aggregate(fact, Seq("g", "s"), Seq("x"))
      .write.mode("overwrite").parquet(statePath)
    GraftAggViews.register(base,
      GraftAggViews.AggViewDef(statePath, Seq("g", "s"), Seq("x")))
    def q(cols: String*) = spark.read.parquet(base)
      .groupBy(cols.map(col): _*)
      .agg(sum($"x").as("sx"), min($"x").as("mn"), max($"x").as("mx"),
        count(lit(1)).as("n"))
      .orderBy(cols.map(col): _*)
    def baseline(df: => org.apache.spark.sql.DataFrame) = {
      spark.conf.set(GraftAggViews.DisabledConf, "true")
      try df.collect().map(_.toSeq).toSeq
      finally spark.conf.unset(GraftAggViews.DisabledConf)
    }
    try {
      // exact grain: the optimized plan must scan the state, not the fact
      val exact = q("g", "s")
      val plan = exact.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(statePath).getName),
        s"state not scanned:\n$plan")
      assert(!plan.contains(new java.io.File(base).getName),
        "fact table must not be scanned when the view answers the query")
      assert(exact.collect().map(_.toSeq).toSeq == baseline(q("g", "s")))
      // types preserved: sum over a LongType column stays LongType
      assert(exact.schema("sx").dataType ==
        org.apache.spark.sql.types.LongType)
      // rollup to a coarser grain re-aggregates the state
      val roll = q("g")
      assert(roll.queryExecution.executedPlan.toString
        .contains(new java.io.File(statePath).getName))
      assert(roll.collect().map(_.toSeq).toSeq == baseline(q("g")))
      // group-column filter: rewritten, the predicate re-applies on the
      // state ("the sum for source X" — the most common MV hit)
      val filtered = spark.read.parquet(base).where($"g" === "a")
        .groupBy($"s").agg(sum($"x").as("sx")).orderBy($"s")
      assert(filtered.queryExecution.executedPlan.toString
        .contains(new java.io.File(statePath).getName))
      assert(filtered.collect().map(_.toSeq).toSeq == baseline {
        spark.read.parquet(base).where($"g" === "a")
          .groupBy($"s").agg(sum($"x").as("sx")).orderBy($"s")
      })
      // a MEASURE filter selects individual fact rows — not answerable
      val mfilter = spark.read.parquet(base).where($"x" > 5L)
        .groupBy($"g").agg(sum($"x").as("sx"))
      assert(mfilter.queryExecution.executedPlan.toString
        .contains(new java.io.File(base).getName))
      // an aggregate the state can't answer exactly is NOT rewritten
      val avgQ = spark.read.parquet(base).groupBy($"g")
        .agg(avg($"x").as("ax"))
      assert(avgQ.queryExecution.executedPlan.toString
        .contains(new java.io.File(base).getName),
        "avg is not decomposable over this state — must hit the fact")
      // count(column) counts non-nulls — also not answerable
      val cntCol = spark.read.parquet(base).groupBy($"g")
        .agg(count($"x").as("n"))
      assert(cntCol.queryExecution.executedPlan.toString
        .contains(new java.io.File(base).getName))
      // a group filter that eliminates every state row: count stays 0
      // (a bare Sum(cnt) over zero rows would return NULL)
      val zero = spark.read.parquet(base).where($"g" === "zzz")
        .agg(count(lit(1)).as("n"))
      assert(zero.queryExecution.executedPlan.toString
        .contains(new java.io.File(statePath).getName))
      assert(zero.collect().head.getLong(0) == 0L)
      // count(NULL literal) is always 0 — must refuse, not count rows
      val cn = spark.read.parquet(base).groupBy($"g")
        .agg(count(lit(null)).as("n"))
      assert(cn.queryExecution.executedPlan.toString
        .contains(new java.io.File(base).getName))
      // a stale/mismatched registration (state lacking the expected
      // columns) refuses the rewrite instead of crashing planning
      val base2 = java.nio.file.Files
        .createTempDirectory("graft_aggrw_base2").toString
      Seq((1L, "a", 10L)).toDF("k", "g", "x")
        .write.mode("overwrite").parquet(base2)
      GraftAggViews.register(base2,
        GraftAggViews.AggViewDef(base2, Seq("g"), Seq("x"))) // not a state!
      try {
        val q2 = spark.read.parquet(base2).groupBy($"g")
          .agg(sum($"x").as("sx"))
        assert(q2.queryExecution.executedPlan.toString
          .contains(new java.io.File(base2).getName))
        assert(q2.collect().head.getLong(1) == 10L)
      } finally GraftAggViews.drop(base2)
      // disable conf restores the fact scan
      spark.conf.set(GraftAggViews.DisabledConf, "true")
      try assert(q("g", "s").queryExecution.executedPlan.toString
        .contains(new java.io.File(base).getName))
      finally spark.conf.unset(GraftAggViews.DisabledConf)
    } finally GraftAggViews.drop(base)
    // dropped: back to the fact
    assert(q("g", "s").queryExecution.executedPlan.toString
      .contains(new java.io.File(base).getName))
  }
}
