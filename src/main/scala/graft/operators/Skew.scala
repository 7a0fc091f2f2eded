package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) covers joins; this
  * covers aggregation: a two-stage salted aggregate for groupBys where a
  * few keys dominate (the classic hot-tenant / hot-date problem at
  * 100 TB). Stage 1 aggregates (key, salt) partials across `saltBuckets`
  * shuffle partitions per key; stage 2 merges the partials per key — so
  * no single task ever sees a whole hot key.
  *
  * Works for any algebraic aggregate expressed as (partial, merge) pairs;
  * the common count/sum case is provided directly.
  */
object Skew {

  /** count + sums per key, salted. `sums` maps output name → column to
    * sum (pre-cast to an exact type by the caller if needed). */
  def saltedCountSum(df: DataFrame, keys: Seq[String],
      sums: Map[String, Column], saltBuckets: Int = 16): DataFrame = {
    // name hygiene: the internal salt/partial names and the output
    // count column must not collide with user names — a key named
    // '_cnt' was an ambiguous-reference error, a sums entry named 'n'
    // silently emitted two 'n' output columns
    val reserved = Set("_salt", "_cnt", "n") ++ sums.keys.map("_s_" + _)
    val clash = keys.filter(reserved.contains) ++
      sums.keys.filter(k => k == "n" || k == "_salt" || k == "_cnt")
    require(clash.isEmpty,
      s"saltedCountSum reserved-name collision: ${clash.mkString(", ")} " +
        "(rename the key/sum — '_salt', '_cnt', '_s_*' and the output " +
        "count column 'n' are reserved)")
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_cnt"),
        sums.map { case (n, c) => sum(c).as(s"_s_$n") }.toSeq: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("n"),
        sums.keys.map(n => sum(col(s"_s_$n")).as(n)).toSeq: _*)
  }
}
