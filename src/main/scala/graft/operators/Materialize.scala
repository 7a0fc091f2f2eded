package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.GraftCatalog

/** Incremental materialized-aggregate maintenance (IVM) over the
  * catalog's change log.
  *
  * A grouped aggregate (cnt / sum / min / max per measure, avg derived)
  * is persisted once, then kept current by folding in only the writes
  * SINCE the last refresh — the standard incremental-view-maintenance
  * split (Griffin & Libkin, SIGMOD 1995):
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

  /** Full build: aggregate the current snapshot, persist it, record the
    * change-log high-water mark the state covers. */
  def build(cat: GraftCatalog, table: String, groupCols: Seq[String],
      measures: Seq[String], path: String): Long = {
    val spark = cat.changeLog(table).sparkSession
    import spark.implicits._
    val v = highWater(cat, table)
    aggregate(cat.snapshot(table), groupCols, measures)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/state_v$v")
    Seq((v, groupCols, measures)).toDF("last_version", "group_cols",
        "measures")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    v
  }

  /** The maintained aggregate as a DataFrame (current persisted state). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").head()
    spark.read.parquet(s"$path/state_v${m.getLong(0)}")
  }

  /** Fold writes since the last refresh into the persisted state.
    * Returns the new high-water version (== old one when nothing
    * changed, in which case no new state is written).
    *
    * Incremental folding requires the change log to still CONTAIN the
    * history the state summarizes: after [[GraftCatalog.compact]]
    * (history discarded, rows rewritten under one new version) the
    * delta-since-lastV would re-count every surviving row, and on a
    * TTL table rows expire out of the log between refreshes so
    * pre-images (retractions) silently vanish. Both cases are detected
    * — log min version past the high-water mark, or a finite TTL — and
    * fall back to a full rebuild at the new mark, which is always
    * correct. */
  def refresh(cat: GraftCatalog, table: String, path: String): Long = {
    val spark = cat.changeLog(table).sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val lastV = meta.getLong(0)
    val groupCols = meta.getSeq[String](1)
    val measures = meta.getSeq[String](2)
    val newV = highWater(cat, table)
    if (newV == lastV) return lastV
    val ttlActive = cat.spec(table).props.exists { case (k, v) =>
      k.equalsIgnoreCase("TTL") && v.matches("\\d+") }
    val minV = cat.changeLog(table)
      .agg(coalesce(min(col("_version")), lit(Long.MaxValue)))
      .head.getLong(0)
    if (ttlActive || minV > lastV)
      return build(cat, table, groupCols, measures, path)
    val state = spark.read.parquet(s"$path/state_v$lastV")

    val s = cat.spec(table)
    val fields = s.schema.fieldNames.toSeq
    val nonPk = fields.filterNot(s.pk.contains)
    val ord = struct(col("_version") +: nonPk.map(col): _*)
    val w = Window.partitionBy(s.pk.map(col): _*).orderBy(ord.asc)
    val rowS = struct(fields.map(col) :+ col("_deleted").as("__del"): _*)
    // pre/post TYPED images, same lag-over-PK shape as cdcImages — the
    // lag must see pre-window history, so the version filter comes after
    val changes = cat.changeLog(table)
      .withColumn("_prev", lag(rowS, 1).over(w))
      .where(col("_version") > lastV)
    val hasPrev = col("_prev").isNotNull && !col("_prev").getField("__del")

    // union-merge instead of joins: groupBy treats NULL group values as
    // an ordinary group, so NULL keys merge correctly (a join-based
    // merge would never match them); `retr` marks groups that lost a
    // row — their min/max (not invertible) recompute below, so their
    // sum/min/max contributions here are irrelevant
    val stateRows = state
      .withColumn("retr", lit(0))
    val postRows = changes.where(!col("_deleted"))
      .select(fields.map(col): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        measures.flatMap(m => Seq(
          sum(col(m).cast(DoubleType)).as(s"sum_$m"),
          min(col(m).cast(DoubleType)).as(s"min_$m"),
          max(col(m).cast(DoubleType)).as(s"max_$m"))): _*)
      .withColumn("retr", lit(0))
    val preRows = changes.where(hasPrev)
      .select(fields.map(f => col(s"_prev.$f").as(f)): _*)
      .groupBy(groupCols.map(col): _*)
      .agg((-count(lit(1))).as("cnt"),
        measures.flatMap(m => Seq(
          lit(0.0).as(s"sum_$m"),
          lit(null).cast(DoubleType).as(s"min_$m"),
          lit(null).cast(DoubleType).as(s"max_$m"))): _*)
      .withColumn("retr", lit(1))
    val merged = stateRows.unionByName(postRows).unionByName(preRows)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        measures.flatMap(m => Seq(
          sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m"))) :+
          max(col("retr")).as("retr"): _*)
    val affected = merged.where(col("retr") > 0)
      .select(groupCols.map(c => col(c).as(s"__a_$c")): _*)
    val affCond = groupCols.map(c => col(c) <=> col(s"__a_$c"))
      .reduce(_ && _) // null-safe: NULL groups recompute too
    val recomputed = aggregate(
      cat.snapshot(table).join(affected, affCond, "left_semi"),
      groupCols, measures)
    merged.where(col("retr") === 0 && col("cnt") > 0).drop("retr")
      .unionByName(recomputed)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/state_v$newV")
    import spark.implicits._
    Seq((newV, groupCols, measures)).toDF("last_version", "group_cols",
        "measures")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
    newV
  }

  /** The grouped aggregate both the full build and the affected-group
    * recompute use: (groupCols, cnt, sum_m, min_m, max_m per measure). */
  def aggregate(df: DataFrame, groupCols: Seq[String],
      measures: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        measures.flatMap(m => Seq(
          sum(col(m).cast(DoubleType)).as(s"sum_$m"),
          min(col(m).cast(DoubleType)).as(s"min_$m"),
          max(col(m).cast(DoubleType)).as(s"max_$m"))): _*)

  private def highWater(cat: GraftCatalog, table: String): Long =
    cat.changeLog(table).agg(coalesce(max(col("_version")), lit(-1L)))
      .head.getLong(0)
}
