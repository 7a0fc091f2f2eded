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
    * changed, in which case no new state is written). */
  def refresh(cat: GraftCatalog, table: String, path: String): Long = {
    val spark = cat.changeLog(table).sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val lastV = meta.getLong(0)
    val groupCols = meta.getSeq[String](1)
    val measures = meta.getSeq[String](2)
    val newV = highWater(cat, table)
    if (newV == lastV) return lastV
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

    def contrib(rows: DataFrame): DataFrame =
      rows.groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("d_cnt"),
          measures.flatMap(m => Seq(
            sum(col(m).cast(DoubleType)).as(s"d_sum_$m"),
            min(col(m).cast(DoubleType)).as(s"d_min_$m"),
            max(col(m).cast(DoubleType)).as(s"d_max_$m"))): _*)
    val posts = contrib(changes.where(!col("_deleted"))
      .select(fields.map(col): _*))
    val pres = contrib(changes.where(hasPrev)
        .select(fields.map(f => col(s"_prev.$f").as(f)): _*))
      .select((groupCols.map(col) :+ col("d_cnt").as("r_cnt")) ++
        measures.map(m => col(s"d_sum_$m").as(s"r_sum_$m")): _*)

    val joined = state
      .join(posts, groupCols, "full_outer")
      .join(pres, groupCols, "full_outer")
    def z(c: String) = coalesce(col(c), lit(0L))
    def zd(c: String) = coalesce(col(c), lit(0.0))
    val newCnt = (z("cnt") + z("d_cnt") - z("r_cnt")).as("cnt")
    // groups that lost a row: min/max (and to keep one code path,
    // cnt/sum too) recompute from the snapshot, restricted by semi-join
    val affected = joined.where(z("r_cnt") > 0)
      .select(groupCols.map(col): _*)
    val recomputed = aggregate(
      cat.snapshot(table).join(affected, groupCols, "left_semi"),
      groupCols, measures)
    val insertOnly = joined.where(z("r_cnt") === 0)
      .select((groupCols.map(col) :+ newCnt) ++ measures.flatMap(m => Seq(
        (zd(s"sum_$m") + zd(s"d_sum_$m")).as(s"sum_$m"),
        least(col(s"min_$m"), col(s"d_min_$m")).as(s"min_$m"),
        greatest(col(s"max_$m"), col(s"d_max_$m")).as(s"max_$m"))): _*)
      .where(col("cnt") > 0)
    insertOnly.unionByName(recomputed)
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
