package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table shape (surplus vs
  * the reference — Phoenix has no continuous-query engine, SURVEY.md §2.9;
  * its CDC polling maps to GraftCatalog.cdcStream).
  *
  * Standard patterns: watermarked tumbling-window aggregation and
  * stateful sessionization — both shuffle on (window, key)/(key) and run
  * with bounded state, so they hold on a real cluster.
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling-window counts/sums per event type with late-data handling. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup for ingest pipelines: one surviving row per
    * content fingerprint, with bounded state — the watermark lets Spark
    * drop fingerprint state older than the lateness horizon, so this
    * holds on an unbounded stream (the batch analog is
    * [[graft.operators.Dedup.exactDedup]]). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.toArray)

  /** Per-user running behavior via flatMapGroupsWithState-free windowed
    * dedup: last event per user per window (bounded state via watermark). */
  def lastEventPerUserWindow(events: DataFrame,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("user_id"))
      .agg(max_by(col("event_type"), col("ts")).as("last_type"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("user_id"),
        col("last_type"), col("n_events"))
}
