package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  /** Open-session accumulator held in the state store (one per user). */
  case class OpenSession(start: Long, end: Long, n: Long, sum: Double)

  /** A gap-closed session, emitted once. */
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Stateful gap sessionization via flatMapGroupsWithState: one open
    * session per user in the state store; an event within `gapMinutes` of
    * the open session extends it, a later event closes-and-emits it, and
    * the event-time timeout (watermark passing session end + gap) flushes
    * sessions no on-time event can extend — so state is bounded by the
    * active-user count, not the stream length. The batch analog is
    * `q_sessionize` (session_window); this is the custom-state form for
    * semantics session_window can't express (per-event merge logic,
    * value accumulation on the open session).
    *
    * Late events below the watermark are NOT pre-filtered for
    * flatMapGroupsWithState (unlike windowed aggs); ones that slip in
    * merge into whatever session is open — acceptable for pipeline
    * metrics, noted for exactness. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    events.select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, ts(s.start), ts(s.end), s.n, s.sum))
          } else {
            // a trigger's per-group rows are unordered; sort by event time
            // (bounded by the per-user-per-trigger volume)
            val evs = rows.map(r => (r._2.getTime, r._3)).toArray.sortBy(_._1)
            val closed = List.newBuilder[ClosedSession]
            var open = state.getOption
            for ((t, v) <- evs) open match {
              case Some(s) if t - s.end <= gapMs =>
                open = Some(OpenSession(s.start, math.max(s.end, t),
                  s.n + 1, s.sum + v))
              case Some(s) =>
                closed += ClosedSession(user, ts(s.start), ts(s.end), s.n, s.sum)
                open = Some(OpenSession(t, t, 1L, v))
              case None =>
                open = Some(OpenSession(t, t, 1L, v))
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

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
