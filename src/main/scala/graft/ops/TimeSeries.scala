package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table: tumbling-window
  * aggregation and gap-based sessionization. The reference is batch-only
  * (SURVEY §1), so these are the extension surface that also composes with
  * Structured Streaming (graft.streaming.EventStream runs the same
  * windowed-count logic under readStream + watermark).
  *
  * Scale: both operators shuffle once on their natural key (window/user);
  * sessionization's window functions run inside the per-user partition, so
  * skew only arises from a single pathological user — AQE skew-join
  * handling plus the (user, day) sub-split fallback covers that.
  */
object TimeSeries {

  /** Tumbling-window counts/sums per event_type: the batch twin of the
    * streaming windowed aggregation. */
  def windowAgg(events: DataFrame, every: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. session_seq is the
    * per-user session ordinal (cumulative sum over the new-session flag). */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev_ts")) > gapMinutes * 60L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new_session")).over(byUser))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
}
