package graft.streaming

import graft.ops.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** Structured-Streaming twins of the batch event-time operators. The
  * reference is batch-only (SURVEY §1/§2.10 — no stream surface), so this
  * is the extension layer: the SAME aggregation logic as
  * `TimeSeries.windowAgg` runs under readStream with a watermark, and
  * sessionization gets the stateful `flatMapGroupsWithState` treatment
  * that true unbounded streams need (the batch lag/cumsum formulation
  * assumes a finite partition).
  *
  * Scale: windowed counts are partial-aggregated per micro-batch and
  * state-store-backed per (window, event_type); watermark bounds state.
  * Session state is one small record per active user key.
  */
object EventStream {

  /** Watermarked tumbling-window counts — streaming twin of
    * TimeSeries.windowAgg; identical output schema, so downstream
    * consumers can swap batch/stream sources transparently. */
  def windowedCounts(events: DataFrame, every: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  final case class SessionState(lastTsMicros: Long, sessionSeq: Long)
  final case class SessionEvent(event_id: Long, user_id: Long, tsMicros: Long)
  final case class SessionAssignment(event_id: Long, user_id: Long, session_seq: Long)

  /** Stateful gap-based sessionization over a stream of events. Assumes
    * per-user event-time order within each batch (enforce upstream with a
    * watermark + sort, or accept micro-batch-order semantics). State is
    * (last timestamp, session ordinal) per user. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int)
                      (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
          val out = batch.toSeq.sortBy(e => (e.tsMicros, e.event_id)).map { e =>
            val newSession = st.lastTsMicros == Long.MinValue ||
              e.tsMicros - st.lastTsMicros > gapMicros
            st = SessionState(e.tsMicros, if (newSession) st.sessionSeq + 1 else st.sessionSeq)
            SessionAssignment(e.event_id, userId, st.sessionSeq)
          }
          state.update(st)
          out.iterator
        })
      .toDF()
  }

  /** Convenience writer: append stream to an in-memory table for tests /
    * interactive inspection. */
  def toMemorySink(df: DataFrame, queryName: String): DataStreamWriter[Row] =
    df.writeStream.format("memory").queryName(queryName).outputMode("append")
}
