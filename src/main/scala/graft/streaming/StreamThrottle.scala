package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

// Top-level case classes so Spark derives Encoders without an outer scope.
case class ThrottleEvent(event_id: Long, user_id: Long, event_type: String,
                         ts: java.sql.Timestamp, tsMicros: Long)
case class ThrottleState(lastSeenMicros: Long)
case class ThrottleKept(event_id: Long, user_id: Long, event_type: String,
                        tsMicros: Long)

/** Streaming twin of [[graft.ops.TimeSeries.throttleDedup]]: emit only
  * the FIRST event of each gap-delimited burst per (user, type) key,
  * statefully across micro-batches.
  *
  * The batch recurrence ("an event opens a burst iff it is more than
  * `gapSeconds` after its predecessor") needs exactly ONE long of state
  * per live key — the last seen event time — updated on every event and
  * consulted on every event. `flatMapGroupsWithState` with an
  * event-time timeout keeps that state bounded: once the watermark
  * passes lastSeen + gap, ANY later event would open a new burst no
  * matter what the state said, so eviction at that horizon is LOSSLESS
  * — unlike [[StreamDedup]]'s documented re-emit trade, the throttled
  * stream is bit-identical to the batch operator on the same (in-order)
  * data, evictions included. Late events arriving before the timeout
  * are ordered within their batch on (ts, event_id), the batch
  * operator's tie order.
  */
object StreamThrottle {

  def throttleStream(events: DataFrame, gapSeconds: Long,
                     watermark: String = "2 hours")
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(gapSeconds > 0, "gapSeconds must be positive")
    val gapMicros = gapSeconds * 1000000L
    events
      .withWatermark("ts", watermark)
      // the watermarked `ts` attribute must reach the stateful operator
      // itself — Spark rejects an event-time timeout whose watermark
      // column was projected away before flatMapGroupsWithState
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type"), col("ts"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"))
      .as[ThrottleEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Long, String), batch: Iterator[ThrottleEvent],
         state: GroupState[ThrottleState]) => {
          if (state.hasTimedOut) {
            // watermark passed lastSeen + gap: any future event starts a
            // new burst regardless — lossless eviction
            state.remove()
            Iterator.empty
          } else {
            var last = state.getOption.map(_.lastSeenMicros)
            val kept = batch.toSeq.sortBy(e => (e.tsMicros, e.event_id))
              .flatMap { e =>
                val opens = last.forall(l => e.tsMicros - l > gapMicros)
                last = Some(e.tsMicros)
                if (opens) Some(ThrottleKept(e.event_id, key._1, key._2, e.tsMicros))
                else None
              }
            last.foreach { l =>
              state.update(ThrottleState(l))
              // timeout must sit beyond the current watermark; the
              // micros->millis conversion rounds UP so eviction can
              // never fire before the true lossless horizon lastSeen+gap
              state.setTimeoutTimestamp(math.max(
                (l + 999L) / 1000L + gapSeconds * 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            kept.iterator
          }
        })
      .toDF()
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("tsMicros")).as("ts"))
  }
}
