package graft.streaming

import graft.SparkSpec
import graft.ops.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// Top-level for encoder derivation.
case class ThEv(event_id: Long, user_id: Long, event_type: String, ts: Timestamp)

class StreamThrottleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val data = Seq(
    // user 7 click: chain 2 min apart — one burst, then a fresh burst
    ThEv(1L, 7L, "click", ts("2024-01-01 10:00:00")),
    ThEv(2L, 7L, "click", ts("2024-01-01 10:02:00")),
    ThEv(3L, 7L, "click", ts("2024-01-01 10:04:00")),
    ThEv(4L, 7L, "click", ts("2024-01-01 10:20:00")),
    // independent key
    ThEv(5L, 7L, "view", ts("2024-01-01 10:01:00")),
    // exact-boundary case on another user
    ThEv(6L, 8L, "click", ts("2024-01-01 10:00:00")),
    ThEv(7L, 8L, "click", ts("2024-01-01 10:05:00")))

  test("throttleStream matches batch throttleDedup across micro-batches") {
    implicit val sq = spark.sqlContext
    implicit val ss = spark
    val mem = MemoryStream[ThEv]
    // split mid-burst: events 1-2 in batch one, the rest in batch two —
    // the state must carry the burst across the boundary
    mem.addData(data.take(2): _*)
    val q = StreamThrottle.throttleStream(mem.toDF(), gapSeconds = 300L)
      .writeStream.format("memory").queryName("throttle_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mem.addData(data.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("throttle_out")
      .select("event_id").as[Long].collect().toSet
    val batch = TimeSeries.throttleDedup(data.toDF(), Seq("user_id", "event_type"),
        "ts", 300L, "event_id")
      .select("event_id").as[Long].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(1L, 4L, 5L, 6L)) // 7 is on the 300 s boundary: same burst
  }
}
