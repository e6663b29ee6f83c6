package graft.streaming

import graft.SparkSpec
import graft.ops.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// Top-level so Spark can build an Encoder without an outer-scope instance.
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class EventStreamSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val data = Seq(
    Ev(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
    Ev(2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0),
    Ev(3L, ts("2024-01-01 11:00:00"), 7L, "view", 3.0),
    Ev(4L, ts("2024-01-01 10:05:00"), 8L, "click", 4.0))

  test("windowedCounts over a stream matches the batch windowAgg") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    mem.addData(data: _*)
    // Complete mode for a finite test stream: every window is emitted.
    val q = EventStream.windowedCounts(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamRows = spark.table("win_counts")
      .select(date_format($"window_start", "HH:mm"), $"event_type", $"n_events", $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    val batchRows = TimeSeries.windowAgg(data.toDF(), "1 hour")
      .select(date_format($"window_start", "HH:mm"), $"event_type", $"n_events", $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    assert(streamRows == batchRows)
    assert(streamRows.contains(("10:00", "click", 3L, 7.0)))
  }

  test("windowedCounts runs against a real parquet file stream source") {
    import spark.implicits._
    // Stream from a directory of parquet files (the production shape),
    // using the driver-provided events table as the payload.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
    batch.limit(200).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .parquet(dir)
    val q = EventStream.windowedCounts(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("file_win").agg(sum($"n_events")).as[Long].head()
    assert(total == 200L)
  }

  test("sessionizeStream assigns gap-based sessions statefully across batches") {
    implicit val sq = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = EventStream.sessionizeStream(mem.toDF(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      mem.addData(data.take(2): _*) // user 7: two events 10m apart
      q.processAllAvailable()
      mem.addData(data(2))          // user 7: 50m later -> new session
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 2L)
  }
}
