package graft.streaming

import graft.SparkSpec
import graft.ops.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// Top-level so Spark can build an Encoder without an outer-scope instance.
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)
case class Iv(iid: Long, i_user_id: Long, win_start: Timestamp, win_end: Timestamp)

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

  test("dpWindowedCounts noises each released window identically to the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import graft.ops.DifferentialPrivacy
    val mem = MemoryStream[Ev]
    mem.addData(data: _*)
    val q = EventStream.dpWindowedCounts(mem.toDF(), epsilon = 0.5, seed = 7L)
      .writeStream.format("memory").queryName("dp_win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamRows = spark.table("dp_win")
      .select(date_format($"window_start", "HH:mm"), $"event_type", $"dp_n_events")
      .as[(String, String, Double)].collect().toSet

    // Batch twin: same aggregate, same hash-keyed release — exact match.
    val batchRows = TimeSeries.windowAgg(data.toDF(), "1 hour")
      .select(date_format($"window_start", "HH:mm"), $"event_type",
        DifferentialPrivacy.noisyRelease(col("n_events"),
          Seq("window_start", "event_type"), 1.0, 0.5, 7L).as("dp_n_events"))
      .as[(String, String, Double)].collect().toSet
    assert(streamRows == batchRows)

    // Noise actually applied: no released count equals its true value,
    // and distinct groups get distinct draws (hash-keyed, not shared).
    val trueCounts = Map(("10:00", "click") -> 3L, ("11:00", "view") -> 1L)
    streamRows.foreach { case (w, t, noisy) =>
      assert(noisy != trueCounts((w, t)).toDouble, s"no noise on ($w,$t)")
    }
    val draws = streamRows.toSeq.map { case (w, t, noisy) => noisy - trueCounts((w, t)) }
    assert(draws.distinct.size == draws.size)
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

    // session_start_micros is the eviction-stable session key: same for
    // events 1-2 (one session), different for event 3.
    val starts = spark.table("sess")
      .select("event_id", "session_start_micros").as[(Long, Long)].collect().toMap
    assert(starts(1L) == starts(2L) && starts(1L) != starts(3L))
  }

  test("sessionizeStream evicts idle-user state once the watermark passes") {
    implicit val sq = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val mem = MemoryStream[Ev]
    // Tight watermark so advancing event time quickly closes old sessions.
    val q = EventStream.sessionizeStream(mem.toDF(), gapMinutes = 30,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("sess_evict")
      .outputMode("append").start()
    try {
      mem.addData(data.take(2): _*) // user 7 at 10:00/10:10
      q.processAllAvailable()
      val afterFirst = q.lastProgress.stateOperators(0).numRowsTotal
      assert(afterFirst == 1L, s"expected one state row for user 7, got $afterFirst")

      // User 8 far in the future: batch end advances the watermark to
      // 19:50, far past user 7's close instant (10:10 + 30m).
      mem.addData(Ev(10L, ts("2024-01-01 20:00:00"), 8L, "click", 1.0))
      q.processAllAvailable()
      // Timeouts fire in a batch AFTER the watermark advance is visible.
      mem.addData(Ev(11L, ts("2024-01-01 20:05:00"), 8L, "click", 1.0))
      q.processAllAvailable()

      val afterEvict = q.lastProgress.stateOperators(0).numRowsTotal
      assert(afterEvict == 1L,
        s"expected user 7's state evicted (1 row for user 8 left), got $afterEvict")
    } finally q.stop()

    // Output before eviction is untouched.
    val got = spark.table("sess_evict")
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L)
  }

  test("streamRangeJoin matches the batch rangeJoin on the same data") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val intervals = Seq(
      Iv(10L, 7L, ts("2024-01-01 09:30:00"), ts("2024-01-01 10:05:00")),
      Iv(11L, 7L, ts("2024-01-01 10:10:00"), ts("2024-01-01 10:10:00")),
      Iv(12L, 8L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
    val pMem = MemoryStream[Ev]
    val iMem = MemoryStream[Iv]
    val joined = EventStream.streamRangeJoin(
      pMem.toDF(), iMem.toDF(),
      pointKey = "user_id", intervalKey = "i_user_id",
      tsCol = "ts", startCol = "win_start", endCol = "win_end",
      maxIntervalSeconds = 3600L,
      pointWatermark = "10 minutes", intervalWatermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("srj")
      .outputMode("append").start()
    try {
      iMem.addData(intervals: _*)
      pMem.addData(data: _*)
      q.processAllAvailable()
      // join is stateful across micro-batches: a late point still meets
      // the buffered interval
      pMem.addData(Ev(6L, ts("2024-01-01 10:04:00"), 7L, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val streamPairs = spark.table("srj")
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    val batchPairs = TimeSeries.rangeJoin(
        data.toDF().union(Seq(Ev(6L, ts("2024-01-01 10:04:00"), 7L, "click", 1.0)).toDF()),
        intervals.toDF().withColumnRenamed("i_user_id", "user_id"),
        Seq("user_id"), "ts", "win_start", "win_end", bucketSeconds = 60L)
      .select("event_id", "iid").as[(Long, Long)].collect().toSet
    assert(streamPairs == batchPairs)
    assert(streamPairs.contains((1L, 10L)) && streamPairs.contains((6L, 10L)))
    assert(streamPairs.contains((2L, 11L)) && streamPairs.contains((4L, 12L)))
  }
}
