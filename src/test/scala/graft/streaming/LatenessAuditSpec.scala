package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Watermark-lateness audit: for each streaming operator family, feed a
  * watermark-advancing batch then a LATE row, and assert the drop is
  * visible through LatenessAudit — pull (recentProgress) and push
  * (listener) modes. The point is that silent data loss under watermark
  * pressure is OBSERVABLE, not that it doesn't happen. */
class LatenessAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Run a streaming query over two micro-batches: `onTime` (which pulls
    * the watermark forward) then `late`, returning the audited drop
    * count. Each batch is fully processed (and the watermark committed)
    * before the next is added. */
  private def runWithLateBatch(mem: MemoryStream[Ev], out: DataFrame,
                               name: String, mode: String,
                               onTime: Seq[Ev], late: Seq[Ev]): (Long, Long) = {
    val listener = new LatenessAudit.LatenessListener
    spark.streams.addListener(listener)
    val q: StreamingQuery = out.writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      mem.addData(onTime: _*)
      q.processAllAvailable()
      // watermark advances on the NEXT batch boundary; an empty pass
      // commits it before the late rows arrive
      q.processAllAvailable()
      mem.addData(late: _*)
      q.processAllAvailable()
      val pull = LatenessAudit.droppedByWatermark(q)
      // listener events are async on the bus — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var push = listener.dropped(q.id)
      while (push < pull && System.nanoTime() < deadline) {
        Thread.sleep(100); push = listener.dropped(q.id)
      }
      (pull, push)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }

  // Watermark 2h; on-time data reaches 14:00 so the committed watermark
  // (12:00) is far past the late row at 10:00.
  private val onTime = Seq(
    Ev(1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
    Ev(2L, ts("2024-01-01 14:00:00"), 7L, "click", 2.0))
  private val late = Seq(Ev(3L, ts("2024-01-01 10:00:00"), 7L, "click", 9.0))

  test("windowed aggregation: late row drop is observable (pull + push)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val (pull, push) = runWithLateBatch(mem,
      EventStream.windowedCounts(mem.toDF(), "1 hour", "2 hours"),
      "late_winagg", "append", onTime, late)
    assert(pull == 1L, s"expected the late row counted, got $pull")
    assert(push == 1L, s"listener saw $push")
  }

  test("dropDuplicatesWithinWatermark: late row drop is observable") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    // text = event_type + value so the late row is NOT a content dup —
    // only the watermark can drop it
    import org.apache.spark.sql.functions._
    val docs = mem.toDF().withColumn("text",
      concat_ws("-", col("event_type"), col("value")))
    val (pull, push) = runWithLateBatch(mem,
      StreamDedup.dedupStream(docs, "text", "ts", "2 hours"),
      "late_dedup", "append", onTime, late)
    assert(pull >= 1L, s"expected the late row counted, got $pull")
    assert(push == pull)
  }

  test("flatMapGroupsWithState (sessionize): lateness metric is exposed") {
    implicit val sq = spark.sqlContext
    implicit val s = spark
    val mem = MemoryStream[Ev]
    val (pull, push) = runWithLateBatch(mem,
      EventStream.sessionizeStream(mem.toDF(), gapMinutes = 30,
        watermark = "2 hours"),
      "late_session", "append", onTime, late)
    // FMGWS semantics: Spark hands late rows to user code rather than
    // filtering (state may still accept them); the audit contract here is
    // that the metric channel EXISTS and is consistent across pull/push.
    assert(pull >= 0L)
    assert(push <= pull)
  }

  test("flatMapGroupsWithState (throttle): lateness metric is exposed") {
    implicit val sq = spark.sqlContext
    implicit val s = spark
    val mem = MemoryStream[Ev]
    val (pull, push) = runWithLateBatch(mem,
      StreamThrottle.throttleStream(mem.toDF(), gapSeconds = 60,
        watermark = "2 hours"),
      "late_throttle", "append", onTime, late)
    assert(pull >= 0L)
    assert(push <= pull)
  }

  test("on-time-only input reports zero drops") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val (pull, push) = runWithLateBatch(mem,
      EventStream.windowedCounts(mem.toDF(), "1 hour", "2 hours"),
      "late_none", "append", onTime,
      Seq(Ev(4L, ts("2024-01-01 14:30:00"), 7L, "click", 1.0)))
    assert(pull == 0L && push == 0L, s"pull=$pull push=$push")
  }
}
