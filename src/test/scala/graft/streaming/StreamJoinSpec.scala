package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// Top-level so Spark can build Encoders without an outer-scope instance.
case class Imp(imp_id: Long, key: Long, imp_ts: Timestamp)
case class Clk(clk_id: Long, key: Long, clk_ts: Timestamp)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val imps = Seq(
    Imp(1L, 7L, ts("2024-01-01 10:00:00")),
    Imp(2L, 7L, ts("2024-01-01 10:20:00")),
    Imp(3L, 8L, ts("2024-01-01 10:00:00")),
    Imp(4L, 9L, ts("2024-01-01 10:00:00")))
  private val clks = Seq(
    Clk(10L, 7L, ts("2024-01-01 10:05:00")),  // joins imp 1 (within 10m)
    Clk(11L, 7L, ts("2024-01-01 10:25:00")),  // joins imp 2 only (imp 1 is 25m old)
    Clk(12L, 8L, ts("2024-01-01 10:30:00")),  // 30m after imp 3 -> no match
    Clk(13L, 9L, ts("2024-01-01 09:55:00")))  // click BEFORE impression -> no match

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("imp_id", "clk_id").as[(Long, Long)].collect().toSet

  test("stream-stream interval join equals the batch join, across micro-batch splits") {
    implicit val sq = spark.sqlContext
    val expected = pairs(StreamJoin.intervalJoin(
      imps.toDF(), clks.toDF(), "key", "imp_ts", "clk_ts",
      withinSeconds = 600))
    assert(expected == Set((1L, 10L), (2L, 11L)), expected.toString)

    val mi = MemoryStream[Imp]
    val mc = MemoryStream[Clk]
    val joined = StreamJoin.intervalJoin(mi.toDF(), mc.toDF(), "key",
      "imp_ts", "clk_ts", withinSeconds = 600)
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // impressions and clicks arrive in DIFFERENT micro-batches, clicks
      // first — the join must buffer both sides across batches
      mc.addData(clks.take(2): _*)
      q.processAllAvailable()
      mi.addData(imps: _*)
      q.processAllAvailable()
      mc.addData(clks.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(pairs(spark.table("sj_out")) == expected)
  }

  test("the state-cleanup time bound is part of the join condition, not a filter") {
    implicit val sq = spark.sqlContext
    val mi = MemoryStream[Imp]
    val mc = MemoryStream[Clk]
    val joined = StreamJoin.intervalJoin(mi.toDF(), mc.toDF(), "key",
      "imp_ts", "clk_ts", withinSeconds = 600, watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("sj_state")
      .outputMode("append").start()
    try {
      mi.addData(imps: _*); mc.addData(clks: _*)
      q.processAllAvailable()
      // both sides watermarked: the stream join operator reports
      // per-side event-time watermarks, proving state CAN be evicted
      val prog = q.lastProgress
      assert(prog.eventTime.get("watermark") != null, prog.toString)
    } finally q.stop()
    assert(pairs(spark.table("sj_state")) == Set((1L, 10L), (2L, 11L)))
  }
}
