package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// Top-level so Spark can build an Encoder without an outer-scope instance.
case class Doc(doc_id: Long, ts: Timestamp, text: String)

class StreamDedupSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupStream drops content duplicates within and across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = StreamDedup.dedupStream(mem.toDF(), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // batch 1: in-batch duplicate (2 repeats 1)
      mem.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), "alpha doc"),
        Doc(2L, ts("2024-01-01 10:01:00"), "alpha doc"),
        Doc(3L, ts("2024-01-01 10:02:00"), "beta doc"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate within the watermark window
      mem.addData(Doc(4L, ts("2024-01-01 10:03:00"), "alpha doc"))
      q.processAllAvailable()

      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")
      val state = q.lastProgress.stateOperators(0).numRowsTotal
      assert(state == 2L, s"one state row per distinct content, got $state")
    } finally q.stop()
  }

  test("stateless text operators run unchanged on a stream (batch/stream transparency)") {
    implicit val sq = spark.sqlContext
    import graft.ops.TextAnalysis
    import spark.implicits._
    val mem = MemoryStream[Doc]
    // corpusFilter + maskPii are pure per-row predicates/projections, so
    // the SAME operator code runs under readStream with no changes —
    // the design property that makes the batch pipeline streamable.
    val cleaned = TextAnalysis.corpusFilter(
      mem.toDF(), minTokens = 3, maxTokens = 100,
      minMeanTokLen = 1.0, maxMeanTokLen = 20.0,
      maxPunctRatio = 0.5, minStopwordRatio = 0.0)
      .select($"doc_id", TextAnalysis.maskPii($"text").as("masked"))
    val q = cleaned.writeStream.format("memory").queryName("stream_clean")
      .outputMode("append").start()
    try {
      mem.addData(
        Doc(1L, ts("2024-01-01 10:00:00"), "mail me at a@b.co today"),
        Doc(2L, ts("2024-01-01 10:01:00"), "no"))  // fails minTokens
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_clean")
      .select("doc_id", "masked").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "mail me at <EMAIL> today"))
  }

  test("dedupStream evicts expired keys; post-eviction duplicates re-emit (documented trade)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Doc]
    val q = StreamDedup.dedupStream(mem.toDF(), "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append").start()
    try {
      mem.addData(Doc(1L, ts("2024-01-01 10:00:00"), "alpha doc"))
      q.processAllAvailable()
      // far-future doc advances the watermark well past alpha's expiry
      mem.addData(Doc(2L, ts("2024-01-01 12:00:00"), "beta doc"))
      q.processAllAvailable()
      mem.addData(Doc(3L, ts("2024-01-01 12:01:00"), "gamma doc"))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators(0).numRowsTotal
      assert(state <= 2L, s"alpha's expired state must be evicted, got $state rows")

      // alpha re-arrives long after eviction: emitted again (the
      // within-watermark contract, not a bug)
      mem.addData(Doc(4L, ts("2024-01-01 12:02:00"), "alpha doc"))
      q.processAllAvailable()
      val ids = spark.table("dedup_evict").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 3L, 4L), s"got $ids")
    } finally q.stop()
  }
}
