package graft.streaming

import graft.SparkSpec
import graft.sources.SnapshotStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// Top-level for encoder derivation without an outer-scope instance.
case class EwmaEvent(g: String, ts: java.sql.Timestamp)

class StreamEwmaSpec extends SparkSpec {

  private def ev(g: String, day: Int, n: Int): Seq[EwmaEvent] =
    Seq.fill(n)(EwmaEvent(g,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")))

  test("streamed verdicts equal the batch chart over the full history; replay is a no-op") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val target = s"/tmp/graft_streamewma_${System.nanoTime()}"
    val mem = MemoryStream[EwmaEvent]
    val q = StreamEwma.countStream(mem.toDF(), target, "g", "ts",
      s"$target-ckpt")
    try {
      // 12 steady days split across batches, day 7 STRADDLING batch 1/2
      // (morning events then evening events), then a spiked day 13
      mem.addData((1 to 6).flatMap(d => ev("g", d, if (d % 2 == 0) 11 else 9))
        ++ ev("g", 7, 4): _*)
      q.processAllAvailable()
      mem.addData(ev("g", 7, 5) ++ (8 to 12).flatMap(d =>
        ev("g", d, if (d % 2 == 0) 11 else 9)): _*)
      q.processAllAvailable()
      mem.addData(ev("g", 13, 1000): _*)
      q.processAllAvailable()

      val state = SnapshotStore.read(spark, target)
      // straddled day 7 accumulated exactly: 4 + 5 = 9
      val d7 = state.filter($"t" === java.sql.Date.valueOf("2024-01-07"))
        .select("x").as[Long].head()
      assert(d7 == 9L)
      val got = StreamEwma.verdicts(state)
        .orderBy("t").select("t", "x", "ewma", "anomaly")
        .as[(java.sql.Date, Long, Double, Boolean)].collect().toSeq

      // batch twin over the identical full history
      val all = ((1 to 6).flatMap(d => ev("g", d, if (d % 2 == 0) 11 else 9))
        ++ ev("g", 7, 9)
        ++ (8 to 12).flatMap(d => ev("g", d, if (d % 2 == 0) 11 else 9))
        ++ ev("g", 13, 1000)).toDF()
      val counts = all.groupBy($"g",
          org.apache.spark.sql.functions.to_date($"ts").as("t"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("x"))
      val exp = graft.ops.TimeSeries.ewmaAnomalies(counts, "g", "t", "x")
        .orderBy("t").select("t", "x", "ewma", "anomaly")
        .as[(java.sql.Date, Long, Double, Boolean)].collect().toSeq
      assert(got == exp, s"stream verdicts diverged:\n$got\n$exp")
      // the spike day flags, nothing else does
      assert(got.count(_._4) == 1 && got.last._4, got.mkString(","))

      // crash-replay: re-committing the last batchId is refused, state
      // byte-identical (the SnapshotStore ledger pattern)
      val vBefore = SnapshotStore.committedVersion(spark, target)
      // restart the stream from the same checkpoint: no new commits for
      // already-processed data
      q.stop()
      val q2 = StreamEwma.countStream(mem.toDF(), target, "g", "ts",
        s"$target-ckpt")
      q2.processAllAvailable()
      q2.stop()
      assert(SnapshotStore.committedVersion(spark, target) == vBefore)
    } finally {
      if (q.isActive) q.stop()
    }
  }
}
