package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import graft.sources.SnapshotStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// Top-level for encoder derivation without an outer-scope instance.
case class StatDoc(id: Long, tokens: Double)

class StreamStatsSpec extends SparkSpec {

  test("streamed sketch state equals the one-shot sketch of the full history, exactly") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val target = s"/tmp/graft_streamstats_${System.nanoTime()}"
    val k = 64
    val mem = MemoryStream[StatDoc]
    val q = StreamStats.sketchStream(mem.toDF(), target, "id", "tokens", k,
      s"$target-ckpt")
    try {
      mem.addData((1L to 300L).map(i => StatDoc(i, (i * 7 % 100).toDouble)): _*)
      q.processAllAvailable()
      mem.addData((301L to 600L).map(i => StatDoc(i, (i * 13 % 250).toDouble)): _*)
      q.processAllAvailable()
      mem.addData((601L to 900L).map(i => StatDoc(i, (i % 40).toDouble)): _*)
      q.processAllAvailable()

      // merge law at stream scale: the committed state must be
      // bit-identical to sketching all 900 rows in one pass
      val history = (1L to 900L).map { i =>
        val t = if (i <= 300) i * 7 % 100 else if (i <= 600) i * 13 % 250 else i % 40
        (i, t.toDouble)
      }.toDF("id", "tokens")
      val state = SnapshotStore.read(spark, target)
      val gotQ = state.filter($"kind" === "q").select("u", "v")
        .as[(Double, Double)].collect().sorted.toSeq
      val expQ = Sketches.quantileSketch(history, "id", "tokens", k)
        .as[(Double, Double)].collect().sorted.toSeq
      assert(gotQ == expQ, "quantile state diverged from one-shot sketch")
      val gotD = state.filter($"kind" === "d").select("u")
        .as[Double].collect().sorted.toSeq
      val expD = Sketches.kmvSketch(history, "id", k)
        .as[Double].collect().sorted.toSeq
      assert(gotD == expD, "distinct state diverged from one-shot sketch")

      // estimates read straight off the committed state
      val med = StreamStats.quantiles(state, Seq(0.5))
        .as[(Double, Double)].collect().head._2
      val exactMed = history.selectExpr("percentile(tokens, 0.5)").head().getDouble(0)
      assert(math.abs(med - exactMed) <= 25.0,
        s"median est $med vs exact $exactMed (k=$k rank error)")
      val dc = StreamStats.distinctCount(state, k)
        .as[Double].collect().head
      // 900 distinct ids; KMV k=64 -> ~12% rel error band (4/sqrt(k))
      assert(dc > 450 && dc < 1800, s"distinct est $dc for 900 true")

      // one committed version per batch, ledger stamped
      assert(SnapshotStore.committedVersion(spark, target).contains(3L))
      assert(SnapshotStore.commitMeta(spark, target, 2L).contains("batch=1"))
    } finally q.stop()
  }
}
