package graft.streaming

import graft.SparkSpec
import graft.sources.SnapshotStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// Top-level for encoder derivation without an outer-scope instance.
case class HHEvent(k: String)

class StreamHeavyHittersSpec extends SparkSpec {

  test("streamed MG state: bounded size, under-estimates within N/(c+1), frequent keys kept") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val target = s"/tmp/graft_streamhh_${System.nanoTime()}"
    val cap = 8
    val mem = MemoryStream[HHEvent]
    val q = StreamHeavyHitters.heavyHitterStream(mem.toDF(), target, "k", cap,
      s"$target-ckpt")
    // zipf-ish batches over 30 keys, shifting shape per batch
    def batchData(seed: Int): Seq[HHEvent] =
      (1 to 30).flatMap(k => Seq.fill(600 / (k + seed))(HHEvent(s"key$k")))
    try {
      val all = scala.collection.mutable.ArrayBuffer[HHEvent]()
      for (s <- 0 to 2) {
        val b = batchData(s); all ++= b
        mem.addData(b: _*); q.processAllAvailable()
      }
      val state = SnapshotStore.read(spark, target)
        .select("key", "cnt").as[(String, Long)].collect().toMap
      val trueCounts = all.groupBy(_.k).view.mapValues(_.size.toLong).toMap
      val n = all.size.toLong
      val eps = n / (cap + 1)
      assert(state.nonEmpty && state.size <= cap, s"state size ${state.size}")
      // every stored count is a lower bound within the merged-MG error
      state.foreach { case (k, c) =>
        val t = trueCounts(k)
        assert(c <= t && t - c <= eps, s"$k stored $c true $t eps $eps")
      }
      // the pigeonhole survivors: every key above the error threshold
      val frequent = trueCounts.filter(_._2 > eps).keySet
      assert(frequent.nonEmpty, "test data must contain a frequent key")
      frequent.foreach(k => assert(state.contains(k), s"frequent $k missing"))
      // one committed version per batch
      assert(SnapshotStore.committedVersion(spark, target).contains(3L))
    } finally q.stop()
  }

  test("mgSummary passes small tables through and ties at the threshold die") {
    import spark.implicits._
    val small = Seq(("a", 5L), ("b", 3L)).toDF("key", "cnt")
    val keep = StreamHeavyHitters.mgSummary(small, 4)
      .as[(String, Long)].collect().toMap
    assert(keep == Map("a" -> 5L, "b" -> 3L), "below capacity: no decrement")
    // capacity 2 over 3 keys: t = 3rd largest (2); ties at t vanish
    val over = Seq(("a", 9L), ("b", 2L), ("c", 2L)).toDF("key", "cnt")
    val cut = StreamHeavyHitters.mgSummary(over, 2)
      .as[(String, Long)].collect().toMap
    assert(cut == Map("a" -> 7L), cut.toString)
  }
}
