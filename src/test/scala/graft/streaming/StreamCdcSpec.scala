package graft.streaming

import graft.SparkSpec
import graft.sources.SnapshotStore
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

// Top-level for encoder derivation without an outer-scope instance.
case class Change(id: Long, payload: String, version: Long, deleted: Boolean)

class StreamCdcSpec extends SparkSpec {

  test("upsertStream maintains a latest-wins snapshot across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val target = s"/tmp/graft_streamcdc_${System.nanoTime()}"
    val ckpt = s"$target-ckpt"
    val mem = MemoryStream[Change]
    val q = StreamCdc.upsertStream(mem.toDF(), target,
      Seq("id"), "version", "deleted", ckpt)
    try {
      // batch 1: initial inserts
      mem.addData(
        Change(1L, "one", 1L, deleted = false),
        Change(2L, "two", 1L, deleted = false),
        Change(3L, "three", 1L, deleted = false))
      q.processAllAvailable()
      val snap1 = SnapshotStore.read(spark, target)
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(snap1 == Map(1L -> "one", 2L -> "two", 3L -> "three"))

      // batch 2: update 2, tombstone 3, insert 4; out-of-order versions
      // WITHIN the batch (v3 then v2 for the same key -> v3 wins)
      mem.addData(
        Change(2L, "two-v3", 3L, deleted = false),
        Change(2L, "two-v2", 2L, deleted = false),
        Change(3L, "ignored", 2L, deleted = true),
        Change(4L, "four", 2L, deleted = false))
      q.processAllAvailable()
      val snap2 = SnapshotStore.read(spark, target)
        .select("id", "payload", "version").as[(Long, String, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(snap2 == Map(
        1L -> ("one", 1L), 2L -> ("two-v3", 3L), 4L -> ("four", 2L)))

      // batch 3: stale update for a live key is ignored (lower version)
      mem.addData(Change(2L, "stale", 1L, deleted = false))
      q.processAllAvailable()
      val snap3 = SnapshotStore.read(spark, target)
        .select("id", "payload").as[(Long, String)].collect().toMap
      assert(snap3(2L) == "two-v3")

      // one committed version per batch; the first snapshot is still
      // time-travelable and the batch ledger is stamped
      assert(SnapshotStore.committedVersion(spark, target).contains(3L))
      assert(SnapshotStore.readVersion(spark, target, 1L).count() == 3L)
      assert(SnapshotStore.commitMeta(spark, target, 1L).contains("batch=0"))
      assert(SnapshotStore.commitMeta(spark, target, 3L).contains("batch=2"))
    } finally q.stop()
  }

  test("a replayed batch is skipped: the snapshot advances one version per distinct batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val target = s"/tmp/graft_streamcdc_${System.nanoTime()}"
    val mem = MemoryStream[Change]
    // first delivery of batch 0, committed normally
    val q1 = StreamCdc.upsertStream(mem.toDF(), target,
      Seq("id"), "version", "deleted", s"$target-ckpt1")
    try {
      mem.addData(Change(1L, "one", 1L, deleted = false))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(SnapshotStore.committedVersion(spark, target).contains(1L))
    // a FRESH checkpoint replays the same data as batch 0 again — the
    // ledger marker ("batch=0") detects it and the merge is skipped:
    // still exactly one committed version, same content
    val mem2 = MemoryStream[Change]
    val q2 = StreamCdc.upsertStream(mem2.toDF(), target,
      Seq("id"), "version", "deleted", s"$target-ckpt2")
    try {
      mem2.addData(Change(1L, "one", 1L, deleted = false))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(SnapshotStore.committedVersion(spark, target).contains(1L))
    assert(SnapshotStore.read(spark, target)
      .select("id", "payload").as[(Long, String)].collect().toSeq ==
      Seq((1L, "one")))
  }
}
