package graft.ops

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotMerge applies updates, tombstones, and inserts in one pass") {
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("id", "payload").withColumn("version", org.apache.spark.sql.functions.lit(1L))
    val changes = Seq(
      (2L, "two-v2", 2L, false), // update
      (3L, "ignored", 2L, true), // tombstone
      (9L, "nine", 2L, false)    // insert
    ).toDF("id", "payload", "version", "deleted")
    val got = Cdc.snapshotMerge(base, changes, Seq("id"), "version", "deleted")
      .select("id", "payload", "version").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "one", 1L), (2L, "two-v2", 2L), (9L, "nine", 2L)))
  }

  test("snapshotDiff labels added, removed, changed, same — null-safe") {
    val before = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (4L, None))
      .toDF("id", "payload")
    val after = Seq((2L, Some("b")), (3L, Some("c2")), (4L, Some("")), (9L, Some("new")))
      .toDF("id", "payload")
    val got = Cdc.snapshotDiff(before, after, Seq("id"), Seq("payload"))
      .select("id", "status").as[(Long, String)].collect().toMap
    // null payload (4) vs empty string must read as CHANGED, not same
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed",
      4L -> "changed", 9L -> "added"))
  }

  test("compact keeps the latest live row and lets a tombstone suppress history") {
    val log = Seq(
      (1L, "a1", 1L, false), (1L, "a3", 3L, false), (1L, "a2", 2L, false),
      (2L, "b1", 1L, false), (2L, "gone", 2L, true)
    ).toDF("id", "payload", "version", "deleted")
    val got = Cdc.compact(log, Seq("id"), "version", "deleted")
      .select("id", "payload").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a3")))
  }

  test("scdType2 builds validity intervals; tombstones close history silently") {
    val log = Seq(
      (1L, 1L, false), (1L, 3L, false), (1L, 7L, false),  // three live versions
      (2L, 2L, false), (2L, 5L, true),                    // deleted at v5
      (3L, 4L, false)                                     // single current version
    ).toDF("id", "version", "deleted")
    val got = Cdc.scdType2(log, Seq("id"), "version", "deleted")
      .select("id", "version", "valid_from", "valid_to")
      .as[(Long, Long, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 1L, 1L, Some(3L)), (1L, 3L, 3L, Some(7L)), (1L, 7L, 7L, None),
      (2L, 2L, 2L, Some(5L)),   // closed by the tombstone, which emits no row
      (3L, 4L, 4L, None)))
  }
}
