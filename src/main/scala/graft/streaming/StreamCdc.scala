package graft.streaming

import graft.ops.Cdc
import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of [[graft.ops.Cdc]]: continuously maintain a
  * latest-wins snapshot from a CDC changelog stream (upserts +
  * tombstones) with `foreachBatch` — the idiomatic Structured Streaming
  * pattern for MERGE-INTO maintenance on parquet.
  *
  * Each micro-batch: resolve the last committed snapshot version
  * ([[graft.sources.SnapshotStore]]), [[Cdc.snapshotMerge]] the batch
  * into it, and commit the result as a NEW version with an atomic
  * marker publish. The input version's files are never touched while
  * they are being read — no lineage pinning, no localCheckpoint, no
  * read-modify-write window. A crash anywhere before the marker rename
  * leaves the previous snapshot fully readable; the half-written data
  * dir is orphaned and reclaimed by the next commit.
  *
  * Exactly-once: foreachBatch may REPLAY a batch after a failure. The
  * batchId is stamped into the commit marker, so a replay of an
  * already-committed batch is detected and SKIPPED — the snapshot
  * advances exactly one version per distinct batch (the merge is also
  * (key, version)-idempotent, so even a skipped-detection double merge
  * would be value-identical; the ledger just keeps history linear).
  * Only a genuinely absent commit ledger reads as "first batch"; any
  * other IO failure propagates and fails the query rather than silently
  * rebuilding the snapshot from one batch.
  *
  * Semantics note: a tombstone suppresses every version present AT MERGE
  * TIME; a lower-versioned row arriving in a LATER batch (out-of-order
  * across batches) reappears. Within-batch disorder is handled by the
  * version ordering.
  *
  * Read the maintained snapshot with
  * `SnapshotStore.read(spark, targetDir)` (a raw parquet read of
  * `targetDir` would union all retained versions); prior versions stay
  * time-travelable until [[graft.sources.SnapshotStore.vacuum]].
  */
object StreamCdc {

  private def batchMeta(batchId: Long) = s"batch=$batchId"

  /** Start the maintenance query. `changes` must be a streaming frame
    * carrying `versionCol` and boolean `deletedCol`. */
  def upsertStream(changes: DataFrame, targetDir: String,
                   keyCols: Seq[String], versionCol: String,
                   deletedCol: String,
                   checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = SnapshotStore.committedVersion(spark, targetDir)
        val replayed = committed.exists(v =>
          SnapshotStore.commitMeta(spark, targetDir, v)
            .contains(batchMeta(batchId)))
        if (!replayed) {
          val merged = committed match {
            case Some(v) =>
              Cdc.snapshotMerge(
                SnapshotStore.readVersion(spark, targetDir, v),
                batch, keyCols, versionCol, deletedCol)
            case None =>
              Cdc.compact(batch, keyCols, versionCol, deletedCol)
          }
          SnapshotStore.commitSmall(merged, targetDir, batchMeta(batchId))
          ()
        }
      }
      .start()
}
