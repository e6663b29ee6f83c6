package graft.streaming

import graft.ops.Cdc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of [[graft.ops.Cdc]]: continuously maintain a
  * latest-wins snapshot from a CDC changelog stream (upserts +
  * tombstones) with `foreachBatch` — the idiomatic Structured Streaming
  * pattern for MERGE-INTO maintenance on a plain parquet target, no
  * table format required.
  *
  * Each micro-batch: read the current snapshot, [[Cdc.snapshotMerge]] the
  * batch into it, eagerly localCheckpoint the merged result (truncating
  * lineage OFF the target files), then overwrite the target. The
  * checkpoint is what makes read-modify-write on the SAME directory safe
  * — without it the overwrite would delete the files its own input scan
  * is still reading. State is the snapshot itself (on storage, not in
  * the state store), so a restart resumes from the last committed batch
  * with no growing executor state.
  *
  * Semantics note: a tombstone suppresses every version present AT MERGE
  * TIME; a lower-versioned row arriving in a LATER batch (out-of-order
  * across batches) reappears. Within-batch disorder is handled by the
  * version ordering. Exactly-once: foreachBatch may REPLAY a batch after
  * failure; the merge is idempotent ((key, version) dedup), so replays
  * are safe.
  */
object StreamCdc {

  /** Start the maintenance query. `changes` must be a streaming frame
    * carrying `versionCol` and boolean `deletedCol`. */
  def upsertStream(changes: DataFrame, targetDir: String,
                   keyCols: Seq[String], versionCol: String,
                   deletedCol: String,
                   checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val current = scala.util.Try(spark.read.parquet(targetDir)).toOption
        val merged = current match {
          case Some(cur) =>
            Cdc.snapshotMerge(cur.drop(deletedCol), batch, keyCols,
              versionCol, deletedCol)
          case None =>
            Cdc.compact(batch, keyCols, versionCol, deletedCol)
        }
        val pinned = merged.localCheckpoint(true)
        try pinned.write.mode("overwrite").parquet(targetDir)
        finally pinned.queryExecution.analyzed.foreach {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(false)
          case _ => ()
        }
      }
      .start()
}
