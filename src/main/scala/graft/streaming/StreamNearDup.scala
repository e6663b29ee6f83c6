package graft.streaming

import graft.pipelines.NearDupIndex
import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the q161 PERSISTED near-dup ingest: arriving
  * documents probe the stored MinHash band index
  * ([[graft.pipelines.NearDupIndex]]) and matches stream out as
  * (id_a = indexed partner, id_b = arriving id, jaccard); non-dup
  * arrivals are absorbed into the index before the next micro-batch —
  * [[StreamDedup]]'s shape with the state moved OUT of the streaming
  * state store and into the versioned index table, which is what lets
  * the dedup horizon be the whole corpus instead of a watermark window
  * (exact-content streaming dedup keeps 16-byte keys in state; near-dup
  * needs bands + token sets, which belong in a table, not state rows).
  *
  * Semantics are BATCH-EQUIVALENT by construction: each micro-batch
  * runs the exact [[graft.ops.Dedup.crossNearDupIndexed]] probe the
  * batch path runs, then the exact [[NearDupIndex.update]] the batch
  * ingest runs — so a doc set processed as one batch or split across N
  * micro-batches emits the same pairs (the spec pins the split case).
  * The batch-internal guard matches [[graft.pipelines.IncrementalCorpus]]:
  * a match whose partner is inside the SAME micro-batch is not a dup
  * (those pairs surface only on a crash-replay, where the index already
  * holds the batch), keeping replays convergent.
  *
  * Scale shape: per micro-batch cost is O(batch + matched candidates)
  * — the corpus side is served from storage, never re-shingled. The
  * emitted matches append under `outDir/batch_id=N`, so a replayed
  * micro-batch overwrites its own partition instead of duplicating
  * rows (idempotent emission). */
object StreamNearDup {

  /** Start the probe-and-absorb stream. `docs` must be a STREAMING
    * DataFrame carrying `idCol` + `textCol`. The index under `indexDir`
    * may be empty (first batch seeds it) or pre-seeded with a corpus. */
  def start(docs: DataFrame, indexDir: String, outDir: String,
            checkpointDir: String, idCol: String, textCol: String,
            shingleN: Int, threshold: Double): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val matches = SnapshotStore.committedVersion(spark, indexDir) match {
          case None => batch.limit(0)
            .select(col(idCol).as("id_a"), col(idCol).as("id_b"),
              lit(0.0).as("jaccard"))
          case Some(_) =>
            NearDupIndex.query(spark, indexDir, batch, idCol, textCol,
                shingleN, threshold)
              .join(batch.select(col(idCol).as("id_a")), Seq("id_a"), "left_anti")
        }
        matches.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(outDir)
        val dupIds = matches.select(col("id_b").as(idCol)).distinct()
        val kept = batch.join(dupIds, Seq(idCol), "left_anti")
        NearDupIndex.update(spark, indexDir, kept, idCol, textCol,
          shingleN, s"stream-batch-$batchId")
        ()
      }
      .start()
}
