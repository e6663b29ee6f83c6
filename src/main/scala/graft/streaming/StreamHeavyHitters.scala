package graft.streaming

import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous frequent-items state over an event stream: a MERGEABLE
  * Misra–Gries summary (the "frequent" summary of Cormode &
  * Hadjieleftheriou 2008; mergeability per Agarwal et al. 2012,
  * "Mergeable summaries") of at most `capacity` (key, cnt) rows,
  * maintained exactly-once through [[graft.sources.SnapshotStore]]
  * commits (the [[StreamStats]] pattern: one version per batch, atomic
  * publish, batchId replay ledger).
  *
  * Guarantee carried by the state at any point: with N = total rows
  * seen, every stored count is an UNDER-estimate within N/(capacity+1)
  * of truth, and every key with true frequency > N/(capacity+1) is
  * present — each merge subtracts the (capacity+1)-th largest combined
  * count t, removing ≥ (capacity+1)·t rows of mass, so the subtractions
  * across the whole stream total ≤ N/(capacity+1). The batch analogue
  * with an exact second pass is [[graft.ops.Sketches.heavyHitters]];
  * a stream cannot re-scan history, so the streaming state reports
  * lower-bound counts instead.
  *
  * Scale: per batch, one map-side-combined count aggregation over the
  * batch plus a (capacity+1)-row TakeOrderedAndProject — state I/O and
  * merge cost are capacity-sized, independent of stream length.
  */
object StreamHeavyHitters {

  private def batchMeta(batchId: Long) = s"batch=$batchId"

  /** Reduce an exact (key, cnt) table to a ≤capacity-row MG summary:
    * keep the top capacity counts after subtracting the (capacity+1)-th
    * largest (0 when the table already fits). Ties at the threshold
    * die (cnt − t = 0), exactly as in scalar MG. */
  private[streaming] def mgSummary(counts: DataFrame, capacity: Int): DataFrame = {
    require(capacity >= 1, s"capacity=$capacity must be >= 1")
    val top = counts
      .select(col("key").cast("string").as("key"), col("cnt").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(capacity + 1)
    val t = top.agg(
      when(count(lit(1)) === capacity + 1, min(col("cnt")))
        .otherwise(lit(0L)).as("__t"))
    top.crossJoin(broadcast(t))
      .select(col("key"), (col("cnt") - col("__t")).as("cnt"))
      .filter(col("cnt") > 0)
  }

  /** Start the maintenance query: after each batch the committed
    * snapshot at `targetDir` holds the MG summary of every row seen.
    * Read with `SnapshotStore.read(spark, targetDir)`. */
  def heavyHitterStream(events: DataFrame, targetDir: String, keyCol: String,
                        capacity: Int, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = SnapshotStore.committedVersion(spark, targetDir)
        val replayed = committed.exists(v =>
          SnapshotStore.commitMeta(spark, targetDir, v)
            .contains(batchMeta(batchId)))
        if (!replayed) {
          val batchCounts = batch
            .groupBy(col(keyCol).cast("string").as("key"))
            .agg(count(lit(1)).as("cnt"))
          val merged = committed match {
            case Some(v) =>
              mgSummary(
                SnapshotStore.readVersion(spark, targetDir, v)
                  .unionByName(mgSummary(batchCounts, capacity))
                  .groupBy("key").agg(sum("cnt").as("cnt")),
                capacity)
            case None => mgSummary(batchCounts, capacity)
          }
          SnapshotStore.commitSmall(merged, targetDir, batchMeta(batchId))
          ()
        }
      }
      .start()
}
