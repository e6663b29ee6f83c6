package graft.streaming

import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of [[graft.ops.TimeSeries.ewmaAnomalies]]: maintain
  * per-(group, bucket) event counts from a stream and surface EWMA
  * control-chart verdicts continuously — the volume monitor that pages
  * when today's ingest is out of band, without rescanning history.
  *
  * State is the (group, bucket, count) daily table itself — CALENDAR-
  * bounded (groups × days), never event-volume-bounded, which is the
  * same scale argument the batch operator makes for its windows. Counts
  * MERGE by addition, so a bucket straddling micro-batches (today's
  * events arriving all day) accumulates exactly; verdicts are simply
  * the batch operator applied to the committed state, so stream ≡ batch
  * is an identity by construction, not an approximation — pinned by
  * StreamEwmaSpec across a 3-way batch split with straddling buckets.
  *
  * State lives in [[graft.sources.SnapshotStore]] commits (atomic
  * publish, batchId replay ledger — the [[StreamStats]] pattern): a
  * crash between batches never corrupts counts and a replayed batch is
  * skipped, keeping the additive merge exactly-once. */
object StreamEwma {

  private def batchMeta(batchId: Long) = s"batch=$batchId"

  private def countsOf(batch: DataFrame, groupCol: String,
                       tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    batch.select(col(groupCol).as("g"), to_date(col(tsCol)).as("t"))
      .filter(col("t").isNotNull)
      .groupBy("g", "t").agg(count(lit(1)).as("x"))
  }

  /** Start the maintenance query: after each batch the committed
    * snapshot at `targetDir` holds exact (group, day, count) totals of
    * every event seen. Read verdicts with [[verdicts]]. */
  def countStream(events: DataFrame, targetDir: String, groupCol: String,
                  tsCol: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        val spark = batch.sparkSession
        val committed = SnapshotStore.committedVersion(spark, targetDir)
        val replayed = committed.exists(v =>
          SnapshotStore.commitMeta(spark, targetDir, v)
            .contains(batchMeta(batchId)))
        if (!replayed) {
          val fresh = countsOf(batch, groupCol, tsCol)
          val merged = committed match {
            case Some(v) =>
              SnapshotStore.readVersion(spark, targetDir, v)
                .unionByName(fresh)
                .groupBy("g", "t").agg(sum(col("x")).as("x"))
            case None => fresh
          }
          SnapshotStore.commitSmall(merged, targetDir, batchMeta(batchId))
          ()
        }
      }
      .start()

  /** EWMA chart over a committed state snapshot — literally the batch
    * operator on the maintained daily table, so the stream path can
    * never drift from [[graft.ops.TimeSeries.ewmaAnomalies]]. */
  def verdicts(state: DataFrame, alpha: Double = 0.3, window: Int = 14,
               k: Double = 3.0): DataFrame =
    graft.ops.TimeSeries.ewmaAnomalies(state, "g", "t", "x", alpha, window, k)
}
