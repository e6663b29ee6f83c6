package graft.streaming

import graft.ops.Sketches
import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus statistics from a document stream: maintain
  * MERGEABLE sketches (bottom-k quantile + KMV distinct) over all data
  * seen so far, with per-batch cost O(batch + k) and state of exactly
  * 2k rows — the streaming payoff of the sketch merge laws
  * ([[graft.ops.Sketches.quantileMerge]]/[[graft.ops.Sketches.kmvMerge]]:
  * sketch(A ∪ B) == merge(sketch(A), sketch(B)), exactly, by
  * construction). An exact running quantile would need every value ever
  * seen; this needs k rows per sketch regardless of stream length, and
  * the result is IDENTICAL to sketching the full history in one batch —
  * not an approximation of it.
  *
  * State lives in [[graft.sources.SnapshotStore]] commits (one version
  * per batch, atomic publish, batchId replay ledger — the
  * [[StreamCdc]] pattern), so a crash never corrupts the sketch and a
  * replayed batch is skipped, keeping merges exactly-once. Snapshot
  * schema: (kind, u, v) with kind ∈ 'q' (quantile sample) / 'd'
  * (distinct hashes, v unused).
  *
  * Scale: the merge unions a k-row snapshot with the batch's k-row
  * sketch — executor-trivial; the only per-batch work proportional to
  * data is the batch's own sketch pass (TakeOrderedAndProject heaps,
  * zero exchanges).
  */
object StreamStats {

  private def batchMeta(batchId: Long) = s"batch=$batchId"

  /** Sketch one static frame into the (kind, u, v) state schema. */
  private def sketchOf(df: DataFrame, keyCol: String, valueCol: String,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    Sketches.quantileSketch(df, keyCol, valueCol, k)
      .select(lit("q").as("kind"), col("u"), col("v"))
      .unionByName(Sketches.kmvSketch(df, keyCol, k)
        .select(lit("d").as("kind"), col("u"), lit(0.0).as("v")))
  }

  private def mergeStates(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    def part(df: DataFrame, kind: String) =
      df.filter(col("kind") === kind).select(col("u"), col("v"))
    Sketches.quantileMerge(Seq(part(a, "q"), part(b, "q")), k)
      .select(lit("q").as("kind"), col("u"), col("v"))
      .unionByName(
        Sketches.kmvMerge(Seq(part(a, "d").select("u"), part(b, "d").select("u")), k)
          .select(lit("d").as("kind"), col("u"), lit(0.0).as("v")))
  }

  /** Start the maintenance query: after each batch, the committed
    * snapshot at `targetDir` holds the merged quantile + distinct
    * sketches of every row seen. Read with
    * `SnapshotStore.read(spark, targetDir)`; estimate with
    * [[quantiles]]/[[distinctCount]]. */
  def sketchStream(docs: DataFrame, targetDir: String, keyCol: String,
                   valueCol: String, k: Int,
                   checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val committed = SnapshotStore.committedVersion(spark, targetDir)
        val replayed = committed.exists(v =>
          SnapshotStore.commitMeta(spark, targetDir, v)
            .contains(batchMeta(batchId)))
        if (!replayed) {
          val fresh = sketchOf(batch, keyCol, valueCol, k)
          val merged = committed match {
            case Some(v) =>
              mergeStates(SnapshotStore.readVersion(spark, targetDir, v), fresh, k)
            case None => fresh
          }
          SnapshotStore.commitSmall(merged, targetDir, batchMeta(batchId))
          ()
        }
      }
      .start()

  /** Nearest-rank quantile estimates from a committed state snapshot. */
  def quantiles(state: DataFrame, qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.functions._
    Sketches.quantileEstimate(
      state.filter(col("kind") === "q").select("u", "v"), qs)
  }

  /** Distinct-count estimate from a committed state snapshot. */
  def distinctCount(state: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    Sketches.kmvEstimate(state.filter(col("kind") === "d").select("u"), k)
  }
}
