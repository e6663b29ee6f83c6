package graft.pipelines

import graft.ops.Dedup
import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent MinHash near-dup index over a growing corpus — the piece
  * that turns [[graft.ops.Dedup.crossNearDup]]'s "band each side, join
  * A-bands × B-bands" topology into an INCREMENTAL-crawl primitive. A
  * daily ingest against a 100 TB corpus cannot re-shingle and re-sign the
  * corpus per batch (that cost is O(corpus), every day); it probes a
  * stored index instead:
  *
  *  - [[update]] appends a batch's (id, toks, bands) projection
  *    ([[Dedup.nearDupIndexRows]]) to a [[SnapshotStore]] table — one
  *    atomic versioned commit, so candidates (bands) and their
  *    verification sets (toks) are never published separately. Ids
  *    already indexed are skipped (anti-join on the stored ids), making
  *    replays of a crashed/duplicated ingest no-ops.
  *  - [[query]] runs the batch side fresh and joins it against the stored
  *    bands ([[Dedup.crossNearDupIndexed]]) — per-call cost is
  *    O(batch + matched-candidate surface), never O(corpus).
  *
  * Scale notes: the stored table is one row per doc; the band join
  * explodes 4 rows per INDEXED doc but carries only (16-byte key, id)
  * pairs, and the batch side is small enough for AQE to broadcast — the
  * same asymmetry crossNearDup exploits, now without the corpus-side
  * recompute. `update` commits APPEND-ONLY
  * ([[SnapshotStore.commitAppend]]): only the batch's novel rows are
  * written per ingest — O(batch) commits against an arbitrarily large
  * stored index.
  */
object NearDupIndex {

  /** Absorb `batch` into the stored index; returns the committed version.
    * Replay-safe: already-indexed ids are skipped, so re-running an
    * ingest (crash recovery, at-least-once upstream delivery) changes
    * nothing but the version number. */
  def update(spark: SparkSession, indexDir: String, batch: DataFrame,
             idCol: String, textCol: String, shingleN: Int,
             meta: String = "", compactEvery: Int = 0): Long = {
    val fresh = Dedup.nearDupIndexRows(batch, idCol, textCol, shingleN)
    val v = SnapshotStore.committedVersion(spark, indexDir) match {
      case Some(cur) =>
        val stored = SnapshotStore.readVersion(spark, indexDir, cur)
        // append-only commit: only the batch's novel rows are written —
        // O(batch) per ingest, never an O(corpus) rewrite
        SnapshotStore.commitAppend(
          fresh.join(stored.select("id"), Seq("id"), "left_anti"),
          indexDir, meta)
      case None => SnapshotStore.commit(fresh, indexDir, meta)
    }
    // probe latency scales with chain length (each delta dir is listed
    // per query); past `compactEvery` dirs rewrite the chain into one
    if (compactEvery > 0 &&
        SnapshotStore.chainLength(spark, indexDir) >= compactEvery)
      SnapshotStore.compact(spark, indexDir, s"$meta|compact")
    else v
  }

  /** The stored index (newest committed version). */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    SnapshotStore.read(spark, indexDir)

  /** Near-dup pairs between `batch` and the INDEXED corpus:
    * (id_a = indexed id, id_b = batch id, jaccard >= threshold). Exact
    * [[Dedup.crossNearDup]] semantics — the oracle for one is the oracle
    * for the other — with the corpus side served from storage. */
  def query(spark: SparkSession, indexDir: String, batch: DataFrame,
            idCol: String, textCol: String, shingleN: Int,
            threshold: Double): DataFrame =
    Dedup.crossNearDupIndexed(read(spark, indexDir), batch, idCol, textCol,
      shingleN, threshold)
}
