package graft.pipelines

import graft.ops.Dedup
import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental corpus maintenance: absorb a crawl batch into a VERSIONED
  * corpus table — the daily-refresh shape a 100 TB training corpus
  * actually runs, where re-running the full pipeline over all history
  * per day is not an option. Each ingest:
  *
  *  1. [[Dedup.ingestDedup]] — drop batch docs whose content (128-bit
  *     md5) already exists in the committed corpus, and in-batch
  *     duplicates (first id wins); the corpus side is a 16-byte hash
  *     projection, never payloads.
  *  2. [[Dedup.decontaminate]] — drop docs sharing an n-gram with the
  *     benchmark set (broadcast shingle semi-join).
  *  3. Commit corpus ∪ accepted as a NEW [[SnapshotStore]] version
  *     (atomic marker publish) stamped with the caller's meta.
  *
  * Crash-safety and auditability come from the store: a failed ingest
  * leaves the previous corpus version live, every historical version
  * stays time-travelable ([[SnapshotStore.diffVersions]] shows exactly
  * what an ingest added), and [[SnapshotStore.vacuum]] bounds retention.
  *
  * Scale: per-ingest cost is O(batch + corpus-hash-projection) — the
  * corpus text is read only to rewrite the new version's files. (A
  * production deployment would keep the corpus as an APPEND-only file
  * set per version — manifest of parent files + the new delta — making
  * commits O(batch); the store's versioning contract already permits
  * that layout, this method just writes eagerly for simplicity.)
  */
object IncrementalCorpus {

  /** Ingest one batch; returns the committed version. `meta` lands in
    * the commit marker (e.g. a crawl id) for the audit trail. */
  def ingest(spark: SparkSession, tableDir: String, batch: DataFrame,
             bench: DataFrame, idCol: String, textCol: String,
             decontamN: Int = 8, meta: String = ""): Long = {
    val current = SnapshotStore.committedVersion(spark, tableDir) match {
      case Some(v) => SnapshotStore.readVersion(spark, tableDir, v)
      case None => batch.limit(0)
    }
    val fresh = Dedup.ingestDedup(batch, current, idCol, textCol)
    val clean = Dedup.decontaminate(fresh, bench, idCol, textCol, decontamN)
    SnapshotStore.commit(current.unionByName(clean), tableDir, meta)
  }
}
