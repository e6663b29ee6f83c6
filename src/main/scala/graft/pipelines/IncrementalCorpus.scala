package graft.pipelines

import graft.ops.Dedup
import graft.sources.SnapshotStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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
  * commit itself is APPEND-ONLY ([[SnapshotStore.commitAppend]]: the
  * new version's manifest references the parent's files plus the
  * accepted delta, so only the batch is ever written; no corpus text
  * is rewritten, ever).
  */
object IncrementalCorpus {

  /** Where the ingest-maintained near-dup index lives, relative to the
    * corpus table. Underscore prefix keeps it out of any naive directory
    * glob of the corpus data. */
  def nearDupIndexDir(tableDir: String): String = s"$tableDir/_neardup_index"

  /** Ingest one batch; returns the committed version. `meta` lands in
    * the commit marker (e.g. a crawl id) for the audit trail.
    *
    * With `nearDupThreshold` set, a fourth stage runs between
    * decontamination and commit: the batch probes the corpus's PERSISTENT
    * MinHash band index ([[NearDupIndex]], stored under
    * [[nearDupIndexDir]]) and docs whose n-gram Jaccard against ANY
    * already-ingested doc clears the threshold are dropped — the
    * incremental-crawl near-dup gate WITHOUT recomputing corpus-side
    * shingles/signatures per ingest (that recompute is O(corpus), every
    * day; the index probe is O(batch + candidates)). Accepted docs are
    * appended to the index before the corpus commit. Index matches whose
    * partner id is inside the CURRENT batch are ignored when filtering,
    * so replaying a crashed ingest — where the index may already hold
    * the batch, including batch-internal near-dup pairs the original
    * run kept — does not reject the batch against itself or its
    * siblings; together with content dedup and the index's own
    * id-replay guard, replay converges to the original accept set. */
  def ingest(spark: SparkSession, tableDir: String, batch: DataFrame,
             bench: DataFrame, idCol: String, textCol: String,
             decontamN: Int = 8, meta: String = "",
             nearDupThreshold: Option[Double] = None,
             nearDupShingleN: Int = 2,
             annIndexDir: Option[String] = None,
             annVecCol: String = "embedding",
             compactEvery: Int = 0): Long = {
    val current = SnapshotStore.committedVersion(spark, tableDir) match {
      case Some(v) => SnapshotStore.readVersion(spark, tableDir, v)
      case None => batch.limit(0)
    }
    val fresh = Dedup.ingestDedup(batch, current, idCol, textCol)
    val clean = Dedup.decontaminate(fresh, bench, idCol, textCol, decontamN)
    val accepted = nearDupThreshold match {
      case None => clean
      case Some(threshold) =>
        val idxDir = nearDupIndexDir(tableDir)
        val kept = SnapshotStore.committedVersion(spark, idxDir) match {
          case None => clean
          case Some(_) =>
            // replay guard: only an index partner OUTSIDE this batch can
            // reject a batch doc. A crash between the index commit and
            // the corpus commit leaves the batch's own rows in the index;
            // filtering only self-matches (id_a == id_b) would then
            // reject batch docs against their near-dup SIBLINGS in the
            // same batch on replay — pairs the original run kept — so
            // replay would not converge. Anti-joining the whole batch id
            // set makes replay reproduce the original accept set exactly.
            val dupIds = NearDupIndex.query(spark, idxDir, clean, idCol,
                textCol, nearDupShingleN, threshold)
              .join(clean.select(col(idCol).as("id_a")), Seq("id_a"), "left_anti")
              .select(col("id_b").as(idCol)).distinct()
            clean.join(dupIds, Seq(idCol), "left_anti")
        }
        NearDupIndex.update(spark, idxDir, kept, idCol, textCol,
          nearDupShingleN, meta)
        kept
    }
    // ANN-index refresh: accepted docs carrying an embedding are encoded
    // against the STORED IVF-PQ artifacts (codebooks untouched) so
    // tomorrow's searches see today's crawl without a full re-encode.
    // Sits beside the near-dup gate with the same replay contract —
    // already-indexed ids are skipped, so a crashed ingest re-runs clean.
    // Quantizer staleness stays monitored, not silent: callers pair this
    // with [[graft.ops.Similarity.ivfPqOccupancyDrift]].
    annIndexDir.foreach { dir =>
      require(batch.columns.contains(annVecCol),
        s"annIndexDir set but batch has no '$annVecCol' column")
      graft.ops.Similarity.encodeIntoIvfPqIndex(spark, dir,
        accepted.select(col(idCol), col(annVecCol)), idCol, annVecCol, meta)
    }
    // append-only corpus commit: only the accepted batch is written —
    // O(batch) per ingest; readers still see the full logical corpus
    // through the version manifest
    val v = SnapshotStore.commitAppend(accepted, tableDir, meta)
    // bounded read amplification: past `compactEvery` chained delta dirs
    // the chain is rewritten into one physical version (amortized
    // O(corpus/compactEvery) per ingest; 0 = caller compacts explicitly)
    if (compactEvery > 0 &&
        SnapshotStore.chainLength(spark, tableDir) >= compactEvery)
      SnapshotStore.compact(spark, tableDir, s"$meta|compact")
    else v
  }
}
