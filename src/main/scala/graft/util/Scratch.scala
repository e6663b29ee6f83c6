package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Per-invocation scratch locations for queries that exercise on-disk
  * storage contracts (SnapshotStore chains, bucketed tables, CSV/JSONL
  * round-trips, compaction layouts).
  *
  * Scratch paths used to be keyed by the input dir's hashCode alone — ONE
  * fixed path per (query, sfDir), shared by every process that ever ran
  * the query. Two concurrent runs (driver verify alongside bench, or a
  * retried gate) could then delete/commit under each other mid-read and
  * merge a poisoned table: the round-11 `q198_incremental_view` hash
  * flake. Every call here mints a fresh UUID-keyed location instead, so
  * concurrent invocations can never collide, and registers reclamation
  * with [[graft.QueryCleanup]] — the harness (Verify/Bench/specs) drains
  * the registry only AFTER the query's result has been fully consumed,
  * which is exactly when the lazily-read scratch parquet is safe to drop.
  */
object Scratch {

  private def token: String =
    java.util.UUID.randomUUID.toString.replace("-", "").take(16)

  /** A fresh, never-before-used scratch directory path. The dir itself is
    * not created (writers mkdir as needed); its recursive deletion is
    * registered with [[graft.QueryCleanup]]. */
  def dir(spark: SparkSession, tag: String): String = {
    val p = s"/tmp/graft_scratch/${tag}_$token"
    val hp = new Path(p)
    val conf = spark.sessionState.newHadoopConf()
    graft.QueryCleanup.register(() => hp.getFileSystem(conf).delete(hp, true))
    p
  }

  /** A fresh catalog-safe managed-table name (simple identifier, default
    * database); `DROP TABLE IF EXISTS` is registered with
    * [[graft.QueryCleanup]] so the catalog entry and its files are
    * reclaimed after the result is consumed. */
  def table(spark: SparkSession, tag: String): String = {
    val t = s"${tag}_$token"
    graft.QueryCleanup.register(() =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    t
  }
}
