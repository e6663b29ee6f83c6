package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate over a [[SnapshotStore]]
  * append chain — the view-maintenance half of the ingest story: a daily
  * O(batch) [[SnapshotStore.commitAppend]] should NOT force every
  * dashboard aggregate downstream to re-scan the 100 TB corpus.
  *
  * The view materializes `GROUP BY keyCols → (n_rows, sum(c) per sumCol)`
  * — the self-maintainable aggregate family under insert-only deltas
  * (counts and sums merge by addition; avg derives as sum/n at read
  * time). [[refresh]] aggregates ONLY the rows added since the corpus
  * version the view last covered ([[SnapshotStore.readDelta]]) and
  * merges by key: cost O(delta + view keys) per refresh, independent of
  * corpus size. Deletes/updates never occur on an append chain; a chain
  * reset (full commit / compaction with changed content) surfaces as
  * readDelta's refusal — rebuild with [[build]].
  *
  * The view is itself a SnapshotStore table: each refresh publishes a new
  * view version through the same atomic marker, with the covered corpus
  * version recorded in the commit meta. A crash between corpus commit
  * and view refresh is safe — the view just lags and the next refresh
  * catches up; refresh is idempotent per covered-version (a no-op when
  * the view already covers the corpus head).
  *
  * Scale: the merge is `view ∪ delta-agg → groupBy` — one shuffle of
  * (view keys + delta keys) rows, map-side partial on the delta. The
  * corpus is never read beyond the new delta dirs.
  */
object IncrementalView {

  private def viewCols(keyCols: Seq[String], sumCols: Seq[String]) =
    keyCols ++ ("n_rows" +: sumCols.map(c => s"sum_$c"))

  private def aggregate(df: DataFrame, keyCols: Seq[String],
                        sumCols: Seq[String]): DataFrame = {
    // exact decimal sums: IEEE partial-sum order would make the merged
    // path differ from a full recompute in the last ulp
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sum(col(c).cast("decimal(28,6)")).as(s"sum_$c"))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full build: aggregate the corpus head and commit it as the next view
    * version. Returns the view version. */
  def build(spark: SparkSession, tableDir: String, viewDir: String,
            keyCols: Seq[String], sumCols: Seq[String]): Long = {
    val corpusV = SnapshotStore.committedVersion(spark, tableDir).getOrElse(
      throw new java.io.FileNotFoundException(
        s"IncrementalView: no committed corpus under $tableDir"))
    val agg = aggregate(SnapshotStore.readVersion(spark, tableDir, corpusV),
      keyCols, sumCols)
    SnapshotStore.commitSmall(agg, viewDir, meta = s"covers=$corpusV")
  }

  /** Corpus version the current view version covers (from commit meta). */
  def covered(spark: SparkSession, viewDir: String): Long = {
    val v = SnapshotStore.committedVersion(spark, viewDir).getOrElse(
      throw new java.io.FileNotFoundException(
        s"IncrementalView: no committed view under $viewDir — build first"))
    val meta = SnapshotStore.commitMeta(spark, viewDir, v).getOrElse("")
    meta.split("=") match {
      case Array("covers", n) => n.toLong
      case _ => throw new IllegalStateException(
        s"IncrementalView: view version $v of $viewDir has no covers= meta")
    }
  }

  /** Incremental refresh: merge the rows added since [[covered]] into the
    * view and commit. No-op (returns current view version) when the view
    * already covers the corpus head. Throws if the corpus chain was reset
    * since the covered version — rebuild with [[build]]. */
  def refresh(spark: SparkSession, tableDir: String, viewDir: String,
              keyCols: Seq[String], sumCols: Seq[String]): Long = {
    val corpusV = SnapshotStore.committedVersion(spark, tableDir).getOrElse(
      throw new java.io.FileNotFoundException(
        s"IncrementalView: no committed corpus under $tableDir"))
    val from = covered(spark, viewDir)
    if (from == corpusV)
      return SnapshotStore.committedVersion(spark, viewDir).get
    val delta = SnapshotStore.readDelta(spark, tableDir, from, corpusV)
    val cols = viewCols(keyCols, sumCols)
    val merged = SnapshotStore.read(spark, viewDir)
      .select(cols.map(col): _*)
      .unionByName(aggregate(delta, keyCols, sumCols).select(cols.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
    SnapshotStore.commitSmall(merged, viewDir, meta = s"covers=$corpusV")
  }

  /** The current view content. */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    SnapshotStore.read(spark, viewDir)
}
