package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance for an incrementally refreshed corpus:
  * MERGE-INTO semantics (upsert + tombstone delete) expressed as plain
  * relational algebra, so it runs on raw parquet snapshots without a
  * table format. This is how a 100 TB training corpus absorbs a days'
  * crawl: base snapshot ∪ change batch, latest version per key wins,
  * tombstones drop out.
  *
  * Scale: one exchange — the union hash-partitions on the key for a
  * windowed row_number; no join, and the change batch never needs to
  * broadcast. The window sorts only within each key's handful of
  * versions. Callers must guarantee (key, version) is unique across the
  * union (monotone batch versions do this naturally); otherwise the
  * winner among peers is undefined.
  */
object Cdc {

  /** Latest-wins merge of a live `base` snapshot with a `changes` batch.
    * Both sides carry `versionCol`; `changes` additionally carries
    * boolean `deletedCol` (tombstones). Base rows are implicitly live.
    * Output schema = base schema (version retained, tombstone flag
    * dropped). */
  def snapshotMerge(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                    versionCol: String, deletedCol: String): DataFrame =
    compact(base.withColumn(deletedCol, lit(false)).unionByName(changes),
      keyCols, versionCol, deletedCol)

  /** Diff two snapshots of one table: a row per key present in EITHER
    * side, labeled added / removed / changed / same by comparing a
    * 128-bit content hash. The audit that tells you what a refresh
    * actually did before you promote it.
    *
    * Scale: each side reduces to (key, md5) BEFORE the full-outer join —
    * 16-byte digests shuffle, payloads never do; one exchange per side
    * on the key. Null-safe: a null content column hashes as a sentinel,
    * distinct from the empty string. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
                   contentCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, hc: String) = df.select(
      keyCols.map(col) :+ md5(concat_ws("\u0001",
        contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as(hc): _*)
    hashed(before, "__hb").join(hashed(after, "__ha"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__hb").isNull, "added")
          .when(col("__ha").isNull, "removed")
          .when(col("__ha") === col("__hb"), "same")
          .otherwise("changed"))
      .drop("__hb", "__ha")
  }

  /** Compact a changelog (or merged snapshot) to the live latest row per
    * key: row_number over version-descending, tombstones filtered after
    * the rank so a delete also suppresses every older version. */
  def compact(changelog: DataFrame, keyCols: Seq[String], versionCol: String,
              deletedCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    changelog.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(deletedCol))
      .drop("__rn", deletedCol)
  }

  /** Slowly-changing-dimension TYPE 2 build (Kimball): turn a changelog
    * of per-key versions into interval-versioned dimension rows —
    * each version valid from its own version number until just before
    * the key's NEXT version; the key's latest live version is current
    * (`valid_to` null). A tombstone closes the previous interval and
    * emits no row of its own — deletes truncate history exactly like a
    * new version, they just have no successor row.
    *
    * One exchange on the key (the lead window), no join; the changelog
    * is the only input. `valid_from`/`valid_to` carry `versionCol`'s
    * type: version-number intervals compose with [[snapshotDiff]] and
    * a time-typed version column yields classic timestamp validity.
    * Callers wanting point-in-time lookups join with
    * `valid_from <= v AND (valid_to IS NULL OR v < valid_to)` — the
    * [[graft.ops.TimeSeries.rangeJoin]] bucketing applies when that
    * probe is itself large. */
  def scdType2(changelog: DataFrame, keyCols: Seq[String], versionCol: String,
               deletedCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changelog
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(!col(deletedCol))
      .drop(deletedCol)
  }
}
