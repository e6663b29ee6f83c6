package graft.ops

import graft.functions.PortableHash.phash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column (Cormode & Muthukrishnan 2005) with
  * the PORTABLE hash family, so the sketch — and every estimate read from
  * it — is bit-reproducible by an external SQL engine. The point of a CMS
  * at 100 TB is mergeability: per-partition sketches are d·w counters
  * that add cell-wise, so frequency estimation over the whole corpus
  * costs one map-side-combined aggregation into a table of d·w rows —
  * constant size regardless of corpus or vocabulary, where an exact
  * count table is vocabulary-sized. Estimates overestimate only
  * (est >= true; est <= true + εN with prob 1-δ for w = ⌈e/ε⌉, d =
  * ⌈ln 1/δ⌉).
  */
object Sketches {

  /** Row r's bucket for a key: portable hash of "salt|r|key" mod w. */
  private def cmsBucket(key: Column, r: Column, w: Int, salt: String): Column =
    pmod(phash(concat_ws("|", lit(salt), r.cast("string"), key.cast("string"))), lit(w.toLong))

  /** Build the sketch: one (r, bucket, cnt) row per non-empty cell.
    * Weights pre-aggregate per key first (map-side partial), so each
    * distinct key contributes d rows to the cell aggregation, not each
    * occurrence. */
  def cmsBuild(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 1024,
               salt: String = "graft-cms"): DataFrame = {
    val keyCounts = df.groupBy(col(keyCol).as("__key"))
      .agg(count(lit(1)).as("__c"))
    keyCounts
      .select(col("__key"), col("__c"),
        explode(array((0 until d).map(lit): _*)).as("r"))
      .groupBy(col("r"), cmsBucket(col("__key"), col("r"), w, salt).as("bucket"))
      .agg(sum("__c").as("cnt"))
  }

  /** Point estimates for the keys in `keys(keyCol)`: est = min over the d
    * rows of the addressed cell. The sketch side is d·w rows at most —
    * it always broadcasts. */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame, keyCol: String,
                  d: Int = 4, w: Int = 1024,
                  salt: String = "graft-cms"): DataFrame = {
    val addressed = keys
      .withColumn("r", explode(array((0 until d).map(lit): _*)))
      .withColumn("bucket", cmsBucket(col(keyCol), col("r"), w, salt))
    addressed.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** K-MINIMUM-VALUES distinct-count sketch (Bar-Yossef et al. 2002, the
    * basis of the theta sketch): keep the k smallest distinct normalized
    * hashes of the key; if fewer than k exist the sketch IS the exact
    * distinct set, otherwise E[distinct] = (k-1) / u_(k) with u_(k) the
    * k-th smallest. With the portable hash the sketch — and the estimate
    * — replays bit-identically in an external engine.
    *
    * Scale: distinct-hash reduction (map-side partial) then a k-limit
    * that compiles to TakeOrderedAndProject — per-partition k-heaps, k
    * rows per partition to the driver-side merge; the sketch of a UNION
    * is the min-k of the parts' sketches (see [[kmvMerge]]), so shards
    * sketch independently and merge in O(k). Hash granularity is the
    * 1e-6 `puniform` grid: distinct values colliding on the grid merge,
    * identically on every engine. */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int = 256,
                salt: String = "graft-kmv"): DataFrame =
    df.select(graft.functions.PortableHash.puniform(
        concat_ws("|", lit(salt), col(keyCol).cast("string"))).as("u"))
      .distinct()
      .orderBy(col("u"))
      .limit(k)

  /** Sketch of a union from the parts' sketches: min-k of the combined
    * hash sets. */
  def kmvMerge(sketches: Seq[DataFrame], k: Int = 256): DataFrame =
    sketches.reduce(_.unionByName(_)).distinct().orderBy(col("u")).limit(k)

  /** One-row estimate from a sketch: exact when the sketch holds fewer
    * than k hashes, (k-1)/u_(k) otherwise. */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.agg(count(lit(1)).as("__n"), max(col("u")).as("__uk"))
      .select(
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(round((lit(k) - 1) / col("__uk"), 6)).as("kmv_est"))
}
