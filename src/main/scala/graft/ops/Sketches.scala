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
}
