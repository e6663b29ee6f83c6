package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Null-safe multi-column join helpers. SQL `=` never matches NULL keys,
  * but `groupBy` DOES emit NULL-keyed groups — so any join that re-attaches
  * per-group results to group keys (densify joins, suppression semi-joins)
  * silently drops NULL-keyed groups unless it compares with `<=>`
  * (EqualNullSafe). EqualNullSafe is a hash-joinable key expression in
  * Catalyst, so these helpers keep the broadcast/shuffled-hash topologies
  * of the plain `Seq`-join forms; only the null buckets gain matches.
  *
  * The `Seq[String]` USING-join API has no null-safe variant, hence the
  * rename-join-drop dance: right-side keys get a `__ns_` prefix, the
  * condition is the `<=>` conjunction, and for non-semi joins the
  * prefixed duplicates are dropped so output schemas match the USING form.
  */
object NullSafe {

  private def prefixed(right: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(right)((d, k) => d.withColumnRenamed(k, s"__ns_$k"))

  private def cond(keys: Seq[String]) =
    keys.map(k => col(k) <=> col(s"__ns_$k")).reduce(_ && _)

  /** `left JOIN right USING (keys)` with `<=>` key equality; output schema
    * identical to the USING form (right-side key copies dropped). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           joinType: String): DataFrame = {
    require(!joinType.contains("semi") && !joinType.contains("anti"),
      "use semi()/anti() — semi/anti joins emit no right-side columns to drop")
    keys.foldLeft(left.join(prefixed(right, keys), cond(keys), joinType))(
      (d, k) => d.drop(s"__ns_$k"))
  }

  /** Null-safe LEFT SEMI join on `keys`. */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(prefixed(right, keys), cond(keys), "left_semi")

  /** Null-safe LEFT ANTI join on `keys`. */
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(prefixed(right, keys), cond(keys), "left_anti")
}
