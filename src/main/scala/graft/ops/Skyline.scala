package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front): the rows not dominated on a pair of
  * maximize-both criteria — `p` dominates `q` when `p.x >= q.x`,
  * `p.y >= q.y`, and at least one inequality is strict. The training-data
  * use is multi-signal corpus selection ("keep the documents no other
  * document beats on BOTH quality and length"); the relational form
  * (Börzsönyi et al., "The Skyline Operator", ICDE 2001) is `SELECT ...
  * WHERE NOT EXISTS (dominator)` — quadratic, which is exactly what this
  * operator avoids.
  *
  * Algorithm (two phases, both expressed as group-by + window so Catalyst
  * keeps every stage parallel):
  *
  *  1. LOCAL prune per deterministic x-bucket (`floor(x / bucketWidth)`):
  *     within a bucket, a row survives iff it has the bucket's max `y`
  *     for its exact `x` AND no strictly-greater `x` in the bucket
  *     carries `y >= y` (a prefix max over the bucket's per-x maxima,
  *     ordered by `x` descending). Any globally-dominated-within-bucket
  *     row is dominated by a bucket-mate, so pruning is safe: phase-1
  *     survivors are a SUPERSET of the skyline. All per-bucket work —
  *     the (bucket, x) aggregation, the per-bucket window, the join
  *     back — partitions on the bucket key; no global ordering exists
  *     anywhere in this phase.
  *  2. GLOBAL pass over the survivors with the same per-x + prefix-max
  *     construction, unbucketed. For data with any spread, phase-1
  *     output is ~the per-bucket skyline sum (O(buckets · log n) rows
  *     expected on independent dims), so the single-task window here
  *     runs on a vanishing fraction of the input — the standard
  *     "local skyline then merge" distributed scheme.
  *
  * Dominance needs non-null criteria: null-x/y rows are excluded (SQL
  * comparison semantics would make them vacuously non-dominated).
  * Ties on BOTH dims are all kept — equal points do not strictly
  * dominate each other (matching the NOT EXISTS oracle form).
  */
object Skyline {

  /** Rows of `df` on the maximize-(xCol, yCol) Pareto front.
    * `bucketWidth` sets the phase-1 x-bucketing granularity — any
    * positive value is correct; pick one giving ~10-1000 buckets. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    val nonNull = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val bucketed = nonNull.withColumn("__b", floor(col(xCol) / bucketWidth))
    // phase 1: per-x table can approach |distinct x| — co-partitioned
    // shuffle join. phase 2: candidates are the pruned survivors —
    // broadcast the per-x prefix table instead of re-shuffling them.
    val local = pass(bucketed, xCol, yCol, Seq("__b"), broadcastPre = false)
    pass(local, xCol, yCol, Nil, broadcastPre = true).drop("__b")
  }

  /** One prune pass: drop rows with a dominator inside their
    * `partCols`-scope. Empty `partCols` = the global (exact) pass. */
  private def pass(df: DataFrame, xCol: String, yCol: String,
                   partCols: Seq[String], broadcastPre: Boolean): DataFrame = {
    // per-x maxima within the scope, then the running max of those maxima
    // over STRICTLY greater x (one row per x, so "rows 1 preceding" in
    // x-descending order is exactly the strict-dominator frame)
    val perX = df.groupBy((partCols :+ xCol).map(col): _*)
      .agg(max(col(yCol)).as("__my"))
    val w = (if (partCols.isEmpty) Window.orderBy(col(xCol).desc)
             else Window.partitionBy(partCols.map(col): _*).orderBy(col(xCol).desc))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre0 = perX.withColumn("__pm", max(col("__my")).over(w))
    val pre = if (broadcastPre) broadcast(pre0) else pre0
    df.join(pre, partCols :+ xCol)
      .filter(col(yCol) === col("__my") &&
        (col("__pm").isNull || col(yCol) > col("__pm")))
      .drop("__my", "__pm")
  }
}
