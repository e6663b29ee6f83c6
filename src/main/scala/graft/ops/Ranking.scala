package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ordering WITHOUT a single-partition sort — the
  * rank-offset scheme shared by [[Dedup.sortedNeighborPairs]] and the
  * percentile-normalization queries.
  *
  * A `row_number() OVER (ORDER BY ...)` window forces every row through
  * ONE task — the classic scale-killer. This helper instead:
  *
  *  1. ranks WITHIN deterministic buckets (`bucketExpr`), all buckets in
  *     parallel behind one bucket-keyed exchange;
  *  2. prefix-sums the bucket row-counts (a #buckets-row table —
  *     metadata scale, the only serial step) into starting offsets;
  *  3. broadcast-joins the offsets back: bucket rank + offset = the
  *     exact global row number.
  *
  * CONTRACT: `bucketExpr` must be MONOTONE in the lexicographic
  * `orderCols` order (a coarse prefix: b(k1) <= b(k2) whenever k1 <= k2
  * — leading digits of a padded key, `floor(x / width)` of the leading
  * numeric key, a date's year-month). Monotonicity makes global order =
  * bucket order refined by in-bucket order; it is the caller's
  * responsibility — checking it would cost the sort this avoids.
  * `orderCols` must be a TOTAL order (append a unique id as the last
  * key), otherwise ties rank nondeterministically.
  */
object Ranking {

  /** Append `outCol` = the INCLUSIVE global prefix sum of `valueCol` in
    * `orderCols` order — the distributed running total behind exact
    * CDFs (ksTest) and cumulative ledgers. Same contract as
    * [[globalRowNumber]]: `bucketExpr` must be a monotone coarse prefix
    * of the order and `orderCols` a total order. Shape: one bucket-
    * keyed exchange for the in-bucket running sums, a bucket-count-
    * sized offset table (the only serial step), broadcast back. */
  def globalPrefixSum(df: DataFrame, orderCols: Seq[String],
                      bucketExpr: Column, valueCol: String,
                      outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val base = df.filter(col(orderCols.head).isNotNull)
      .withColumn("__psb", bucketExpr)
    val runW = Window.partitionBy(col("__psb"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val offW = Window.orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__psb")).agg(sum(col(valueCol)).as("__psn"))
      .withColumn("__pso", coalesce(sum(col("__psn")).over(offW), lit(0L)))
      .drop("__psn")
    base.withColumn("__psr", sum(col(valueCol)).over(runW))
      .join(broadcast(offsets), Seq("__psb"))
      .withColumn(outCol, col("__psr") + col("__pso"))
      .drop("__psb", "__psr", "__pso")
  }

  /** Append `__before` = the number of UNITS strictly smaller than
    * each row's `valueCol`, given a (value, per-value count) table —
    * the shared preamble of every exact rank statistic built on the
    * distinct-value counts (AUC midranks, quantile tiles, RFM scores):
    * 1024 equal-width value buckets from a 1-row bounds probe (a
    * monotone coarse prefix of the value order — the
    * [[globalPrefixSum]] contract), cumulative counts, minus the row's
    * own count. Degenerate single-value domains collapse to bucket 0.
    * The input must be value-DISTINCT (one row per value). */
  def valueCountsBefore(counts: DataFrame, valueCol: String,
                        countCol: String): DataFrame = {
    val bounds = counts.agg(min(col(valueCol)).as("__bmn"),
      max(col(valueCol)).as("__bmx"))
    val withB = counts.crossJoin(broadcast(bounds))
    val bWidth = (col("__bmx") - col("__bmn")) / lit(1024.0)
    val bucket = when(bWidth > 0,
      least(floor((col(valueCol) - col("__bmn")) / bWidth), lit(1023L)))
      .otherwise(lit(0L))
    globalPrefixSum(withB, Seq(valueCol), bucket, countCol, "__cumt")
      .withColumn("__before", col("__cumt") - col(countCol))
      .drop("__bmn", "__bmx", "__cumt")
  }

  /** Append `outCol` = the 1-based global row number of each row in
    * `orderCols` order. Rows with a NULL first order key are excluded
    * (their global position is undefined). */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
                      bucketExpr: Column, outCol: String): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val base = df.filter(col(orderCols.head).isNotNull)
      .withColumn("__rkb", bucketExpr)
    val rankW = Window.partitionBy(col("__rkb"))
      .orderBy(orderCols.map(col): _*)
    val offW = Window.orderBy(col("__rkb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("__rkb")).agg(count(lit(1)).as("__rkn"))
      .withColumn("__rko", coalesce(sum(col("__rkn")).over(offW), lit(0L)))
      .drop("__rkn")
    base.withColumn("__rkr", row_number().over(rankW))
      .join(broadcast(offsets), Seq("__rkb"))
      .withColumn(outCol, col("__rkr") + col("__rko"))
      .drop("__rkb", "__rkr", "__rko")
  }

  /** Per-GROUP [[globalRowNumber]]: `outCol` = the 1-based row number
    * within each `groupCols` group in `orderCols` order, without
    * funneling a hot group through one task. Ranks come from windows
    * over (group, bucket); per-(group, bucket) counts prefix-sum into
    * starting offsets via a window over the TINY counts table
    * (partitioned by group, ordered by bucket) and join back. Same
    * monotone-bucket / total-order contract as globalRowNumber, scoped
    * per group; `bucketExpr = lit(0)` degrades to one window per group
    * (fine when groups are small, the n² surface elsewhere is the
    * bottleneck, or the caller has no monotone prefix). */
  def groupRowNumber(df: DataFrame, groupCols: Seq[String],
                     orderCols: Seq[String], bucketExpr: Column,
                     outCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderCols.nonEmpty, "need at least one order column")
    val gc = groupCols.map(col)
    val base = df.filter(col(orderCols.head).isNotNull)
      .withColumn("__rkb", bucketExpr)
    val rankW = Window.partitionBy(gc :+ col("__rkb"): _*)
      .orderBy(orderCols.map(col): _*)
    val offW = Window.partitionBy(gc: _*).orderBy(col("__rkb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(gc :+ col("__rkb"): _*)
      .agg(count(lit(1)).as("__rkn"))
      .withColumn("__rko", coalesce(sum(col("__rkn")).over(offW), lit(0L)))
      .drop("__rkn")
    base.withColumn("__rkr", row_number().over(rankW))
      .join(broadcast(offsets), groupCols :+ "__rkb")
      .withColumn(outCol, col("__rkr") + col("__rko"))
      .drop("__rkb", "__rkr", "__rko")
  }

  /** Per-GROUP [[globalPrefixSum]]: `outCol` = the inclusive running sum
    * of `valueCol` within each `groupCols` group in `orderCols` order.
    * Same rank-offset scheme and monotone-bucket / total-order contract,
    * scoped per group: in-bucket running sums window over (group,
    * bucket); per-(group, bucket) totals prefix-sum into offsets via a
    * window over the tiny counts table and broadcast back. */
  def groupPrefixSum(df: DataFrame, groupCols: Seq[String],
                     orderCols: Seq[String], bucketExpr: Column,
                     valueCol: String, outCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(orderCols.nonEmpty, "need at least one order column")
    val gc = groupCols.map(col)
    val base = df.filter(col(orderCols.head).isNotNull)
      .withColumn("__psb", bucketExpr)
    val runW = Window.partitionBy(gc :+ col("__psb"): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val offW = Window.partitionBy(gc: _*).orderBy(col("__psb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(gc :+ col("__psb"): _*)
      .agg(sum(col(valueCol)).as("__psn"))
      .withColumn("__pso", coalesce(sum(col("__psn")).over(offW), lit(0L)))
      .drop("__psn")
    base.withColumn("__psr", sum(col(valueCol)).over(runW))
      .join(broadcast(offsets), groupCols :+ "__psb")
      .withColumn(outCol, col("__psr") + col("__pso"))
      .drop("__psb", "__psr", "__pso")
  }

  /** [[valueCountsBefore]] for SEVERAL metrics in ONE pipeline: the input
    * carries a `tagCol` naming which metric each (value, count) row
    * belongs to, and every stage runs per tag — one bounds aggregate (a
    * |tags|-row broadcast), one bucketed grouped prefix sum, one output.
    * Folding k metrics into one tagged pass replaces k parallel
    * exchange+window+broadcast pipelines with one — the fixed per-stage
    * cost (task setup, closure deserialization, tiny-table windows) is
    * what dominates rank preambles over reduced tables, so stage count,
    * not row count, is the bill (measured on q222: three pipelines =
    * ~18 stages for a 10k-row input). Input must be (tag, value)-DISTINCT. */
  def valueCountsBeforeByTag(counts: DataFrame, tagCol: String,
                             valueCol: String, countCol: String): DataFrame = {
    val bounds = counts.groupBy(col(tagCol))
      .agg(min(col(valueCol)).as("__bmn"), max(col(valueCol)).as("__bmx"))
    val withB = counts.join(broadcast(bounds), Seq(tagCol))
    val bWidth = (col("__bmx") - col("__bmn")) / lit(1024.0)
    val bucket = when(bWidth > 0,
      least(floor((col(valueCol) - col("__bmn")) / bWidth), lit(1023L)))
      .otherwise(lit(0L))
    groupPrefixSum(withB, Seq(tagCol), Seq(valueCol), bucket, countCol, "__cumt")
      .withColumn("__before", col("__cumt") - col(countCol))
      .drop("__bmn", "__bmx", "__cumt")
  }
}
