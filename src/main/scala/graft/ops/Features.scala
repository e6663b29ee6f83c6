package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe feature engineering over training tables — the encode
  * steps that sit between a curated corpus and a model fit. Everything
  * here is a pure function of (row key, salt), so features reproduce
  * across retries, engines, and repartitionings, and an external SQL
  * engine can replay them row for row.
  */
object Features {

  /** Out-of-fold target encoding of a categorical column (the
    * Micci-Barreca 2001 smoothed mean, computed leave-fold-out): each
    * row's encode uses ONLY the label statistics of the OTHER k−1 folds
    *
    *   te = (oofPos(cat) + m·oofPrior) / (oofN(cat) + m)
    *
    * with fold = hash(salt|key) mod k ([[Sampling.kFoldAssign]]) and the
    * prior itself out-of-fold — the standard defense against the
    * target-leakage that makes naive mean-encoding overfit high-
    * cardinality categories. m is the smoothing pseudo-count pulling
    * rare categories toward the prior.
    *
    * Determinism: all statistics are exact long/decimal sums; the
    * encode is one fixed-shape double expression of those integers,
    * rounded 6 dp — fold assignment is the portable hash, so every
    * engine folds the same keys together.
    *
    * Scale: ONE map-side-combined aggregation to the (category, fold)
    * cell table; the category and fold marginals are windows over that
    * bounded table; the encode joins back to data on (category, fold) —
    * a broadcast when categories are bounded, a plain hash join when
    * they are web-scale (never a window over the data). */
  def oofTargetEncode(df: DataFrame, keyCol: String, catCol: String,
                      labelCol: Column, k: Int = 5, smoothing: Double = 20.0,
                      salt: String = "graft-te"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"oofTargetEncode: k=$k must be >= 2")
    require(smoothing > 0, s"oofTargetEncode: smoothing=$smoothing must be > 0")
    val rows = Sampling.kFoldAssign(
      df.select(col(keyCol), col(catCol).as("__cat"),
        when(labelCol, 1L).otherwise(0L).as("__y")),
      keyCol, k, salt, "fold")
    val cells = rows.groupBy(col("__cat"), col("fold"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"))
    val wCat = Window.partitionBy(col("__cat"))
    val wFold = Window.partitionBy(col("fold"))
    val wAll = Window.partitionBy()
    val enc = cells
      .withColumn("__tn", sum(col("__n")).over(wCat))
      .withColumn("__ts", sum(col("__s")).over(wCat))
      .withColumn("__fn", sum(col("__n")).over(wFold))
      .withColumn("__fs", sum(col("__s")).over(wFold))
      .withColumn("__gn", sum(col("__n")).over(wAll))
      .withColumn("__gs", sum(col("__s")).over(wAll))
      .select(col("__cat"), col("fold"),
        round(((col("__ts") - col("__s")).cast("double")
            + lit(smoothing) * ((col("__gs") - col("__fs")).cast("double")
              / (col("__gn") - col("__fn")).cast("double")))
          / ((col("__tn") - col("__n")).cast("double") + lit(smoothing)), 6)
          .as("te"))
    // null-SAFE join back: a NULL category is a legitimate "missing"
    // level (groupBy/windows above already pool nulls into one cell), so
    // it must get an encode too — a plain equi-join would silently drop
    // every null-category input row from the output
    rows.join(enc.withColumnsRenamed(Map("__cat" -> "__ecat", "fold" -> "__efold")),
        col("__cat") <=> col("__ecat") && col("fold") === col("__efold"))
      .select(col(keyCol), col("__cat").as(catCol), col("fold"), col("te"))
  }
}
