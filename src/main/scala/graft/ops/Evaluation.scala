package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label/prediction evaluation: inter-annotator agreement and the
  * per-class classification report — the label-quality audits a
  * training-data pipeline runs before trusting annotations (raw
  * percent-agreement overstates quality when the label distribution is
  * skewed; kappa subtracts the agreement two raters would reach by
  * chance).
  *
  * Everything reduces over the |labels|² confusion-cell table, so after
  * one map-side-combining aggregation of the data every statistic is
  * metadata-scale. Counts are exact longs; the chance-agreement
  * products widen to decimal(38) BEFORE multiplying (the long-overflow
  * rule this codebase enforces); each output is one double division at
  * the edge, rounded 6 dp.
  */
object Evaluation {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Cohen's kappa (Cohen 1960) between two label columns over the rows
    * where both are non-null. Exact integer identity:
    * κ = (d·n − S) / (n² − S) with d = Σ diagonal cells and
    * S = Σ_k rowₖ·colₖ — no intermediate float p₀/p_e rounding. Output:
    * one row (n, po, pe, kappa); κ is null when chance agreement is
    * total (n² = S, e.g. both raters constant). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val ra = cells.groupBy(col("__a").as("__k")).agg(sum(col("__c")).as("__ra"))
    val cb = cells.groupBy(col("__b").as("__k")).agg(sum(col("__c")).as("__cb"))
    val chance = ra.join(cb, Seq("__k"))
      .agg(sum(dec(col("__ra")) * dec(col("__cb"))).as("__s"))
    val totals = cells.agg(
      sum(col("__c")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L)).as("__d"))
    val n = dec(col("__n"))
    totals.crossJoin(broadcast(chance)).select(
      col("__n").as("n"),
      round(col("__d").cast("double") / col("__n").cast("double"), 6).as("po"),
      round(col("__s").cast("double")
        / (n * n).cast("double"), 6).as("pe"),
      when(n * n =!= col("__s"),
        round((dec(col("__d")) * n - col("__s")).cast("double")
          / (n * n - col("__s")).cast("double"), 6)).as("kappa"))
  }

  /** Per-class precision/recall/F1 against an actual-label column —
    * one row per label in either column: support (actual count), tp,
    * fp, fn, precision tp/(tp+fp), recall tp/(tp+fn), and F1 in its
    * exact integer form 2tp/(2tp+fp+fn) (no intermediate rounding).
    * Degenerate denominators yield null, not 0-by-convention. */
  def classificationReport(df: DataFrame, actualCol: String,
                           predCol: String): DataFrame = {
    val cells = df.select(col(actualCol).cast("string").as("__a"),
        col(predCol).cast("string").as("__p"))
      .filter(col("__a").isNotNull && col("__p").isNotNull)
      .groupBy(col("__a"), col("__p"))
      .agg(count(lit(1)).as("__c"))
    val actuals = cells.groupBy(col("__a").as("label"))
      .agg(sum(col("__c")).as("support"))
    val preds = cells.groupBy(col("__p").as("label"))
      .agg(sum(col("__c")).as("__pred"))
    val diag = cells.filter(col("__a") === col("__p"))
      .select(col("__a").as("label"), col("__c").as("__tp"))
    val tp = col("__tp")
    actuals.join(preds, Seq("label"), "full_outer")
      .join(diag, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("__tp"), lit(0L)).as("__tp"),
        (coalesce(col("__pred"), lit(0L)) - coalesce(col("__tp"), lit(0L)))
          .as("__fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("__tp"), lit(0L)))
          .as("__fn"))
      .select(col("label"), col("support"),
        tp.as("tp"), col("__fp").as("fp"), col("__fn").as("fn"),
        when(tp + col("__fp") > 0,
          round(tp.cast("double") / (tp + col("__fp")).cast("double"), 6))
          .as("precision"),
        when(tp + col("__fn") > 0,
          round(tp.cast("double") / (tp + col("__fn")).cast("double"), 6))
          .as("recall"),
        when(tp * 2 + col("__fp") + col("__fn") > 0,
          round((tp * 2).cast("double")
            / (tp * 2 + col("__fp") + col("__fn")).cast("double"), 6))
          .as("f1"))
  }
}
