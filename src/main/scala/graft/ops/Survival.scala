package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis: the Kaplan-Meier product-limit estimator (Kaplan &
  * Meier, JASA 1958) — the churn/retention curve a product or reliability
  * team reads, with right-censoring handled properly (a user still active
  * at the observation horizon is CENSORED, not a death; dropping them
  * biases survival down, counting them as survivors biases it up — KM is
  * the unbiased middle).
  *
  * Determinism contract (matches the rest of the engine): risk-set and
  * death counts are exact longs from one aggregation; the survival
  * product is computed as exp of an ORDERED cumulative sum of
  * ln(1 − d/n) — sequential per-group window, no tree-reduction
  * reordering — and rounded to 6 dp at the edge. The summand is guarded
  * so ln never sees 0 (extinction rows short-circuit to survival = 0).
  */
object Survival {

  /** Kaplan-Meier curve per group over one-row-per-subject input
    * (`durationCol`: time to event/censoring; `observedCol`: 1 = event
    * occurred, 0 = right-censored at that time).
    *
    * Output: one row per (group, t) with at least one observed event —
    * n_risk (subjects with duration ≥ t), d_events (events AT t), and
    * S(t) = Π_{t_j ≤ t} (1 − d_j/n_j), rounded 6 dp. Censored-only
    * times contribute to risk-set attrition but emit no step row, the
    * standard KM presentation.
    *
    * Scale: one exchange on the group key — the per-time aggregation,
    * the total, the cumulative-removed and the cumulative ln-sum all
    * share Window.partitionBy(group), and the windows run over the
    * aggregated (group, t) table (|distinct times| rows per group),
    * never the subject table. */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
                  observedCol: String): DataFrame = {
    val byT = df.select(col(groupCol).as("__g"),
        col(durationCol).cast("long").as("__t"),
        col(observedCol).cast("long").as("__e"))
      .filter(col("__t").isNotNull)
      .groupBy(col("__g"), col("__t"))
      .agg(sum(col("__e")).as("__d"), count(lit(1)).as("__r"))
    val wAll = Window.partitionBy(col("__g"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(col("__g")).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dD = col("__d").cast("double")
    val nD = col("n_risk").cast("double")
    byT
      .withColumn("n_risk",
        sum(col("__r")).over(wAll) -
          coalesce(sum(col("__r")).over(wPrev), lit(0L)))
      // ln(1 - d/n) only when 0 < d < n; d = n (extinction) would be
      // ln(0) — that row and everything after short-circuits below.
      // The factor fixes to nano-unit longs BEFORE the cumulative sum:
      // integer window sums are summation-order-free (engines may
      // segment-tree the frame), so the product is bit-stable.
      .withColumn("__lnf",
        when(col("__d") === 0 || col("__d") >= col("n_risk"), lit(0L))
          .otherwise(round(log(lit(1.0) - dD / nD) * 1e9, 0).cast("long")))
      .withColumn("__alive", min(col("n_risk") - col("__d")).over(wCum))
      .withColumn("survival",
        when(col("__alive") === 0, lit(0.0))
          .otherwise(round(exp(sum(col("__lnf")).over(wCum) / lit(1e9)), 6)))
      .filter(col("__d") > 0)
      .select(col("__g").as(groupCol), col("__t").as("t"),
        col("n_risk"), col("__d").as("d_events"), col("survival"))
  }
}
