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

  /** Two-sample log-rank test (Mantel 1966) — "are these two survival
    * curves the same?", the hypothesis test that belongs next to
    * [[kaplanMeier]]'s picture: at every distinct event time the
    * observed events in arm A are compared against the
    * hypergeometric expectation d_t·n_At/n_t given the pooled risk
    * set, and χ² = (O_A − E_A)² / ΣV_t with the standard variance
    * V_t = d_t·(n_A/n)·(n_B/n)·(n−d)/(n−1).
    *
    * Arms: the lexicographically smaller label of `armCol` is arm A
    * (deterministic, no caller-order dependence); more than two arms is
    * a contract violation surfaced as null χ² rather than a wrong
    * number.
    *
    * Determinism: risk sets are exact longs from the kaplanMeier
    * suffix-count identity; each E/V term is micro-unit-rounded
    * (round(term·1e6) — d_t·(n_A/n) ≤ subjects, so a term is ≤1e18
    * micro-units) and summed in decimal(38), order-free; χ² is one
    * fixed-shape double expression at the edge, rounded 6 dp.
    *
    * Scale: one aggregation of subjects to the (t, per-arm d/r) table;
    * the cumulative windows run over |distinct durations| rows — a
    * calendar-bounded domain (durations are day counts), the q202
    * contract, never the subject table. Output: one row (arm_a, arm_b,
    * n_a, n_b, events_a, events_b, expected_a, chi2). */
  def logRank(df: DataFrame, armCol: String, durationCol: String,
              observedCol: String): DataFrame = {
    val subj = df.select(col(armCol).cast("string").as("__arm"),
        col(durationCol).cast("long").as("__t"),
        col(observedCol).cast("long").as("__e"))
      .filter(col("__t").isNotNull && col("__arm").isNotNull)
    val armIds = subj.agg(min(col("__arm")).as("__arma"),
      max(col("__arm")).as("__armb"),
      countDistinct(col("__arm")).as("__narm"))
    val tagged = subj.crossJoin(broadcast(armIds))
      .withColumn("__isa", (col("__arm") === col("__arma")).cast("long"))
    val byT = tagged.groupBy(col("__t"))
      .agg(sum(col("__e") * col("__isa")).as("__da"),
        sum(col("__e") * (lit(1L) - col("__isa"))).as("__db"),
        sum(col("__isa")).as("__ra"),
        sum(lit(1L) - col("__isa")).as("__rb"),
        max(col("__arma")).as("__arma"), max(col("__armb")).as("__armb"),
        max(col("__narm")).as("__narm"))
    val wAll = Window.partitionBy(lit(0))
    val wPrev = Window.partitionBy(lit(0)).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT
      .withColumn("__na",
        sum(col("__ra")).over(wAll) -
          coalesce(sum(col("__ra")).over(wPrev), lit(0L)))
      .withColumn("__nb",
        sum(col("__rb")).over(wAll) -
          coalesce(sum(col("__rb")).over(wPrev), lit(0L)))
      .withColumn("__d", col("__da") + col("__db"))
      .withColumn("__n", col("__na") + col("__nb"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val nD = col("__n").cast("double")
    val dD = col("__d").cast("double")
    val eTerm = when(col("__d") > 0 && col("__n") > 0, dD * naD / nD)
      .otherwise(lit(0.0))
    val vTerm = when(col("__d") > 0 && col("__n") > 1,
      dD * (naD / nD) * (nbD / nD) * (nD - dD) / (nD - lit(1.0)))
      .otherwise(lit(0.0))
    val agg = risk.agg(
      max(col("__arma")).as("arm_a"), max(col("__armb")).as("arm_b"),
      max(col("__narm")).as("__narm"),
      sum(col("__ra")).as("n_a"), sum(col("__rb")).as("n_b"),
      sum(col("__da")).as("events_a"), sum(col("__db")).as("events_b"),
      sum(round(eTerm * 1e6, 0).cast("decimal(38,0)")).as("__e6"),
      sum(round(vTerm * 1e6, 0).cast("decimal(38,0)")).as("__v6"))
    val eA = col("__e6").cast("double") / 1e6
    val v = col("__v6").cast("double") / 1e6
    val oMinusE = col("events_a").cast("double") - eA
    agg.select(col("arm_a"), col("arm_b"), col("n_a"), col("n_b"),
      col("events_a"), col("events_b"),
      round(eA, 6).as("expected_a"),
      when(col("__narm") === 2 && v > 0,
        round(oMinusE * oMinusE / v, 6)).as("chi2"))
  }
}
