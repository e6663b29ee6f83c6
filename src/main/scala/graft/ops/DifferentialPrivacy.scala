package graft.ops

import graft.functions.PortableHash.puniform
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential-privacy mechanisms. The reference repo's name promises DP
  * but implements none (SURVEY §0 note) — this fills that gap as the
  * extension SURVEY §7.2 step 7 mandates.
  *
  * Laplace mechanism: noisy = true + Lap(sensitivity/ε), via inverse-CDF:
  * Lap(b) = -b * sign(u - 0.5) * ln(1 - 2|u - 0.5|), u ~ U(0,1).
  *
  * Two noise sources:
  *  - `laplaceDeterministic`: u derived from a portable hash of
  *    (groupKey, seed). Reproducible across runs AND engines — this is the
  *    testing/oracle mode, and is NOT private against an adversary who
  *    knows the seed. Clearly so documented.
  *  - `laplace`: u from Spark's `rand(seed)` — per-run random, the
  *    production path (seed from SecureRandom upstream).
  *
  * Budget accounting is simple sequential composition: ε_total = Σ ε_i,
  * tracked by PrivacyBudget on the driver (queries are planned on the
  * driver; the accountant gates plan construction, not execution).
  *
  * Scale: noise is a per-row codegen'd expression over the aggregated
  * result — cost is the aggregation itself; the mechanism adds nothing.
  */
object DifferentialPrivacy {

  /** Laplace quantile transform of a uniform column. */
  private def lapFromU(u: Column, scale: Column): Column = {
    val c = u - lit(0.5)
    -scale * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
  }

  /** Deterministic (hash-seeded) Laplace noise keyed on `key` — test/oracle
    * mode; anyone knowing `seed` can denoise. */
  def laplaceDeterministic(value: Column, key: Column, sensitivity: Double,
                           epsilon: Double, seed: Long): Column =
    value + lapFromU(puniform(concat_ws("|", key, lit(seed))),
      lit(sensitivity / epsilon))

  /** Random Laplace noise (production path). rand() is clamped into
    * (0,1): u = 0.0 exactly would send the inverse CDF to -Infinity. */
  def laplace(value: Column, sensitivity: Double, epsilon: Double,
              seed: Long): Column = {
    val eps = 1e-12
    val u = greatest(least(rand(seed), lit(1.0 - eps)), lit(eps))
    value + lapFromU(u, lit(sensitivity / epsilon))
  }

  /** Collision-free noise key: separator + null sentinel, so distinct
    * groups like ("a","bc")/("ab","c") or ("a",null)/("a","") never share
    * a Laplace draw (concat_ws alone both skips nulls and erases column
    * boundaries). */
  private def noiseKey(groupCols: Seq[String]): Column =
    concat_ws("|", groupCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000null"))): _*)

  /** Noise an already-aggregated value keyed on its group columns — the
    * composition point for pipelines that aggregate elsewhere (e.g. a
    * watermarked streaming window agg) and only need the release step.
    * Pure per-row expression over the aggregate, so it is streaming-safe:
    * no extra shuffle, no state. The hash-keyed draw means re-releasing
    * the same group (batch replay, complete-mode re-emit) repeats the
    * SAME noise instead of averaging it away — repeated observation of
    * one release leaks nothing beyond that release. */
  def noisyRelease(value: Column, groupCols: Seq[String], sensitivity: Double,
                   epsilon: Double, seed: Long): Column =
    round(laplaceDeterministic(value, noiseKey(groupCols), sensitivity,
      epsilon, seed), 6)

  /** DP count per group: count + Lap(1/ε) (count has sensitivity 1),
    * deterministic mode. */
  def dpCount(df: DataFrame, groupCols: Seq[String], epsilon: Double,
              seed: Long): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__true_count"))
      .select(groupCols.map(col) :+
        noisyRelease(col("__true_count"), groupCols, 1.0, epsilon, seed)
          .as("dp_count"): _*)

  /** DP sum per group with values clipped to [lo, hi] (sensitivity =
    * max(|lo|, |hi|)), deterministic mode. */
  def dpSum(df: DataFrame, groupCols: Seq[String], valueCol: String,
            lo: Double, hi: Double, epsilon: Double, seed: Long): DataFrame = {
    val clipped = greatest(least(col(valueCol), lit(hi)), lit(lo))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clipped).as("__true_sum"))
      .select(groupCols.map(col) :+
        noisyRelease(col("__true_sum"), groupCols,
          math.max(math.abs(lo), math.abs(hi)), epsilon, seed)
          .as("dp_sum"): _*)
  }
}

/** Sequential-composition ε-budget accountant (driver-side plan gate). */
final class PrivacyBudget(val totalEpsilon: Double) {
  private var spentEps = 0.0
  def spent: Double = spentEps
  def remaining: Double = totalEpsilon - spentEps
  /** Reserve ε for a query; throws if the budget would be exceeded. */
  def charge(epsilon: Double): Unit = synchronized {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(spentEps + epsilon <= totalEpsilon + 1e-12,
      f"privacy budget exhausted: spent $spentEps%.3f + $epsilon%.3f > $totalEpsilon%.3f")
    spentEps += epsilon
  }
}
