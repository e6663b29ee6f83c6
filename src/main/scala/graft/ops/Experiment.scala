package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Online-experiment (A/B test) analysis: CUPED variance reduction
  * (Deng, Xu, Kohavi, Walker — WSDM 2013) and the pooled two-proportion
  * z-test. Both consume one-row-per-unit inputs (the assignment grain),
  * so the heavy lifting — collapsing raw events to units — is ordinary
  * aggregation the caller composes in front.
  *
  * Determinism contract: all moments are exact decimal sums of per-unit
  * values (cast once per row, summed wide); the handful of divisions,
  * the sqrt, and the single theta multiply happen on those exact sums at
  * the very end, rounded 6 dp — identical IEEE step order in engine and
  * oracle.
  */
object Experiment {

  private def dec(c: Column): Column = c.cast("decimal(38,12)")

  /** CUPED-adjusted arm means: uses the PRE-experiment covariate x to
    * cancel between-user variance in the experiment metric y via
    * y' = y − θ·(x − mean(x)), θ = cov(x,y)/var(x) pooled over all arms
    * (pre-period data is assignment-independent, so pooling is unbiased
    * and uses every unit). Output: one row per arm with n, mean_y,
    * mean_y_cuped (equal-mean shift: Σ over arms preserves the global
    * mean), var_y, var_y_cuped and the achieved variance-reduction
    * ratio — the quantity that decides how much traffic/time the
    * experiment saves.
    *
    * Scale: two aggregations (global moments — 1 row, broadcast back —
    * and per-arm moments) over the unit table; nothing is ever wider
    * than one row per unit. */
  /** Positive-part James–Stein shrinkage of per-group means toward the
    * grand mean (James & Stein 1961; Efron & Morris 1975) — the
    * winner's-curse correction for "which segment has the best metric"
    * readouts: with many segments, the extreme observed means are partly
    * selection noise, and the JS estimator dominates the raw means in
    * total squared error whenever k ≥ 4. b = max(0, 1 − (k−3)·se̅²/SSB)
    * with se̅² the pooled within-group variance times the mean 1/n_g;
    * shrunk_g = grand + b·(mean_g − grand). Output: (group, n, mean,
    * shrunk, b) — b repeated per row for readability.
    *
    * Determinism: group means round to 6 dp; every cross-group sum
    * (grand mean, pooled variance terms, 1/n terms, squared deviations)
    * quantizes its k per-group terms to integer micro-units first, so
    * group order can never reach b. Edge cases: k ≤ 3 → b = 1 (the JS
    * correction does not apply); SSB = 0 → b = 0 (all means equal —
    * shrinking is the identity anyway).
    *
    * Scale: one map-side-combined aggregation to k rows; every window
    * here runs over those k rows. */
  def jamesSteinMeans(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(col(groupCol).as("__g"), col(valueCol).cast("double").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy(col("__g")).agg(
        count(lit(1)).as("__n"),
        sum(col("__v").cast("decimal(28,6)")).cast("double").as("__s"),
        sum((col("__v") * col("__v")).cast("decimal(38,12)")).cast("double").as("__ss"))
      .filter(col("__n") > 1)
      .withColumn("mean", round(col("__s") / col("__n"), 6))
    val wAll = Window.partitionBy()
    // cross-group micro sums as decimal(38,0), not long: the per-group
    // pooled-variance micro term is n·value²-scaled and the others grow
    // with the group count, so a web-scale input would silently saturate
    // Spark's double→long cast while DuckDB BIGINT errors — decimal
    // mirrors HUGEINT exactly (both exact to 1e38, both error past it)
    val stats = g
      .withColumn("__k", count(lit(1)).over(wAll))
      .withColumn("__gm", round(sum(round(col("mean") * 1e6, 0)
        .cast("decimal(38,0)"))
        .over(wAll).cast("double") / col("__k") / 1e6, 6))
      .withColumn("__pv", sum(round((col("__ss") - col("__s") * col("__s") / col("__n"))
        * 1e6, 0).cast("decimal(38,0)")).over(wAll).cast("double") / 1e6
        / sum(col("__n") - 1).over(wAll).cast("double"))
      .withColumn("__invn", sum(round(lit(1e9) / col("__n"), 0)
        .cast("decimal(38,0)"))
        .over(wAll).cast("double") / col("__k") / 1e9)
      .withColumn("__ssb", sum(round((col("mean") - col("__gm"))
        * (col("mean") - col("__gm")) * 1e6, 0).cast("decimal(38,0)"))
        .over(wAll).cast("double") / 1e6)
    val b = when(col("__k") <= 3, lit(1.0))
      .when(col("__ssb") <= 0, lit(0.0))
      .otherwise(greatest(lit(0.0), round(lit(1.0)
        - (col("__k") - 3) * col("__pv") * col("__invn") / col("__ssb"), 6)))
    stats.withColumn("b", b)
      .select(col("__g").as(groupCol), col("__n").as("n"), col("mean"),
        round(col("__gm") + col("b") * (col("mean") - col("__gm")), 6)
          .as("shrunk"),
        col("b"))
  }

  def cuped(units: DataFrame, armCol: String, preCol: String,
            postCol: String): DataFrame = {
    val x = col("__x")
    val y = col("__y")
    // the unit table feeds TWO consumers (global moments, per-arm
    // adjustment); persist the 3-column projection so an expensive
    // upstream unit construction (events -> per-user sums) is scanned
    // once — released via the QueryCleanup handover contract
    val u = units.select(col(armCol).as("__arm"),
        col(preCol).cast("double").as("__x"),
        col(postCol).cast("double").as("__y"))
      .filter(x.isNotNull && y.isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => u.unpersist())
    val g = u.agg(
      count(lit(1)).as("__n"),
      sum(dec(x)).as("__sx"), sum(dec(y)).as("__sy"),
      sum(dec(x * x)).as("__sxx"), sum(dec(x * y)).as("__sxy"))
    val nG = col("__n").cast("double")
    val stats = g.select(
      (col("__sxy").cast("double") - col("__sx").cast("double")
        * col("__sy").cast("double") / nG).as("__covn"),
      (col("__sxx").cast("double") - col("__sx").cast("double")
        * col("__sx").cast("double") / nG).as("__varn"),
      (col("__sx").cast("double") / nG).as("__mx"))
    // theta on the 1-row stats table; constant-x degenerates to theta 0
    // (no adjustment) instead of a division blow-up
    val withTheta = stats.select(
      when(col("__varn") =!= 0.0, col("__covn") / col("__varn"))
        .otherwise(lit(0.0)).as("__theta"),
      col("__mx"))
    val adj = u.crossJoin(broadcast(withTheta))
      .withColumn("__ya", y - col("__theta") * (x - col("__mx")))
    val a = adj.groupBy(col("__arm").as(armCol)).agg(
      count(lit(1)).as("n"),
      sum(dec(y)).as("__ay"), sum(dec(y * y)).as("__ayy"),
      sum(dec(col("__ya"))).as("__aya"),
      sum(dec(col("__ya") * col("__ya"))).as("__ayaa"),
      first(col("__theta")).as("__th"))
    val nA = col("n").cast("double")
    val varY = (col("__ayy").cast("double") - col("__ay").cast("double")
      * col("__ay").cast("double") / nA) / (nA - 1)
    val varA = (col("__ayaa").cast("double") - col("__aya").cast("double")
      * col("__aya").cast("double") / nA) / (nA - 1)
    a.select(col(armCol), col("n"),
      round(col("__ay").cast("double") / nA, 6).as("mean_y"),
      round(col("__aya").cast("double") / nA, 6).as("mean_y_cuped"),
      round(varY, 6).as("var_y"),
      round(varA, 6).as("var_y_cuped"),
      when(varY =!= 0.0, round(lit(1.0) - varA / varY, 6)).as("var_reduction"),
      round(col("__th"), 6).as("theta"))
  }

  /** Pooled two-proportion z-test over exactly two arms: conversion
    * rates p_a/p_b from 0/1 `successCol`, pooled p̂ under H₀, and
    * z = (p_a − p_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)). One output row; arms
    * are ordered by name so a/b assignment is deterministic. Degenerate
    * pooled rates (p̂ ∈ {0,1}) yield null z. */
  def twoProportionZ(units: DataFrame, armCol: String,
                     successCol: String): DataFrame = {
    val perArm = units
      .select(col(armCol).cast("string").as("__arm"),
        col(successCol).cast("long").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"), sum(col("__s")).as("__k"))
    // exactly two arms: min/max of the tiny per-arm table, no collect
    val wide = perArm.agg(
      countDistinct(col("__arm")).as("__arms"),
      min(struct(col("__arm"), col("__n"), col("__k"))).as("__a"),
      max(struct(col("__arm"), col("__n"), col("__k"))).as("__b"))
    val na = col("__a.__n").cast("double")
    val nb = col("__b.__n").cast("double")
    val pa = col("__a.__k").cast("double") / na
    val pb = col("__b.__k").cast("double") / nb
    val pool = (col("__a.__k") + col("__b.__k")).cast("double") / (na + nb)
    wide
      .filter(col("__arms") === 2)
      .select(
        col("__a.__arm").as("arm_a"), col("__a.__n").as("n_a"),
        col("__a.__k").as("conv_a"),
        col("__b.__arm").as("arm_b"), col("__b.__n").as("n_b"),
        col("__b.__k").as("conv_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        when(pool =!= 0.0 && pool =!= 1.0,
          round((pa - pb) / sqrt(pool * (lit(1.0) - pool)
            * (lit(1.0) / na + lit(1.0) / nb)), 6)).as("z"))
  }

  /** Difference-in-differences: the 2×2 (arm × pre/post) mean table
    * and DiD = (T̄post − T̄pre) − (C̄post − C̄pre) — the causal-effect
    * estimate when treatment wasn't randomized but both groups share a
    * trend (the parallel-trends assumption this output lets you
    * eyeball: compare the two pre means). The lexicographically
    * smaller arm is CONTROL (deterministic, caller-order-free); more
    * than two arms yields null, not a wrong number.
    *
    * One aggregation: values fix to micro-units and the four cell sums
    * accumulate in decimal(38); each mean is one double division
    * rounded 6 dp, and DiD is the same arithmetic on the unrounded
    * means. Output: one row. */
  def diffInDiff(units: DataFrame, armCol: String, postCol: String,
                 valueCol: String): DataFrame = {
    val armIds = units.select(col(armCol).cast("string").as("__arm"))
      .agg(min(col("__arm")).as("__armc"),
        countDistinct(col("__arm")).as("__narm"))
    val rows = units.select(col(armCol).cast("string").as("__arm"),
        col(postCol).cast("boolean").as("__post"),
        round(col(valueCol).cast("double") * 1e6, 0).cast("decimal(38,0)")
          .as("__vm"))
      .filter(col("__vm").isNotNull && col("__post").isNotNull)
      .crossJoin(broadcast(armIds))
      .withColumn("__isc", col("__arm") === col("__armc"))
    def cell(isC: Boolean, post: Boolean): (Column, Column) = {
      val in = (col("__isc") === isC) && (col("__post") === post)
      (sum(when(in, col("__vm"))), sum(when(in, 1L).otherwise(0L)))
    }
    val (scPre, ncPre) = cell(isC = true, post = false)
    val (scPost, ncPost) = cell(isC = true, post = true)
    val (stPre, ntPre) = cell(isC = false, post = false)
    val (stPost, ntPost) = cell(isC = false, post = true)
    val agg = rows.agg(
      max(col("__armc")).as("arm_control"),
      max(when(col("__isc") === false, col("__arm"))).as("arm_treat"),
      max(col("__narm")).as("__narm"),
      scPre.as("__scpre"), ncPre.as("__ncpre"),
      scPost.as("__scpost"), ncPost.as("__ncpost"),
      stPre.as("__stpre"), ntPre.as("__ntpre"),
      stPost.as("__stpost"), ntPost.as("__ntpost"))
    def mean(s: String, n: String): Column =
      col(s).cast("double") / 1e6 / col(n).cast("double")
    val ok = col("__narm") === 2 && col("__ncpre") > 0 && col("__ncpost") > 0 &&
      col("__ntpre") > 0 && col("__ntpost") > 0
    agg.select(col("arm_control"), col("arm_treat"),
      when(col("__ncpre") > 0, round(mean("__scpre", "__ncpre"), 6)).as("mean_c_pre"),
      when(col("__ncpost") > 0, round(mean("__scpost", "__ncpost"), 6)).as("mean_c_post"),
      when(col("__ntpre") > 0, round(mean("__stpre", "__ntpre"), 6)).as("mean_t_pre"),
      when(col("__ntpost") > 0, round(mean("__stpost", "__ntpost"), 6)).as("mean_t_post"),
      when(ok, round((mean("__stpost", "__ntpost") - mean("__stpre", "__ntpre"))
        - (mean("__scpost", "__ncpost") - mean("__scpre", "__ncpre")), 6))
        .as("did"))
  }

  /** Per-group mean with a 95% Poisson-bootstrap CI — the DISTRIBUTED
    * bootstrap (Chamandy et al., Google 2012): instead of resampling
    * n rows with replacement (which needs global coordination), each
    * row enters resample b with an independent Poisson(1) weight, a
    * pure function of phash(salt|b|id) against fixed cumulative-CDF
    * thresholds — deterministic, engine-replayable, and
    * embarrassingly parallel. B resamples = one explode + one
    * map-side-combining (group, b) aggregation; the CI is the exact
    * 2.5/97.5 percentile over the B per-resample means (a B-row
    * aggregate per group).
    *
    * Weights truncate at 8 (P(Poisson(1) > 8) < 1e-6 — negligible
    * and documented); values fix to micro-units, per-resample sums
    * accumulate in decimal(38). */
  def poissonBootstrapCi(df: DataFrame, groupCol: String, idCol: String,
                         valueCol: String, b: Int = 32,
                         salt: String = "graft-boot"): DataFrame = {
    require(b >= 8, s"poissonBootstrapCi: b=$b resamples must be >= 8")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    // The B per-row draws come from ONE compiled kernel call per row
    // (GraftPoissonWeights, bit-identical u/weight arithmetic to the
    // declarative per-(row, b) form the SQL oracle replays) and fan out
    // through posexplode — the Generate evaluates its child array ONCE,
    // so the corpus pays B raw digests per row, not B full
    // concat→md5→hex→conv expression trees (which dominated the r12
    // wall at 1.5 µs each), and never B duplicated value columns. The
    // (group, b) aggregate map-side combines to |groups|·B rows before
    // its exchange; the percentile aggregate rides a second,
    // metadata-sized one.
    val narrow = df.select(col(groupCol).as("__g"),
        col(idCol).cast("string").as("__id"),
        round(col(valueCol).cast("double") * 1e6, 0).cast("decimal(38,0)")
          .as("__vm"))
      .filter(col("__vm").isNotNull)
    // the B-digest projection is pure CPU: when the SOURCE has fewer
    // partitions than the cluster has slots (a 20 MB parquet at bench
    // scale reads as ONE split), one skinny-row exchange buys full
    // parallelism for the hash loop; at real scale inputs out-partition
    // the cluster and this is a no-op
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val base = if (narrow.rdd.getNumPartitions < slots)
      narrow.repartition(slots) else narrow
    val perB = base
      .select(col("__g"), col("__vm"),
        posexplode(graft.functions.GraftFunctions.poissonWeightsNative(
          lit(salt), col("__id"), lit(b))).as(Seq("__b", "__w")))
      .groupBy(col("__g"), col("__b"))
      .agg(sum(col("__vm") * col("__w")).as("__s"),
        sum(col("__w")).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__mean",
        col("__s").cast("double") / 1e6 / col("__n").cast("double"))
    perB.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_resamples"),
        round(expr("percentile(__mean, 0.5)"), 6).as("mean_med"),
        round(expr("percentile(__mean, 0.025)"), 6).as("lo95"),
        round(expr("percentile(__mean, 0.975)"), 6).as("hi95"))
      .withColumnRenamed("__g", groupCol)
  }

  /** Two-proportion power analysis from OBSERVED data: per arm-pairable
    * metric (here the observed base rate of each group), the minimum
    * per-arm sample size to detect a relative lift `mde` at 5%
    * two-sided significance and 80% power —
    * n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁ + p₂q₂))² / (p₂−p₁)²
    * (Fleiss, Statistical Methods for Rates and Proportions). The
    * planning companion to [[twoProportionZ]]: that one judges an
    * experiment after the fact; this one says how much traffic the
    * NEXT one needs, per segment, straight off the segment's live rate.
    *
    * The normal quantiles are fixed literals (z = 1.959964, 0.841621)
    * shared verbatim with the oracle — neither engine has an inverse
    * normal. Counts are exact longs; the sizing formula is one
    * fixed-shape double expression, ceil'd to a whole unit. Output: one
    * row per group (n, base_rate, target_rate, n_per_arm); null when
    * the base rate is degenerate (0, 1) or the lifted rate leaves
    * (0, 1). */
  def powerAnalysis(units: DataFrame, groupCol: String, successCol: String,
                    mde: Double = 0.05): DataFrame = {
    require(mde > 0, s"powerAnalysis: mde=$mde must be > 0")
    val zA = 1.959964 // Phi^-1(0.975)
    val zB = 0.841621 // Phi^-1(0.80)
    val per = units
      .select(col(groupCol).as("__g"),
        when(col(successCol).cast("boolean"), 1L).otherwise(0L).as("__s"))
      .filter(col(successCol).isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("__k"))
    val p1 = col("__k").cast("double") / col("n").cast("double")
    val p2 = p1 * (1.0 + mde)
    val pBar = (p1 + p2) / 2
    val num = lit(zA) * sqrt(lit(2.0) * pBar * (lit(1.0) - pBar)) +
      lit(zB) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2))
    val d = p2 - p1
    per.select(col("__g").as(groupCol), col("n"),
      round(p1, 6).as("base_rate"),
      round(p2, 6).as("target_rate"),
      when(p1 > 0 && p1 < 1 && p2 > 0 && p2 < 1,
        ceil(num * num / (d * d)).cast("long")).as("n_per_arm"))
  }
}
