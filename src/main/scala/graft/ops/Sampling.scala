package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, hash-based sampling and splitting — how a 100 TB corpus
  * is downsampled REPRODUCIBLY. `df.sample()` draws from a per-partition
  * RNG: the result changes with partitioning, retries, and engine, so
  * neither an external oracle nor a rerun can reproduce it. Hashing the
  * row KEY instead makes membership a pure function of the data: stable
  * under repartitioning, shuffle-free (a scan-side predicate), portable
  * to any engine, and consistent across tables (every derived table
  * samples the same keys).
  *
  * Bucket = portable 60-bit md5 hash of "salt|key" mod 1e6; a fraction f
  * keeps buckets < f·1e6 (granularity 1e-6; salt decorrelates independent
  * samples drawn from the same keys).
  */
object Sampling {

  private val Buckets = 1000000L

  /** The [0, 1e6) sampling bucket of a key under a salt. */
  def bucket(key: Column, salt: String): Column =
    pmod(PortableHash.phash(concat_ws("|", lit(salt), key.cast("string"))), lit(Buckets))

  /** Keep a deterministic `fraction` of rows by key hash. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 salt: String = "graft-sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    df.filter(bucket(col(keyCol), salt) < (fraction * Buckets).toLong)
  }

  /** Stratified deterministic sampling: per-stratum fractions with a
    * default for unlisted strata. The fractions table broadcasts (strata
    * are few); membership stays a scan-side predicate after the join. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, stratumCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double,
                           salt: String = "graft-sample"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fracs = fractions.toSeq.toDF(stratumCol, "__frac")
    df.join(broadcast(fracs), Seq(stratumCol), "left")
      .withColumn("__keep",
        (coalesce(col("__frac"), lit(defaultFraction)) * Buckets).cast("long"))
      .filter(bucket(col(keyCol), salt) < col("__keep"))
      .drop("__frac", "__keep")
  }

  /** x^alpha with bit-exact routing for the common exponents: sqrt (and
    * the identity) are correctly-rounded IEEE ops in every engine, so an
    * external oracle replays them exactly; general `pow` is libm-bound
    * (last-ulp differences across platforms are possible). */
  private def powExact(x: Column, alpha: Double): Column =
    if (alpha == 0.5) sqrt(x)
    else if (alpha == 1.0) x
    else pow(x, alpha)

  /** Temperature-flattened stratified sampling — the multilingual-corpus
    * rebalancing rule of XLM/XLM-R (Conneau & Lample 2019, Conneau et al.
    * 2020): a stratum (language) with share p_l is resampled toward the
    * flattened target share q_l ∝ p_l^alpha, so `alpha = 1` preserves the
    * natural distribution, `alpha → 0` approaches uniform, and the usual
    * `alpha ∈ [0.3, 0.7]` up-weights low-resource strata. Per-stratum keep
    * rate: r_l = min(1, targetFraction · N · q_l / n_l), with membership
    * decided by the deterministic key hash ([[bucket]]) — reproducible
    * under repartitioning and replayable by an external engine.
    *
    * q_l is computed as n_l^alpha / Σ n_l^alpha (the N^alpha factor
    * cancels, avoiding an extra division). Rates round to 1e-6 before
    * thresholding so a last-ulp difference in the stratum-sum cannot
    * flip a membership decision except exactly on a rounding boundary.
    *
    * Scale: one count aggregation over the corpus (map-side combined,
    * |strata| output rows), a broadcast join of the tiny rate table, and
    * a scan-side hash predicate — no corpus shuffle. The window below
    * runs single-partition over the RATE TABLE (|strata| rows), never
    * over data. */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
                        alpha: Double, targetFraction: Double,
                        salt: String = "graft-temp"): DataFrame = {
    require(alpha > 0, s"alpha $alpha must be positive")
    require(targetFraction >= 0 && targetFraction <= 1,
      s"targetFraction $targetFraction outside [0,1]")
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val counts = df.groupBy(stratumCol)
      .agg(count(lit(1)).cast("double").as("__n"))
    val rates = counts
      .withColumn("__q", powExact(col("__n"), alpha)
        / sum(powExact(col("__n"), alpha)).over(w))
      .withColumn("__rate", least(lit(1.0),
        lit(targetFraction) * sum(col("__n")).over(w) * col("__q") / col("__n")))
      .select(col(stratumCol),
        round(col("__rate") * Buckets, 0).cast("long").as("__thr"))
    df.join(broadcast(rates), Seq(stratumCol))
      .filter(bucket(col(keyCol), salt) < col("__thr"))
      .drop("__thr")
  }

  /** Efraimidis–Spirakis priority key for weighted sampling WITHOUT
    * replacement ("Weighted random sampling with a reservoir", Inf.
    * Process. Lett. 2006): key = u^(1/w) with u the row key's
    * deterministic hash-uniform — the k largest keys are distributed
    * exactly as k weight-proportional draws without replacement. The key
    * is rounded to 1e-9 before ranking (ties then break on the row key)
    * so a last-ulp `pow` difference between engines cannot reorder the
    * selection boundary — same guard as [[temperatureSample]]'s rate
    * rounding. Non-positive weights are forced to key 0 explicitly:
    * u^(1/w) -> 0 only for w = 0 (1/0 = +Inf, u < 1), while w < 0 would
    * give u^(1/w) > 1 and spuriously OUTRANK every positive weight, so
    * the guard is what makes "never win" true for both cases. */
  private def esKey(key: Column, weight: Column, salt: String): Column =
    when(weight <= 0, lit(0.0)).otherwise(
      round(pow(PortableHash.puniform(
        concat_ws("|", lit(salt), key.cast("string"))), lit(1.0) / weight), 9))

  /** k-item weighted sample without replacement, deterministic in
    * (key, salt). Zero or negative weights never win (key forced to 0).
    *
    * Scale: order-by-limit compiles to TakeOrderedAndProject — every
    * partition keeps a local k-heap and only k rows per partition reach
    * the driver-side merge; no global sort, no full shuffle. This is the
    * distributed form of the reservoir algorithm the paper describes
    * (the heap IS the reservoir; hash-uniforms replace the RNG). */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int,
                     salt: String = "graft-wsample"): DataFrame =
    df.withColumn("__wk", esKey(col(keyCol), col(weightCol), salt))
      .orderBy(col("__wk").desc, col(keyCol))
      .limit(k)
      .drop("__wk")

  /** Per-stratum k-item weighted sample without replacement: one shuffle
    * on the stratum key feeding a windowed row_number — the reservoir
    * runs once per stratum. */
  def weightedSampleStratified(df: DataFrame, keyCol: String, weightCol: String,
                               stratumCol: String, k: Int,
                               salt: String = "graft-wsample"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(col("__wk").desc, col(keyCol))
    df.withColumn("__wk", esKey(col(keyCol), col(weightCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__wk", "__rn")
  }

  /** Rebalance a corpus to TARGET domain proportions without upsampling
    * — the "data mixture" step of training-corpus assembly (the weighted
    * source mixes of GPT-3 / The Pile dataset cards): given per-mille
    * target weights, find the LARGEST total size at which every domain
    * can meet its share from existing rows (size = min over domains of
    * floor(n_d·1000/w_d)), take quota_d = floor(size·w_d/1000) rows per
    * domain, and select each domain's quota deterministically by key
    * hash (smallest [[bucket]] first, key tie-break) — so the mix is
    * reproducible and an external engine replays it row-for-row. All
    * quota arithmetic is integral: no float share can drift.
    *
    * Every weighted domain must appear in the corpus (a missing domain
    * caps the achievable size at 0 — returned empty, not inferred);
    * rows from domains OUTSIDE the weight map are dropped.
    *
    * Scale: one map-side-combined count per domain (|domains| rows; the
    * quota table broadcasts), then one rank window per domain — one
    * exchange on the domain key. With few huge domains that rank is the
    * skew point; the at-scale refinement is a per-domain hash-bucket
    * THRESHOLD read from a grouped bottom-k sketch
    * ([[Sketches.quantileSketchGrouped]] over the bucket values: u at
    * rank quota_d), which turns selection into a scan-side predicate at
    * the cost of a ±sketch-error quota. The exact form is implemented
    * here; the window limit only pushes map-side when literal, so the
    * sketch route is the one that survives a single-domain 100 TB skew.
    */
  def mixtureRebalance(df: DataFrame, domainCol: String, keyCol: String,
                       weightsPerMille: Map[String, Int],
                       salt: String = "graft-mix"): DataFrame = {
    require(weightsPerMille.nonEmpty && weightsPerMille.values.forall(_ > 0),
      "weights must be positive")
    require(weightsPerMille.values.sum == 1000,
      s"weights must sum to 1000 per-mille, got ${weightsPerMille.values.sum}")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPerMille.toSeq.toDF(domainCol, "__w")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("__n"))
    // left join FROM weights: a weighted domain absent from the corpus
    // must contribute cap 0, not silently vanish from the min.
    val size = w.join(counts, Seq(domainCol), "left")
      .select(expr("(coalesce(__n, 0L) * 1000) div __w").as("__cap"))
      .agg(min("__cap").as("__size"))
    val quotas = w.crossJoin(size)
      .select(col(domainCol), expr("(__size * __w) div 1000").as("__q"))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(domainCol)
      .orderBy(bucket(col(keyCol), salt), col(keyCol))
    df.join(broadcast(quotas), Seq(domainCol))
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= col("__q"))
      .drop("__rn", "__q")
  }

  /** Deterministic train/val/test-style split: label each row by which
    * cumulative-weight interval its hash bucket falls in. Weights must
    * sum to 1 (±1e-9). Same key + salt → same split, forever, on any
    * engine — the reproducibility contract dataset cards promise. */
  def hashSplit(df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
                salt: String = "graft-split", outCol: String = "split"): DataFrame = {
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
    val b = bucket(col(keyCol), salt)
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val expr = weights.zip(cum).init.foldRight(lit(weights.last._1)) {
      case (((name, _), hi), els) => when(b < (hi * Buckets).toLong, name).otherwise(els)
    }
    df.withColumn(outCol, expr)
  }

  /** Deterministic k-fold assignment by key hash — [[hashSplit]]'s
    * cross-validation sibling: fold = phash(salt|key) mod k, a pure
    * scan-side projection (no shuffle, portable to any engine, stable
    * under repartitioning), so every derived table folds the same keys
    * together and fold i's train/test sets are reproducible without
    * storing an assignment table. */
  def kFoldAssign(df: DataFrame, keyCol: String, k: Int,
                  salt: String = "graft-fold",
                  outCol: String = "fold"): DataFrame = {
    require(k >= 2, s"kFoldAssign: k=$k must be >= 2")
    df.withColumn(outCol,
      pmod(PortableHash.phash(
        concat_ws("|", lit(salt), col(keyCol).cast("string"))), lit(k.toLong)))
  }

  /** Deterministic negative sampling for training pairs: for every
    * (anchor, positive) row, draw `k` pseudo-random candidates from the
    * item universe by hashing (salt|anchor|j) into the universe's dense
    * rank space, then anti-join the anchor's OBSERVED positives away —
    * the contrastive-training companion of [[hashSplit]] (recsys /
    * embedding losses need negatives, and an RNG draw would be
    * irreproducible across retries, engines, and partitionings; this
    * is a pure function of the keys).
    *
    * Collisions with a positive are DROPPED, not resampled (expected
    * loss k·|positives(anchor)|/|universe| — negligible when the
    * universe is large, and documented rather than hidden behind an
    * unbounded retry loop). Draws j and j' can collide with each other
    * too; `distinct` keeps one (same argument). So `n_neg ≤ k` per
    * anchor, with equality in the common case.
    *
    * Scale: the universe gets dense ranks once (the rank-offset scheme
    * — no global sort); candidates explode k per anchor, join the
    * universe on the rank key, and anti-join positives on
    * (anchor, item) — all hash equi-joins on uniform keys. */
  def negativeSample(positives: DataFrame, anchorCol: String, itemCol: String,
                     universe: DataFrame, universeItemCol: String, k: Int,
                     salt: String = "graft-neg"): DataFrame = {
    require(k >= 1, s"negativeSample: k=$k must be >= 1")
    val items = universe.select(col(universeItemCol).as("__item")).distinct()
    val bounds = items.agg(count(lit(1)).as("__n"))
    // dense 0-based rank via the bucket scheme (monotone md5 prefix)
    val ranked = Ranking.globalRowNumber(
      items.withColumn("__h", md5(col("__item").cast("string"))),
      Seq("__h", "__item"), substring(col("__h"), 1, 2), "__r")
      .select((col("__r") - 1).as("__r"), col("__item"))
    val anchors = positives.select(col(anchorCol).as("__a")).distinct()
      .crossJoin(broadcast(bounds))
      // an empty universe would make the pmod below a modulo-by-zero
      // (ANSI runtime error); with the filter it yields zero rows,
      // which IS the right answer for "sample from nothing"
      .filter(col("__n") > 0)
    val cands = anchors
      .withColumn("__j", explode(array((0 until k).map(lit): _*)))
      .withColumn("__r",
        pmod(graft.functions.PortableHash.phash(
          concat_ws("|", lit(salt), col("__a").cast("string"),
            col("__j").cast("string"))), col("__n")))
      .select(col("__a"), col("__r"))
      .distinct()
    cands.join(ranked, Seq("__r"))
      .join(positives.select(col(anchorCol).as("__a"),
          col(itemCol).as("__item")).distinct(),
        Seq("__a", "__item"), "left_anti")
      .select(col("__a").as(anchorCol), col("__item").as("negative"))
  }

  /** Deterministic global training shuffle: assign each row a shard
    * (`pmod(hash, nShards)`) and a position within its shard (rank by the
    * portable hash, ties on the key) — the "shuffle once, read in order"
    * layout every epoch-stable training loader wants. Reading shards
    * 0..n-1 sequentially replays one fixed hash-uniform permutation of
    * the corpus: same keys + salt → same order, on any engine, under any
    * input partitioning.
    *
    * Scale: one exchange on the shard key; each shard ranks
    * independently inside its partition (window PARTITIONED by shard —
    * no global sort). `nShards` is the parallelism knob: size it so a
    * shard (corpus/nShards rows) sorts in one executor's memory; the
    * at-scale default is thousands of shards, not this demo's handful.
    * Collision note: ordering ties on (hash, key) are totally ordered,
    * so duplicate hash values cannot make the order partition-dependent. */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  salt: String = "graft-shard"): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be positive")
    val h = PortableHash.phash(
      concat_ws("|", lit(salt), col(keyCol).cast("string")))
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(rankW).cast("long"))
      .drop("__h")
  }

  /** Deterministic GLOBAL shuffle for training order: every row gets its
    * exact position in a pseudo-random permutation of the corpus, plus
    * the contiguous shard/offset a sequential trainer reads. [[shardAssign]]
    * randomizes shard MEMBERSHIP; this fixes the full epoch-read ORDER —
    * the "shuffle once, stream shards sequentially" layout, reproducible
    * across runs, engines, and repartitioning because the permutation
    * key is the portable md5 of (salt|id), not an RNG.
    *
    * Scale: the exact global position uses the rank-offset scheme
    * ([[Ranking.globalRowNumber]]) with the key's leading two hex chars
    * as the 256-way monotone bucket — no single-partition sort; the only
    * serial step is the 256-row offset prefix sum. */
  def shuffleOrder(df: DataFrame, idCol: String, shardSize: Long,
                   salt: String = "graft-epoch"): DataFrame = {
    require(shardSize >= 1, s"shardSize $shardSize must be positive")
    val keyed = df.withColumn("__sk",
      md5(concat_ws("|", lit(salt), col(idCol).cast("string"))))
    Ranking.globalRowNumber(keyed, Seq("__sk", idCol),
        bucketExpr = substring(col("__sk"), 1, 2), outCol = "global_pos")
      .withColumn("global_pos", col("global_pos").cast("long"))
      .withColumn("shard", (col("global_pos") - 1) / lit(shardSize))
      .withColumn("shard", floor(col("shard")).cast("long"))
      .withColumn("offset", pmod(col("global_pos") - 1, lit(shardSize)))
      .drop("__sk")
  }

  /** Per-domain token quota — the Common-Crawl-style curation rule "no
    * single site contributes more than `budget` tokens": within each
    * domain, documents rank by the portable hash of (salt, key) — an
    * unbiased, reproducible shuffle, so the kept prefix is a uniform
    * sample of the domain, not its earliest or longest pages — and a doc
    * survives while the cumulative token count THROUGH ITSELF stays
    * within the budget (strict quota: a doc that would overflow it is
    * dropped, as is everything after it in hash order). Appends
    * `cum_tokens` (the inclusive running total) to the kept rows.
    *
    * Scale: one exchange on the domain key feeding a windowed running
    * sum — per-domain state only; the filter is scan-side after the
    * window. A pathological mega-domain funnels through one task; that
    * is inherent to an exact per-domain prefix (the quota is tiny by
    * construction, so the window input can be pre-truncated by any
    * upper bound on docs-per-budget if a domain is genuinely hot). */
  def domainTokenQuota(df: DataFrame, keyCol: String, domainCol: String,
                       tokenCol: String, budget: Long,
                       salt: String = "graft-quota"): DataFrame = {
    require(budget >= 1, s"budget $budget must be positive")
    val hv = PortableHash.phash(
      concat_ws("|", lit(salt), col(keyCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col("__hv"), col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__hv", hv)
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w).cast("long"))
      .filter(col("cum_tokens") <= budget)
      .drop("__hv")
  }

  /** Token-balanced shard assignment by snake (boustrophedon) dealing:
    * sort documents by token count DESCENDING (key tiebreak) and deal
    * them across `nShards` shards in alternating direction — rank r maps
    * to shard r%S on even passes and S−1−(r%S) on odd passes. The
    * classic deterministic near-LPT heuristic for equalizing per-shard
    * token totals when a trainer reads whole shards (plain hash
    * assignment balances COUNTS, not tokens; one shard catching the long
    * tail of a skewed length distribution becomes the epoch straggler).
    * Appends `rank` (0-based global) and `shard`.
    *
    * Scale: the global descending rank uses the rank-offset scheme
    * ([[Ranking.globalRowNumber]]) over the NEGATED token count with a
    * coarse monotone bucket — no single-partition sort; the serial step
    * is the bucket-count offset table. */
  def snakeShards(df: DataFrame, keyCol: String, tokenCol: String,
                  nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be positive")
    val keyed = df.withColumn("__negt", -col(tokenCol).cast("long"))
    Ranking.globalRowNumber(keyed, Seq("__negt", keyCol),
        bucketExpr = floor(col("__negt") / lit(16L)), outCol = "rank")
      .withColumn("rank", col("rank").cast("long") - 1)
      .withColumn("shard",
        when(pmod(floor(col("rank") / nShards), lit(2L)) === 0,
          pmod(col("rank"), lit(nShards.toLong)))
        .otherwise(lit(nShards.toLong) - 1 - pmod(col("rank"), lit(nShards.toLong))))
      .drop("__negt")
  }

  /** Neyman-optimal allocation of a fixed audit/eval budget across
    * strata (Neyman 1934): n_h ∝ N_h·S_h — big AND variable strata get
    * more of the human-eval or recheck budget, uniform strata less; the
    * variance-minimizing split a fixed-size labeling campaign should
    * use instead of proportional allocation. Integerization is the
    * deterministic largest-remainder method (floor everyone, hand the
    * leftover seats to the largest fractional remainders, stratum-asc
    * ties), then capped at the stratum size (a stratum can't supply
    * more rows than it has; the cap is reported, not silently
    * redistributed). Output: (stratum, n_rows, sd, n_alloc).
    *
    * Determinism: decimal moments → sd rounded 6 dp → weights as exact
    * micro-longs; quotas and remainders are exact decimal arithmetic;
    * the remainder ranking is total-ordered. One data aggregation to k
    * stratum rows; every window here runs over those k rows. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
                       budget: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 1, s"neymanAllocation: budget=$budget must be >= 1")
    val all = df.select(col(stratumCol).as("__h"), col(valueCol).cast("double").as("__v"))
      .filter(col("__h").isNotNull && col("__v").isNotNull)
      .groupBy(col("__h")).agg(
        count(lit(1)).as("__n"),
        sum(col("__v").cast("decimal(28,6)")).cast("double").as("__s"),
        sum((col("__v") * col("__v")).cast("decimal(38,12)")).cast("double").as("__ss"))
      // sd needs n >= 2; a single-row stratum still appears in the
      // report (sd null, n_alloc 0) instead of silently vanishing
      .withColumn("sd", when(col("__n") > 1,
        round(sqrt((col("__ss") - col("__s") * col("__s") / col("__n"))
          / (col("__n") - 1)), 6)))
    val g = all.filter(col("__n") > 1)
      .withColumn("__w", round(col("__n") * col("sd") * 1e6, 0).cast("decimal(28,0)"))
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy(col("__rem").desc, col("__h"))
    val alloc = g.withColumn("__wt", sum(col("__w")).over(wAll))
      .filter(col("__wt") > 0)
      // exact rational quota: integral (budget·w) div Σw and its exact
      // remainder — all decimal, no float quotient near-integer hazard
      .withColumn("__bw", lit(budget.toLong) * col("__w"))
      .withColumn("__q", expr("__bw div __wt"))
      .withColumn("__rem", col("__bw") - col("__q") * col("__wt"))
      .withColumn("__left", lit(budget.toLong) - sum(col("__q")).over(wAll))
      .withColumn("__rk", row_number().over(wRem))
      .select(col("__h"),
        least(col("__q") + when(col("__rk") <= col("__left"), 1L).otherwise(0L),
          col("__n")).as("__alloc"))
    // every stratum reports: excluded ones (n=1, or an all-zero-sd
    // weight table) carry n_alloc 0 — dropped cases are visible, never
    // silently redistributed
    all.join(alloc, Seq("__h"), "left")
      .select(col("__h").as(stratumCol), col("__n").as("n_rows"), col("sd"),
        coalesce(col("__alloc"), lit(0L)).as("n_alloc"))
  }

  /** Mixture ALLOCATION under availability caps — deterministic
    * water-filling: given per-domain availability `a` (tokens) and
    * target mixture shares `t` (micro-units of 1e6), split a budget
    * T = Σa · budgetMicroOfTotal / 1e6 so each domain gets
    * x = min(a, λ·t) with Σx ≈ T — the planning step a training-data
    * mixer runs BEFORE drawing anything ("we want 30% web / 20% code /
    * … but code only has 40B tokens — who absorbs the slack?"). Domains
    * whose availability binds are `capped` and surrender their slack to
    * the rest proportionally by target share.
    *
    * Exact-integer protocol: domains sort by the integer quotient
    * (a·1e6) div t (scarcity order, domain-asc ties); a domain is
    * capped iff a·(1e6 − cumT) ≤ (T − cumA)·t over the strictly-prior
    * prefix (cross-multiplied — no float λ ever materializes); uncapped
    * domains get (t·(T − Σ_capped a)) div (1e6 − Σ_capped t), clamped
    * to [0, a]. Every step is integer arithmetic over the pinned order,
    * so the allocation replays bit-for-bit externally. Floor losses
    * leave Σx ≤ T by at most one token per domain. Contracts are
    * ENFORCED, not assumed: per-domain and total target ≤ 1e6,
    * per-domain and total availability ≤ 1e12 (keeps every
    * cross-product inside a long) all raise on violation, and
    * duplicate target rows dedup by max instead of fanning out the
    * join.
    *
    * Scale: the windows run over the DOMAIN table (a curated mixture
    * spec — tens to thousands of rows), never over data; availability
    * aggregation upstream is the caller's one data-sized pass. */
  def mixtureAllocation(avail: DataFrame, domainCol: String, availCol: String,
                        targets: DataFrame, targetMicroCol: String,
                        budgetMicroOfTotal: Long): DataFrame = {
    require(budgetMicroOfTotal > 0 && budgetMicroOfTotal <= 1000000L,
      s"mixtureAllocation: budgetMicroOfTotal=$budgetMicroOfTotal outside (0, 1e6]")
    import org.apache.spark.sql.expressions.Window
    // enforce the documented contracts instead of assuming them (the
    // pageRankEdgeWeighted pattern): duplicate target rows would fan out
    // the join (dedup by max), a target > 1e6 makes (1e6 - cumT) go
    // negative and silently flips the cross-multiplied cap test, and
    // availability past 1e12 overflows the (__a * 1e6) scarcity quotient
    val t1 = targets
      .select(col(domainCol).as("domain"),
        col(targetMicroCol).cast("long").as("__t"))
      .groupBy("domain").agg(max(col("__t")).as("__t"))
      .withColumn("__t",
        when(col("__t") > 1000000L,
          raise_error(lit("mixtureAllocation: target_micro > 1e6")))
          .otherwise(col("__t")))
    val d = avail
      .select(col(domainCol).as("domain"), col(availCol).cast("long").as("__a"))
      .filter(col("__a") >= 0)
      .withColumn("__a",
        when(col("__a") > 1000000000000L,
          raise_error(lit("mixtureAllocation: availability > 1e12")))
          .otherwise(col("__a")))
      .join(t1, Seq("domain"))
      .filter(col("__t") > 0)
    val wAll = Window.partitionBy()
    val ord = Window.partitionBy()
      .orderBy(expr("(__a * 1000000) div __t"), col("domain"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    val flagged = d
      // total-contract guards (window sums over the domain table —
      // metadata scale): Σtargets beyond 1e6 breaks the water-filling
      // algebra; Σavailability beyond 1e12 overflows the budget
      // cross-products
      .withColumn("__tt", sum(col("__t")).over(wAll))
      .withColumn("__t",
        when(col("__tt") > 1000000L,
          raise_error(lit("mixtureAllocation: sum of target_micro > 1e6")))
          .otherwise(col("__t")))
      .withColumn("__at", sum(col("__a")).over(wAll))
      .withColumn("__a",
        when(col("__at") > 1000000000000L,
          raise_error(lit("mixtureAllocation: sum of availability > 1e12")))
          .otherwise(col("__a")))
      .drop("__tt", "__at")
      // NB: "__bud", not "__T" — Spark resolves column names
      // case-insensitively, so "__T" would silently REPLACE "__t"
      .withColumn("__bud",
        expr(s"(sum(__a) over ()) * $budgetMicroOfTotal div 1000000"))
      .withColumn("__cumA", coalesce(sum(col("__a")).over(prior), lit(0L)))
      .withColumn("__cumT", coalesce(sum(col("__t")).over(prior), lit(0L)))
      .withColumn("capped",
        col("__a") * (lit(1000000L) - col("__cumT")) <=
          (col("__bud") - col("__cumA")) * col("__t"))
    flagged
      .withColumn("__capA",
        coalesce(sum(when(col("capped"), col("__a"))).over(wAll), lit(0L)))
      .withColumn("__capT",
        coalesce(sum(when(col("capped"), col("__t"))).over(wAll), lit(0L)))
      .select(col("domain"), col("__a").as("available"),
        col("__t").as("target_micro"), col("capped"),
        when(col("capped"), col("__a"))
          .otherwise(least(col("__a"), greatest(lit(0L),
            expr("(__t * (__bud - __capA)) div greatest(1000000 - __capT, 1)"))))
          .as("allocated"))
  }

  /** DoReMi-style domain-weight update (Xie et al. 2023, "DoReMi"), the
    * LEARNING step beside [[mixtureAllocation]]'s planning step: given
    * current domain weights and each domain's EXCESS LOSS (how much
    * worse the proxy model does there than the reference — the signal
    * that the domain is under-trained), up-weight the hard domains
    * multiplicatively and renormalize. DoReMi's update is
    * w'(d) ∝ w(d)·exp(η·excess(d)); this uses the LINEARIZED
    * multiplicative-weights form of the same Hedge family,
    *
    *   m(d) = w(d) · (1e6 + (η_micro·excess_micro(d)) div 1e6)
    *
    * because exp is a libm call whose last-ulp behavior differs across
    * engines while the linear factor is exact long arithmetic (for the
    * small per-step η these updates run at, exp(x) ≈ 1+x anyway).
    * Renormalization to Σ = 1e6 is the exact largest-remainder method
    * ([[neymanAllocation]]'s idiom): quota q(d) = (m(d)·1e6) div Σm,
    * exact remainder r(d) = m(d)·1e6 − q(d)·Σm, and the
    * 1e6 − Σq leftover units go to the largest remainders (domain-asc
    * ties) — so the output shares are integers summing to EXACTLY 1e6,
    * bit-replayable externally.
    *
    * Inputs: `weights` (domain, w — any nonneg integer scale, it is
    * renormalized), `losses` (domain, excess micro-units; domains
    * absent from `losses` count as excess 0; duplicates dedup by max).
    * Contracts enforced: 0 ≤ η_micro ≤ 1e6, excess_micro ≤ 1e6, w ≤
    * 1e12 (keeps m·1e6 inside a long). Output: (domain, w_in,
    * excess_micro, w_new_micro), Σ w_new_micro = 1e6.
    *
    * Scale: everything windows over the DOMAIN table (a mixture spec —
    * tens to thousands of rows); the data-sized loss aggregation
    * upstream is the caller's pass. */
  def mixtureWeightUpdate(weights: DataFrame, domainCol: String, wCol: String,
                          losses: DataFrame, excessMicroCol: String,
                          etaMicro: Long): DataFrame = {
    require(etaMicro >= 0 && etaMicro <= 1000000L,
      s"mixtureWeightUpdate: etaMicro=$etaMicro outside [0, 1e6]")
    import org.apache.spark.sql.expressions.Window
    val ls = losses
      .select(col(domainCol).as("domain"),
        col(excessMicroCol).cast("long").as("__x"))
      .groupBy("domain").agg(max(col("__x")).as("__x"))
      .withColumn("__x",
        when(col("__x") > 1000000L,
          raise_error(lit("mixtureWeightUpdate: excess_micro > 1e6")))
          .otherwise(greatest(col("__x"), lit(0L))))
    val d = weights
      .select(col(domainCol).as("domain"), col(wCol).cast("long").as("__w"))
      .filter(col("__w") > 0)
      .withColumn("__w",
        when(col("__w") > 1000000000000L,
          raise_error(lit("mixtureWeightUpdate: weight > 1e12")))
          .otherwise(col("__w")))
      .join(ls, Seq("domain"), "left")
      .withColumn("__x", coalesce(col("__x"), lit(0L)))
      // factor ≤ 2e6, w ≤ 1e12 → m ≤ 2e18? no: m·1e6 is the hazard —
      // bound m by rescaling is the caller's job; with w ≤ 1e12 and
      // factor ≤ 2e6 the product m = w·factor div 1e6 ≤ 2e12, and
      // m·1e6 ≤ 2e18 stays inside a long
      .withColumn("__m",
        expr(s"(__w * (1000000 + ($etaMicro * __x) div 1000000)) div 1000000"))
    val wAll = Window.partitionBy()
    val wRem = Window.orderBy(col("__rem").desc, col("domain"))
    d.withColumn("__s", sum(col("__m")).over(wAll))
      .filter(col("__s") > 0)
      .withColumn("__q", expr("(__m * 1000000) div __s"))
      .withColumn("__rem", col("__m") * 1000000L - col("__q") * col("__s"))
      .withColumn("__left", lit(1000000L) - sum(col("__q")).over(wAll))
      .withColumn("__rk", row_number().over(wRem))
      .select(col("domain"), col("__w").as("w_in"),
        col("__x").as("excess_micro"),
        (col("__q") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("w_new_micro"))
  }

  /** Data-constrained EPOCH (repetition) allocation — the accounting
    * step from the data-constrained-scaling literature (Muennighoff et
    * al. 2023): when the training budget exceeds what a domain can
    * supply in unique tokens, the domain repeats — and the planner
    * needs to see, per domain, how many epochs that is and how much of
    * its target went unserved, BEFORE the run starts. Completes the
    * mixture family: [[mixtureAllocation]] splits a budget under
    * availability caps at ≤ 1 epoch, [[mixtureWeightUpdate]] learns the
    * shares; this one prices the multi-epoch regime.
    *
    * Exact-integer protocol (all micro-unit longs, integral division):
    *
    *   budget  = (Σa · budgetMicroOfAvail) div 1e6   (tokens)
    *   want(d) = (budget · t(d)) div 1e6
    *   cap(d)  = (a(d) · maxEpochsMicro) div 1e6
    *   served  = min(want, cap);   epochs_micro = (served·1e6) div a
    *
    * repeated = served − min(a, served) (tokens past the first pass),
    * shortfall = want − served (target tokens the cap refused). The
    * budget is expressed as micro-units OF TOTAL AVAILABILITY (3e6 =
    * "train for 3× the corpus") so the capped/uncapped mix is
    * scale-invariant — the same spec exercises both branches at any SF.
    *
    * Contracts ENFORCED ([[mixtureAllocation]]'s discipline): targets
    * dedup by max, per-domain/total target ≤ 1e6, per-domain/total
    * availability ≤ 1e12, budgetMicroOfAvail and maxEpochsMicro in
    * (0, 8e6] — every cross-product then stays ≤ 8e18, inside a long.
    * Output: (domain, available, target_micro, want_tokens,
    * served_tokens, epochs_micro, repeated_tokens, shortfall_tokens).
    *
    * Scale: pure arithmetic over the DOMAIN table (a mixture spec);
    * the availability aggregation upstream is the caller's one
    * data-sized pass. */
  def epochAllocation(avail: DataFrame, domainCol: String, availCol: String,
                      targets: DataFrame, targetMicroCol: String,
                      budgetMicroOfAvail: Long, maxEpochsMicro: Long): DataFrame = {
    require(budgetMicroOfAvail > 0 && budgetMicroOfAvail <= 8000000L,
      s"epochAllocation: budgetMicroOfAvail=$budgetMicroOfAvail outside (0, 8e6]")
    require(maxEpochsMicro > 0 && maxEpochsMicro <= 8000000L,
      s"epochAllocation: maxEpochsMicro=$maxEpochsMicro outside (0, 8e6]")
    import org.apache.spark.sql.expressions.Window
    val t1 = targets
      .select(col(domainCol).as("domain"),
        col(targetMicroCol).cast("long").as("__t"))
      .groupBy("domain").agg(max(col("__t")).as("__t"))
      .withColumn("__t",
        when(col("__t") > 1000000L,
          raise_error(lit("epochAllocation: target_micro > 1e6")))
          .otherwise(col("__t")))
    val wAll = Window.partitionBy()
    avail
      .select(col(domainCol).as("domain"), col(availCol).cast("long").as("__a"))
      .filter(col("__a") >= 0)
      .withColumn("__a",
        when(col("__a") > 1000000000000L,
          raise_error(lit("epochAllocation: availability > 1e12")))
          .otherwise(col("__a")))
      .join(t1, Seq("domain"))
      .filter(col("__t") > 0)
      .withColumn("__tt", sum(col("__t")).over(wAll))
      .withColumn("__t",
        when(col("__tt") > 1000000L,
          raise_error(lit("epochAllocation: sum of target_micro > 1e6")))
          .otherwise(col("__t")))
      .withColumn("__at", sum(col("__a")).over(wAll))
      .withColumn("__a",
        when(col("__at") > 1000000000000L,
          raise_error(lit("epochAllocation: sum of availability > 1e12")))
          .otherwise(col("__a")))
      .withColumn("__bud",
        expr(s"((sum(__a) over ()) * $budgetMicroOfAvail) div 1000000"))
      .withColumn("__want", expr("(__bud * __t) div 1000000"))
      .withColumn("__cap", expr(s"(__a * $maxEpochsMicro) div 1000000"))
      .withColumn("__served", least(col("__want"), col("__cap")))
      .select(col("domain"), col("__a").as("available"),
        col("__t").as("target_micro"), col("__want").as("want_tokens"),
        col("__served").as("served_tokens"),
        when(col("__a") > 0, expr("(__served * 1000000) div __a"))
          .otherwise(lit(0L)).as("epochs_micro"),
        (col("__served") - least(col("__a"), col("__served")))
          .as("repeated_tokens"),
        (col("__want") - col("__served")).as("shortfall_tokens"))
  }
}
