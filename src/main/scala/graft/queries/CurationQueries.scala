package graft.queries

import graft.Tables
import graft.ops.{Cdc, Dedup, EventAnalytics, Evaluation, Features, Generalization, KMap, Ranking, RecordLinkage, Sampling, Sketches, Skyline, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-curation batch: robust clipping, Pareto-front selection,
  * record-linkage blocking, deterministic training-shuffle layout,
  * full-domain generalization, and sketch set-algebra. Every entry has a
  * DuckDB oracle (portable md5 hashing / exact percentiles throughout).
  */
object CurationQueries {

  /** q164's comparison fields — shared by the Spark query and the
    * oracle so the log2 weights are the SAME Scala-computed literals in
    * both engines. Agreement expressions reference the blocked-join
    * column names. */
  private val fsFields = Seq(
    RecordLinkage.Field("name17",
      substring(col("name_a"), 1, 17) === substring(col("name_b"), 1, 17),
      m = 0.95, u = 0.001),
    RecordLinkage.Field("bal",
      abs(col("bal_a") - col("bal_b")) < 0.005, m = 0.9, u = 0.001),
    RecordLinkage.Field("seg",
      col("seg_a") === col("seg_b"), m = 0.95, u = 0.2))
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Per-group winsorization of lineitem prices into the [p5, p95]
    // envelope; report per-group bounds and the before/after means.
    // round-2 on AVERAGES only (divide shrinks summation-order noise to
    // ~1e-11 — the q80 lesson; a 2dp SUM would be order-sensitive).
    "q140_winsorize" -> ((s, dir) => {
      EventAnalytics.winsorize(Tables.lineitem(s, dir),
          "l_returnflag", "l_extendedprice", 0.05, 0.95)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("__wlo")).as("lo"), min(col("__whi")).as("hi"),
          round(avg(col("l_extendedprice")), 2).as("avg_raw"),
          round(avg(col("winsorized")), 2).as("avg_winsorized"))
        .orderBy(col("l_returnflag"))
    }),

    // 2-D skyline: the parts no other part beats on BOTH retail price
    // and size (maximize-both Pareto front). bucketWidth 10 over the
    // [900, 1000) price domain = ~10 parallel phase-1 buckets.
    "q141_skyline_parts" -> ((s, dir) => {
      Skyline.skyline2d(
          Tables.part(s, dir).select("p_partkey", "p_name", "p_retailprice", "p_size"),
          "p_retailprice", "p_size", bucketWidth = 10.0)
        .orderBy(col("p_partkey"))
    }),

    // Sorted-neighborhood blocking over the customer-name linkage key:
    // candidate pairs within 3 positions of the global name order.
    // Bucket = a 15-char PREFIX of the sort key itself — a string
    // prefix is monotone in the key's lexicographic order by
    // construction (no assumption about the name format), so ranking
    // parallelizes per bucket and pairs straddling bucket boundaries
    // still match through the global rank offsets.
    "q142_sorted_neighbors" -> ((s, dir) => {
      Dedup.sortedNeighborPairs(Tables.customer(s, dir),
        "c_custkey", "c_name", w = 3,
        bucketExpr = substring(col("c_name"), 1, 15))
    }),

    // Deterministic training shuffle: documents hashed into 8 shards
    // with a stable within-shard order — the epoch-reproducible read
    // layout (same keys + salt => same order, any partitioning).
    "q143_shard_assign" -> ((s, dir) => {
      Sampling.shardAssign(Tables.documents(s, dir).select("doc_id"),
          "doc_id", nShards = 8)
        .select("shard", "pos", "doc_id")
    }),

    // Full-domain generalization: coarsest-necessary acctbal width (of
    // 1000/2000/4000/8000/16000) making every (nation, range) class
    // >= 25 rows; one rule for the whole column (Samarati), not
    // Mondrian's per-region cells.
    "q144_full_domain" -> ((s, dir) => {
      Generalization.fullDomainGeneralize(
          Tables.customer(s, dir).select("c_custkey", "c_nationkey", "c_acctbal"),
          "c_acctbal", Seq("c_nationkey"), k = 25,
          widths = Seq(1000L, 2000L, 4000L, 8000L, 16000L))
        .select(col("c_custkey"), col("c_nationkey"),
          col("c_acctbal").as("acctbal_range"), col("glevel"))
    }),

    // KMV sketch algebra: estimate |click-users ∩ purchase-users| from
    // two independent k=64 sketches (no joint scan), beside the exact
    // intersection — the q117 estimate-vs-exact oracle pattern.
    "q145_kmv_intersect" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def users(t: String) =
        e.filter(col("event_type") === t).select("user_id")
      val est = Sketches.kmvIntersectEstimate(
        Sketches.kmvSketch(users("click"), "user_id", 64),
        Sketches.kmvSketch(users("purchase"), "user_id", 64), 64)
      val exact = users("click").intersect(users("purchase"))
        .agg(count(lit(1)).as("exact_intersect"))
      est.crossJoin(exact)
    }),

    // δ-presence audit: how much of each (nation, $1000-balance-bin)
    // class the released BUILDING-segment sample leaks, measured against
    // the full customer population.
    "q146_kmap_audit" -> ((s, dir) => {
      val c = Tables.customer(s, dir).withColumn("bal_bin",
        floor(col("c_acctbal") / 1000).cast("long"))
      KMap.audit(c.filter(col("c_mktsegment") === "BUILDING"), c,
          Seq("c_nationkey", "bal_bin"))
        .orderBy(col("c_nationkey"), col("bal_bin"))
    }),

    // k-map suppression: sample rows whose class holds >= 8 POPULATION
    // rows (population-side k, not sample-side — the k-map distinction;
    // $2000 bins and k=8 split the sf0.01 gate's sample 266/302).
    "q147_kmap_suppress" -> ((s, dir) => {
      val c = Tables.customer(s, dir).withColumn("bal_bin",
        floor(col("c_acctbal") / 2000).cast("long"))
      KMap.suppress(c.filter(col("c_mktsegment") === "BUILDING"), c,
          Seq("c_nationkey", "bal_bin"), k = 8)
        .select("c_custkey", "c_nationkey", "bal_bin")
    }),

    // Interval-overlap join: per-user daily click spans overlapping the
    // same user's daily error spans (did errors land inside browsing?).
    // Bucketed equi-join on (user, day-bucket); each pair attributed to
    // its overlap-start bucket — no distinct.
    "q148_interval_overlap" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def spans(t: String, p: String) =
        e.filter(col("event_type") === t)
          .groupBy(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as(s"__d$p"))
          .agg(min(col("ts")).as(s"${p}_start"), max(col("ts")).as(s"${p}_end"))
          .drop(s"__d$p")
      TimeSeries.intervalOverlapJoin(spans("click", "a"), spans("error", "b"),
          Seq("user_id"), "a_start", "a_end", "b_start", "b_end",
          bucketSeconds = 86400L)
    }),

    // Robust outliers: modified z-score on median/MAD (immune to the
    // outliers being hunted, unlike q112's mean/stddev z).
    "q151_mad_outliers" -> ((s, dir) => {
      EventAnalytics.madOutliers(Tables.events(s, dir), "event_type", "value")
        .select("event_id", "event_type", "value", "mod_z")
    }),

    // Burst-throttle dedup: first event of each 5-min-gap burst per
    // (user, type) — recursive burst semantics, exact integer micros.
    "q152_throttle_dedup" -> ((s, dir) => {
      TimeSeries.throttleDedup(Tables.events(s, dir),
          Seq("user_id", "event_type"), "ts", gapSeconds = 300L,
          tieCol = "event_id")
        .select("event_id", "user_id", "event_type", "ts")
    }),

    // Label-confusion geometry: pairwise cosine of per-label embedding
    // centroids.
    "q153_label_centroid_sim" -> ((s, dir) => {
      graft.ops.Similarity.labelCentroidSim(
          Tables.embeddings(s, dir), "label", "embedding")
        .orderBy("label_a", "label_b")
    }),

    // Quantile-normalization mapping: 20 equal-frequency tiles per
    // return flag, tile targets = cross-group means of tile means.
    "q154_quantile_normalize" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .withColumn("__tie", col("l_orderkey") * 10 + col("l_linenumber"))
      Generalization.quantileNormalizeMap(l, "l_returnflag",
          "l_extendedprice", nTiles = 20, tieCol = "__tie")
        .orderBy("l_returnflag", "tile")
    }),

    // Fellegi-Sunter record linkage: a deterministically perturbed copy
    // of customer (last name digit rotated +1 mod 10, ids shifted 1e6)
    // links back to the originals. Blocking on (nation, acctbal/1000
    // bucket) keeps the candidate surface O(n·block-density); fields:
    // 17-char name prefix (discriminating — digits differ across
    // customers), acctbal to the half-cent, mktsegment (weak, 1/5 u).
    // log2 weights are Scala-computed literals inlined into BOTH
    // engines, so no libm divergence. Output: non-links dropped; the
    // planted pairs land in 'link', accidental bal+seg agreements in
    // 'review'.
    "q164_record_linkage" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"),
        col("c_acctbal").as("bal_a"), col("c_mktsegment").as("seg_a"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_block"))
      val b = c.select((col("c_custkey") + 1000000L).as("id_b"),
        concat(substring(col("c_name"), 1, 17),
          pmod(substring(col("c_name"), 18, 1).cast("int") + 1, lit(10))
            .cast("string")).as("name_b"),
        col("c_acctbal").as("bal_b"), col("c_mktsegment").as("seg_b"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_block"))
      RecordLinkage.classify(
          RecordLinkage.scoreBlocked(a, b, Seq("c_nationkey", "bal_block"),
            fsFields), upper = 12.0, lower = 0.0)
        .filter(col("decision") =!= "non_link")
        .select("id_a", "id_b", "fs_score", "decision")
        .orderBy("id_a", "id_b")
    }),

    // End-to-end entity resolution: q164's blocked FS links closed under
    // transitivity (large-star/small-star CC), one canonical entity per
    // record, singletons included. Output is the entity-size table.
    "q174_entity_resolution" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val a = c.select(col("c_custkey").as("id_a"), col("c_name").as("name_a"),
        col("c_acctbal").as("bal_a"), col("c_mktsegment").as("seg_a"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_block"))
      val b = c.select((col("c_custkey") + 1000000L).as("id_b"),
        concat(substring(col("c_name"), 1, 17),
          pmod(substring(col("c_name"), 18, 1).cast("int") + 1, lit(10))
            .cast("string")).as("name_b"),
        col("c_acctbal").as("bal_b"), col("c_mktsegment").as("seg_b"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_block"))
      // Hot-block cap: 50k pairs/block — never trips at gate scale (max
      // block is 5,776 pairs at sf0.1, so the oracle semantics are the
      // exact full product), but a densified block (the 10× stress, a
      // skewed crawl) falls back to sorted neighborhood on the name
      // keys instead of the quadratic product.
      val out = RecordLinkage.resolveEntities(a, b, Seq("c_nationkey", "bal_block"),
          fsFields, "id_a", "id_b", upper = 12.0,
          maxBlockPairs = 50000L, snKeys = Some((col("name_a"), col("name_b"))),
          snWindow = 32)
        .groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("entity_id")
      out
    }),

    // Portable HyperLogLog per event_type (64 registers): the mergeable
    // distinct-user state, bit-replayable in DuckDB because the register
    // rank uses length(bin(word)) — string-exact in both engines —
    // instead of float log2. The small-range linear-counting branch is
    // exercised at small sf (few distinct users) and the raw branch at
    // larger sf.
    "q163_hll_distinct" -> ((s, dir) => {
      Sketches.hllEstimateGrouped(
          Sketches.hllSketchGrouped(Tables.events(s, dir),
            "event_type", "user_id", b = 6),
          "event_type", b = 6)
        .orderBy("event_type")
    }),

    // Cumulative distinct-users-to-date per day from the SAME daily HLL
    // registers q163's machinery builds: prefix-union = per-bucket
    // running max, so the 30-point curve costs one metadata-scale window
    // after a single data pass — the mergeable-sketch argument, runnable.
    "q175_hll_growth" -> ((s, dir) => {
      Sketches.hllGrowthCurve(
          Tables.events(s, dir)
            .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
          "day", "user_id", b = 6)
        .orderBy("day")
    }),

    // Inter-annotator agreement between the gold lang label and a
    // deterministically-corrupted second rater (doc_id%10 flipped to
    // 'en'): raw agreement overstates quality under label skew; kappa
    // subtracts chance. Exact integer identity (d*n - S)/(n^2 - S).
    "q215_cohens_kappa" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .withColumn("rater_b",
          when(col("doc_id") % 10 === 0, lit("en")).otherwise(col("lang")))
      Evaluation.cohensKappa(d, "lang", "rater_b")
    }),

    // Per-class precision/recall/F1 of the corrupted rater against the
    // gold label — the classification-report primitive for label audits.
    "q216_class_report" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .withColumn("rater_b",
          when(col("doc_id") % 10 === 0, lit("en")).otherwise(col("lang")))
      Evaluation.classificationReport(d, "lang", "rater_b")
        .orderBy("label")
    }),

    // ROC AUC of a length-based quality score against the en/non-en
    // label — threshold-free ranking quality in the exact rank-sum
    // form; the coarse floor(n_chars/100) score forces heavy ties, the
    // midrank path the statistic must get right.
    "q217_auc" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select((col("lang") === "en").as("is_en"),
          floor(col("n_chars") / 100).cast("double").as("score"))
      Evaluation.aucRoc(d, "is_en", "score")
    }),

    // Calibration table of a synthetic scored model whose labels are
    // drawn (deterministically, by a second independent key hash) at
    // exactly the predicted rate — so frac_pos should track mean_score
    // bin by bin; the curve's diagonal gap is the audit signal.
    "q218_calibration" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("score",
          Sampling.bucket(col("o_orderkey"), "graft-cal").cast("double")
            / 1000000.0)
        .withColumn("label",
          Sampling.bucket(col("o_orderkey"), "graft-lab").cast("double")
            < col("score") * 1000000.0)
      Evaluation.calibrationBins(o, "label", "score", nBins = 10)
        .orderBy("bin")
    }),

    // Murphy decomposition of the Brier score per priority on q218's
    // scored model: REL − RES + UNC — says WHY a score is bad
    // (miscalibration -> recalibrate; no resolution -> the score is
    // uninformative and no recalibration helps).
    "q313_brier_decomp" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("score",
          Sampling.bucket(col("o_orderkey"), "graft-cal").cast("double")
            / 1000000.0)
        .withColumn("label",
          Sampling.bucket(col("o_orderkey"), "graft-lab").cast("double")
            < col("score") * 1000000.0)
      Evaluation.brierDecomposition(o, "o_orderpriority", "label", "score",
          nBins = 10)
        .orderBy("o_orderpriority")
    }),

    // Group-conditional (Mondrian) conformal: q286's global q-hat
    // guarantees only MARGINAL coverage — this computes the
    // ceil((n_g+1)·0.9)-th residual per priority, restoring the 90%
    // guarantee within every group (watch q286's per-group coverage
    // spread vs this one's).
    "q310_group_conformal" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      Evaluation.conformalIntervalByGroup(
          o.filter(col("o_orderkey") % 3 === 0),
          o.filter(col("o_orderkey") % 3 === 1),
          o.filter(col("o_orderkey") % 3 === 2),
          "o_orderpriority", "o_totalprice", alpha = 0.1)
        .orderBy("o_orderpriority")
    }),

    // Expected calibration error per order priority on q218's scored
    // model: the one-number-per-segment roll-up of the calibration curve
    // (a scorer can be calibrated globally and over-confident on one
    // segment). Micro-quantized bin gaps, exact weighted sum.
    "q300_ece_by_segment" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("score",
          Sampling.bucket(col("o_orderkey"), "graft-cal").cast("double")
            / 1000000.0)
        .withColumn("label",
          Sampling.bucket(col("o_orderkey"), "graft-lab").cast("double")
            < col("score") * 1000000.0)
      Evaluation.eceBySegment(o, "o_orderpriority", "label", "score",
          nBins = 10)
        .orderBy("o_orderpriority")
    }),

    // Per-source ROC AUC of the q217 length score: the fairness audit
    // that catches a scorer ranking one source no better than chance
    // while the GLOBAL AUC looks fine. One pipeline, no per-segment jobs.
    "q296_auc_by_segment" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("source"), (col("lang") === "en").as("is_en"),
          floor(col("n_chars") / 100).cast("double").as("score"))
      Evaluation.aucRocBySegment(d, "source", "is_en", "score")
        .orderBy("source")
    }),

    // Neyman-optimal split of a 1000-row audit budget across order
    // priorities by N_h·S_h — the variance-minimizing labeling-campaign
    // allocation, integerized by deterministic largest remainder.
    "q297_neyman_alloc" -> ((s, dir) => {
      Sampling.neymanAllocation(Tables.orders(s, dir), "o_orderpriority",
          "o_totalprice", budget = 1000)
        .orderBy("o_orderpriority")
    }),

    // Out-of-fold target encoding of order priority against the F-status
    // label: every row's encode uses only the OTHER four folds' label
    // stats (prior included) — the leakage-safe mean-encode a feature
    // pipeline ships where naive target means would overfit.
    "q284_target_encode" -> ((s, dir) => {
      Features.oofTargetEncode(Tables.orders(s, dir), "o_orderkey",
          "o_orderpriority", col("o_orderstatus") === "F",
          k = 5, smoothing = 20.0)
        .orderBy("o_orderkey")
    }),

    // Isotonic calibration (PAV in its order-free minimax closed form)
    // of q218's synthetic scored model over 20 bins: the monotone fit a
    // serving layer broadcasts to turn raw scores into probabilities.
    "q285_isotonic" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("score",
          Sampling.bucket(col("o_orderkey"), "graft-cal").cast("double")
            / 1000000.0)
        .withColumn("label",
          Sampling.bucket(col("o_orderkey"), "graft-lab").cast("double")
            < col("score") * 1000000.0)
      Evaluation.isotonicCalibration(o, "label", "score", nBins = 20)
        .orderBy("bin")
    }),

    // Split-conformal interval around a per-priority mean-price
    // predictor (train/calibrate/test = key mod 3): the calibration
    // set's exact ⌈(n+1)·0.9⌉-th absolute residual is the half-width;
    // the audit reports per-priority coverage on held-out orders.
    "q286_conformal" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      Evaluation.conformalInterval(
          o.filter(col("o_orderkey") % 3 === 0),
          o.filter(col("o_orderkey") % 3 === 1),
          o.filter(col("o_orderkey") % 3 === 2),
          "o_orderpriority", "o_totalprice", alpha = 0.1)
        .orderBy("o_orderpriority")
    }),

    // Cumulative gains/lift by exact score decile on q218's scored
    // model: "the top decile captures X% of positives at Y× lift" —
    // the targeting readout between AUC's one number and the
    // calibration curve.
    "q228_lift" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("score",
          Sampling.bucket(col("o_orderkey"), "graft-cal").cast("double")
            / 1000000.0)
        .withColumn("label",
          Sampling.bucket(col("o_orderkey"), "graft-lab").cast("double")
            < col("score") * 1000000.0)
      Evaluation.liftTable(o, "label", "score", nTiles = 10)
        .orderBy(col("tile").desc)
    }),

    // Fleiss' kappa over a fixed 3-rater panel (gold lang + two
    // deterministically-corrupted raters): the multi-annotator
    // agreement number a labeling campaign is judged by.
    "q220_fleiss_kappa" -> ((s, dir) => {
      // null-lang docs would give that subject a short panel (null
      // ratings are unrankable) — exclude the SUBJECT, not the rating
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
        .filter(col("lang").isNotNull)
      val r1 = d.select(col("doc_id"), col("lang").as("rating"))
      val r2 = d.select(col("doc_id"),
        when(col("doc_id") % 10 === 0, lit("en")).otherwise(col("lang"))
          .as("rating"))
      val r3 = d.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("de")).otherwise(col("lang"))
          .as("rating"))
      Evaluation.fleissKappa(r1.unionAll(r2).unionAll(r3), "doc_id", "rating")
    }),

    // Rolling 7-day distinct users per day from the same daily
    // registers: window-union = per-bucket trailing max — the
    // rolling-actives curve without rescanning 7 days of raw data per
    // output day.
    "q210_hll_rolling" -> ((s, dir) => {
      Sketches.hllSlidingCurve(
          Tables.events(s, dir)
            .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
          "day", "user_id", width = 7, b = 6)
        .orderBy("day")
    }),

    // Distinct-user ROLLUP over (event_type, day) from ONE finest-grain
    // sketch pass — coarser levels are register max-merges (metadata
    // scale), where Spark's rollup+count_distinct Expands the raw data
    // once per grouping set. Same registers as q163, so every level
    // replays bit-for-bit in the oracle.
    "q191_hll_rollup" -> ((s, dir) => {
      Sketches.hllRollup(
          Tables.events(s, dir)
            .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
          Seq("event_type", "day"), "user_id", b = 6)
        .orderBy("level", "event_type", "day")
    }),

    // CMS sketch algebra: self-join size (F2) of events on user_id from
    // one sketch — the salting-decision statistic without a per-key scan.
    "q155_cms_join_size" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val sk = Sketches.cmsBuild(e, "user_id")
      val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).as("exact_self_join"))
      Sketches.cmsJoinSizeEstimate(sk, sk).crossJoin(exact)
    }),

    // 2-D Samarati: least (price-level, size-level) lattice node making
    // every joint range class >= 15 parts.
    "q156_full_domain_2d" -> ((s, dir) => {
      Generalization.fullDomainGeneralize2d(
          Tables.part(s, dir).select("p_partkey", "p_retailprice", "p_size"),
          "p_retailprice", Seq(10L, 20L, 40L, 80L),
          "p_size", Seq(5L, 10L, 25L, 50L), Nil, k = 15)
        .select(col("p_partkey"), col("p_retailprice").as("price_range"),
          col("p_size").as("size_range"), col("glevel_a"), col("glevel_b"))
    }),

    // SCD Type-2: interval-versioned dimension rows from a changelog —
    // each version valid until the key's next version, latest live row
    // current (null valid_to), tombstones close history silently.
    "q157_scd2" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select("doc_id")
      val log = ids.select(col("doc_id"), lit(1L).as("version"), lit(false).as("deleted"))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), lit(2L).as("version"), lit(false).as("deleted")))
        .unionByName(ids.filter(col("doc_id") % 11 === 3)
          .select(col("doc_id"), lit(3L).as("version"), lit(true).as("deleted")))
        .unionByName(ids.filter(col("doc_id") % 14 === 0)
          .select(col("doc_id"), lit(4L).as("version"), lit(false).as("deleted")))
      Cdc.scdType2(log, Seq("doc_id"), "version", "deleted")
        .select("doc_id", "version", "valid_from", "valid_to")
        .orderBy("doc_id", "version")
    }),

    // Point-in-time lookup against the SCD2 dimension: each key probed
    // at its own as-of version resolves to the interval containing it
    // (keys deleted before — or first created after — the probe drop).
    "q158_point_in_time" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select("doc_id")
      val log = ids.select(col("doc_id"), lit(1L).as("version"), lit(false).as("deleted"))
        .unionByName(ids.filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), lit(2L).as("version"), lit(false).as("deleted")))
        .unionByName(ids.filter(col("doc_id") % 11 === 3)
          .select(col("doc_id"), lit(3L).as("version"), lit(true).as("deleted")))
        .unionByName(ids.filter(col("doc_id") % 14 === 0)
          .select(col("doc_id"), lit(4L).as("version"), lit(false).as("deleted")))
      val dim = Cdc.scdType2(log, Seq("doc_id"), "version", "deleted")
      val probes = ids.select(col("doc_id"), (lit(1L) + col("doc_id") % 4).as("pv"))
      probes.join(dim, Seq("doc_id"))
        .filter(col("valid_from") <= col("pv") &&
          (col("valid_to").isNull || col("valid_to") > col("pv")))
        .select("doc_id", "pv", "version")
        .orderBy("doc_id")
    }),

    // Exact global percentile rank without a single-partition sort:
    // bucketed rank-offset row numbers over (price, key) order.
    "q149_global_rank" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
      val n = o.agg(count(lit(1)).as("__n"))
      Ranking.globalRowNumber(o, Seq("o_totalprice", "o_orderkey"),
          bucketExpr = floor(col("o_totalprice") / 25000), outCol = "rnk")
        .withColumn("rnk", col("rnk").cast("long"))
        .crossJoin(broadcast(n))
        .select(col("o_orderkey"), col("o_totalprice"), col("rnk"),
          round((col("rnk") - 1) / (col("__n") - 1), 6).as("pct"))
    }))

  private val phashSql = (x: String) =>
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q140_winsorize" ->
      """WITH b AS (SELECT l_returnflag,
                           round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
                           round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
                    FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, count(*) AS n_rows, min(lo) AS lo, min(hi) AS hi,
                round(avg(l_extendedprice), 2) AS avg_raw,
                round(avg(round(least(greatest(l_extendedprice, lo), hi), 6)), 2) AS avg_winsorized
         FROM lineitem JOIN b USING (l_returnflag)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q141_skyline_parts" ->
      """SELECT p_partkey, p_name, p_retailprice, p_size FROM part t
         WHERE NOT EXISTS (
           SELECT 1 FROM part o
           WHERE o.p_retailprice >= t.p_retailprice AND o.p_size >= t.p_size
             AND (o.p_retailprice > t.p_retailprice OR o.p_size > t.p_size))
         ORDER BY p_partkey""",
    "q142_sorted_neighbors" ->
      """WITH r AS (SELECT c_custkey, c_name,
                           row_number() OVER (ORDER BY c_name, c_custkey) AS rn
                    FROM customer)
         SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                a.c_name AS key_a, b.c_name AS key_b
         FROM r a JOIN r b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3""",
    "q143_shard_assign" ->
      s"""WITH h AS (SELECT doc_id,
                   ${phashSql("'graft-shard|' || CAST(doc_id AS VARCHAR)")} AS hv
                   FROM documents)
          SELECT hv % 8 AS shard,
                 CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS BIGINT) AS pos,
                 doc_id
          FROM h""",
    "q144_full_domain" ->
      """WITH lv(lvl, w) AS (VALUES (0, 1000), (1, 2000), (2, 4000), (3, 8000), (4, 16000)),
          b AS (SELECT lvl, w, c_nationkey,
                       CAST(floor(c_acctbal / w) AS BIGINT) * w AS lo, count(*) AS n
                FROM customer CROSS JOIN lv GROUP BY lvl, w, c_nationkey, lo),
          m AS (SELECT lvl, min(n) AS mn FROM b GROUP BY lvl),
          ch AS (SELECT min(lvl) AS lvl FROM m WHERE mn >= 25),
          chw AS (SELECT ch.lvl AS lvl, lv.w AS w FROM ch LEFT JOIN lv ON lv.lvl = ch.lvl)
          SELECT c_custkey, c_nationkey,
                 CASE WHEN chw.lvl IS NULL THEN '*'
                      ELSE '[' || CAST(CAST(floor(c_acctbal / chw.w) AS BIGINT) * chw.w AS VARCHAR)
                        || ',' || CAST(CAST(floor(c_acctbal / chw.w) AS BIGINT) * chw.w + chw.w AS VARCHAR) || ')'
                 END AS acctbal_range,
                 CAST(coalesce(chw.lvl, -1) AS BIGINT) AS glevel
          FROM customer CROSS JOIN chw""",
    "q145_kmv_intersect" -> {
      val u = (t: String) =>
        s"""SELECT DISTINCT (${phashSql(s"'graft-kmv|' || CAST(user_id AS VARCHAR)")} % 1000000 + 0.5) / 1000000.0 AS u
            FROM events WHERE event_type = '$t'"""
      s"""WITH sa AS (SELECT u FROM (SELECT u, row_number() OVER (ORDER BY u) AS rn FROM (${u("click")})) WHERE rn <= 64),
          sb AS (SELECT u FROM (SELECT u, row_number() OVER (ORDER BY u) AS rn FROM (${u("purchase")})) WHERE rn <= 64),
          m AS (SELECT u FROM (SELECT u, row_number() OVER (ORDER BY u) AS rn
                               FROM (SELECT u FROM sa UNION SELECT u FROM sb)) WHERE rn <= 64),
          st AS (SELECT count(*) AS nm, max(u) AS uk FROM m),
          bo AS (SELECT count(*) AS nboth FROM m
                 WHERE u IN (SELECT u FROM sa) AND u IN (SELECT u FROM sb)),
          ex AS (SELECT count(*) AS exact_intersect FROM
                   (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
                    INTERSECT
                    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
          SELECT round((CASE WHEN nm < 64 THEN nm * 1.0 ELSE round((64 - 1) / uk, 6) END)
                         * nboth / nm, 6) AS kmv_intersect_est,
                 exact_intersect
          FROM st, bo, ex"""
    },
    "q146_kmap_audit" ->
      """WITH sc AS (SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bin,
                            count(*) AS n_sample
                     FROM customer WHERE c_mktsegment = 'BUILDING'
                     GROUP BY c_nationkey, bal_bin),
          pc AS (SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bin,
                        count(*) AS n_pop
                 FROM customer GROUP BY c_nationkey, bal_bin)
          SELECT sc.c_nationkey, sc.bal_bin, n_sample, n_pop,
                 round(n_sample * 1.0 / n_pop, 6) AS ratio
          FROM sc JOIN pc USING (c_nationkey, bal_bin)
          ORDER BY c_nationkey, bal_bin""",
    "q147_kmap_suppress" ->
      """WITH pc AS (SELECT c_nationkey, CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bin
                     FROM customer GROUP BY c_nationkey, bal_bin HAVING count(*) >= 8)
          SELECT c_custkey, c.c_nationkey,
                 CAST(floor(c.c_acctbal / 2000) AS BIGINT) AS bal_bin
          FROM customer c
          JOIN pc ON c.c_nationkey = pc.c_nationkey
                 AND CAST(floor(c.c_acctbal / 2000) AS BIGINT) = pc.bal_bin
          WHERE c_mktsegment = 'BUILDING'""",
    "q148_interval_overlap" ->
      """WITH a AS (SELECT user_id, min(ts) AS a_start, max(ts) AS a_end
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, strftime(ts, '%Y-%m-%d')),
          b AS (SELECT user_id, min(ts) AS b_start, max(ts) AS b_end
                FROM events WHERE event_type = 'error'
                GROUP BY user_id, strftime(ts, '%Y-%m-%d'))
          SELECT user_id, a_start, a_end, b_start, b_end
          FROM a JOIN b USING (user_id)
          WHERE a_start <= b_end AND b_start <= a_end""",
    "q151_mad_outliers" ->
      """WITH med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
                      FROM events GROUP BY event_type),
          mad AS (SELECT event_type, round(quantile_cont(abs(value - med), 0.5), 6) AS mad
                  FROM events JOIN med USING (event_type) GROUP BY event_type)
          SELECT event_id, event_type, value,
                 round(0.6745 * (value - med) / mad, 6) AS mod_z
          FROM events JOIN med USING (event_type) JOIN mad USING (event_type)
          WHERE mad <> 0 AND abs(round(0.6745 * (value - med) / mad, 6)) > 3.5""",
    "q152_throttle_dedup" ->
      """WITH o AS (SELECT event_id, user_id, event_type, ts,
                           lag(ts) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id) AS pts
                    FROM events),
          f AS (SELECT *, CASE WHEN pts IS NULL
                                 OR epoch_us(ts) - epoch_us(pts) > 300000000
                               THEN 1 ELSE 0 END AS nb FROM o),
          s AS (SELECT *, sum(nb) OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS burst FROM f),
          r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst
                                             ORDER BY ts, event_id) AS rn FROM s)
          SELECT event_id, user_id, event_type, ts FROM r WHERE rn = 1""",
    "q153_label_centroid_sim" ->
      """WITH e AS (SELECT label, dim, embedding[dim] AS v
                    FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS dim)),
          c AS (SELECT label, dim, avg(v) AS cv FROM e GROUP BY label, dim),
          p AS (SELECT a.label AS label_a, b.label AS label_b,
                       sum(a.cv * b.cv) AS dot,
                       sqrt(sum(a.cv * a.cv)) AS na, sqrt(sum(b.cv * b.cv)) AS nb
                FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
                GROUP BY label_a, label_b)
          SELECT label_a, label_b, round(dot / (na * nb), 6) AS cosine
          FROM p WHERE na <> 0 AND nb <> 0 ORDER BY label_a, label_b""",
    "q154_quantile_normalize" ->
      """WITH t AS (SELECT l_returnflag, l_extendedprice,
                           ntile(20) OVER (PARTITION BY l_returnflag
                                           ORDER BY l_extendedprice,
                                                    l_orderkey * 10 + l_linenumber) AS tile
                    FROM lineitem),
          pg AS (SELECT l_returnflag, CAST(tile AS BIGINT) AS tile,
                        round(sum(CAST(round(l_extendedprice * 1000000) AS BIGINT)) / (count(*) * 1000000.0), 6) AS tile_avg_raw,
                        count(*) AS n
                 FROM t GROUP BY l_returnflag, tile),
          tg AS (SELECT tile, round(sum(CAST(round(tile_avg_raw * 1000000) AS BIGINT)) / (count(*) * 1000000.0), 6) AS target
                 FROM pg GROUP BY tile)
          SELECT l_returnflag, pg.tile, tile_avg_raw, target, n
          FROM pg JOIN tg USING (tile) ORDER BY l_returnflag, tile""",
    "q164_record_linkage" -> {
      val Seq(f1, f2, f3) = fsFields
      s"""WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a, c_acctbal AS bal_a,
                  c_mktsegment AS seg_a, c_nationkey,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_block FROM customer),
          b AS (SELECT c_custkey + 1000000 AS id_b,
                  substr(c_name, 1, 17) ||
                    CAST((CAST(substr(c_name, 18, 1) AS INT) + 1) % 10 AS VARCHAR) AS name_b,
                  c_acctbal AS bal_b, c_mktsegment AS seg_b, c_nationkey,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_block FROM customer),
          p AS (SELECT id_a, id_b,
                  CAST(round((CASE WHEN substr(name_a, 1, 17) = substr(name_b, 1, 17)
                              THEN ${f1.agreeWeight} ELSE ${f1.disagreeWeight} END)
                      + (CASE WHEN abs(bal_a - bal_b) < 0.005
                              THEN ${f2.agreeWeight} ELSE ${f2.disagreeWeight} END)
                      + (CASE WHEN seg_a = seg_b
                              THEN ${f3.agreeWeight} ELSE ${f3.disagreeWeight} END), 6) AS DOUBLE) AS fs_score
                FROM a JOIN b USING (c_nationkey, bal_block))
          SELECT id_a, id_b, fs_score,
                 CASE WHEN fs_score >= 12.0 THEN 'link'
                      WHEN fs_score < 0.0 THEN 'non_link'
                      ELSE 'review' END AS decision
          FROM p WHERE fs_score >= 0.0
          ORDER BY id_a, id_b"""
    },
    // ER closure replay: the link set is q164's; transitive closure via
    // a recursive CTE (min reachable label), singletons from the id
    // universe's left join.
    "q174_entity_resolution" -> {
      val Seq(f1, f2, f3) = fsFields
      s"""WITH RECURSIVE
          a AS (SELECT c_custkey AS id_a, c_name AS name_a, c_acctbal AS bal_a,
                  c_mktsegment AS seg_a, c_nationkey,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_block FROM customer),
          b AS (SELECT c_custkey + 1000000 AS id_b,
                  substr(c_name, 1, 17) ||
                    CAST((CAST(substr(c_name, 18, 1) AS INT) + 1) % 10 AS VARCHAR) AS name_b,
                  c_acctbal AS bal_b, c_mktsegment AS seg_b, c_nationkey,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_block FROM customer),
          p AS (SELECT id_a, id_b,
                  round((CASE WHEN substr(name_a, 1, 17) = substr(name_b, 1, 17)
                              THEN ${f1.agreeWeight} ELSE ${f1.disagreeWeight} END)
                      + (CASE WHEN abs(bal_a - bal_b) < 0.005
                              THEN ${f2.agreeWeight} ELSE ${f2.disagreeWeight} END)
                      + (CASE WHEN seg_a = seg_b
                              THEN ${f3.agreeWeight} ELSE ${f3.disagreeWeight} END), 6) AS fs_score
                FROM a JOIN b USING (c_nationkey, bal_block)),
          und AS (SELECT id_a AS x, id_b AS y FROM p WHERE fs_score >= 12.0
                  UNION SELECT id_b, id_a FROM p WHERE fs_score >= 12.0),
          ids AS (SELECT id_a AS id FROM a UNION SELECT id_b FROM b),
          reach AS (SELECT id, id AS lab FROM ids
                    UNION
                    SELECT u.x AS id, r.lab FROM und u JOIN reach r ON r.id = u.y),
          lab AS (SELECT id, min(lab) AS entity_id FROM reach GROUP BY id)
          SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members
          FROM lab GROUP BY entity_id ORDER BY entity_id"""
    },
    // Same register construction as q163 at the finest (event_type, day)
    // grain, then each rollup level re-aggregates the register table by
    // max — the estimate template repeats per level.
    "q191_hll_rollup" -> {
      val hv = phashSql("'graft-hll|' || CAST(user_id AS VARCHAR)")
      val est = (den: String, v: String) =>
        s"""round(CASE WHEN 0.709 * 64 * 64 / $den <= 160.0 AND $v > 0
                       THEN 64.0 * ln(64.0 / $v)
                       ELSE 0.709 * 64 * 64 / $den END, 6)"""
      s"""WITH e AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
                 FROM events),
          r AS (SELECT event_type, day, $hv % 64 AS bucket,
                   CASE WHEN $hv // 64 = 0 THEN 55
                        ELSE 55 - length(bin($hv // 64)) END AS rho
                 FROM e),
          fine AS (SELECT event_type, day, bucket, max(rho) AS mj
                   FROM r GROUP BY event_type, day, bucket),
          l2 AS (SELECT event_type, day,
                        sum(power(2.0, -mj)) AS s, count(*) AS nb
                 FROM fine GROUP BY event_type, day),
          reg1 AS (SELECT event_type, bucket, max(mj) AS mj
                   FROM fine GROUP BY event_type, bucket),
          l1 AS (SELECT event_type, sum(power(2.0, -mj)) AS s, count(*) AS nb
                 FROM reg1 GROUP BY event_type),
          reg0 AS (SELECT bucket, max(mj) AS mj FROM fine GROUP BY bucket),
          l0 AS (SELECT sum(power(2.0, -mj)) AS s, count(*) AS nb FROM reg0)
          SELECT event_type, day, 2 AS level,
                 ${est("(s + (64 - nb))", "(64 - nb)")} AS hll_est FROM l2
          UNION ALL
          SELECT event_type, NULL, 1,
                 ${est("(s + (64 - nb))", "(64 - nb)")} FROM l1
          UNION ALL
          SELECT NULL, NULL, 0,
                 ${est("(s + (64 - nb))", "(64 - nb)")} FROM l0
          ORDER BY level, event_type, day"""
    },
    // Same register construction as q163, then the prefix-union as a
    // per-bucket cumulative max over the day-densified register grid.
    "q175_hll_growth" -> {
      val hv = phashSql("'graft-hll|' || CAST(user_id AS VARCHAR)")
      s"""WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
          r AS (SELECT day, $hv % 64 AS bucket,
                   CASE WHEN $hv // 64 = 0 THEN 55
                        ELSE 55 - length(bin($hv // 64)) END AS rho
                 FROM e),
          reg AS (SELECT day, bucket, max(rho) AS mj
                  FROM r GROUP BY day, bucket),
          grid AS (SELECT d.day, b.bucket
                   FROM (SELECT DISTINCT day FROM reg) d
                   CROSS JOIN (SELECT DISTINCT bucket FROM reg) b),
          cum AS (SELECT g.day, g.bucket,
                    max(reg.mj) OVER (PARTITION BY g.bucket ORDER BY g.day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mj
                  FROM grid g LEFT JOIN reg ON reg.day = g.day AND reg.bucket = g.bucket),
          cf AS (SELECT day, bucket, mj FROM cum WHERE mj IS NOT NULL),
          agg AS (SELECT day, sum(power(2.0, -mj)) AS s, count(*) AS nb
                  FROM cf GROUP BY day),
          est AS (SELECT day, s + (64 - nb) AS den, 64 - nb AS v FROM agg)
          SELECT day,
                 round(CASE WHEN 0.709 * 64 * 64 / den <= 160.0 AND v > 0
                            THEN 64.0 * ln(64.0 / v)
                            ELSE 0.709 * 64 * 64 / den END, 6) AS hll_est
          FROM est ORDER BY day"""
    },
    // Same confusion cells, same exact integer kappa identity.
    "q215_cohens_kappa" ->
      """WITH d AS (SELECT lang AS a,
                   CASE WHEN doc_id % 10 = 0 THEN 'en' ELSE lang END AS b
                 FROM documents WHERE lang IS NOT NULL),
          cells AS (SELECT a, b, count(*) AS c FROM d GROUP BY a, b),
          ra AS (SELECT a AS k, sum(c) AS ra FROM cells GROUP BY a),
          cb AS (SELECT b AS k, sum(c) AS cb FROM cells GROUP BY b),
          s AS (SELECT sum(CAST(ra.ra AS HUGEINT) * cb.cb) AS s
                FROM ra JOIN cb ON ra.k = cb.k),
          t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS d
                FROM cells)
          SELECT n,
                 round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
                 round(CAST(s AS DOUBLE) / CAST(CAST(n AS HUGEINT) * n AS DOUBLE), 6) AS pe,
                 CASE WHEN CAST(n AS HUGEINT) * n <> s
                      THEN round(CAST(CAST(d AS HUGEINT) * n - s AS DOUBLE)
                                 / CAST(CAST(n AS HUGEINT) * n - s AS DOUBLE), 6)
                 END AS kappa
          FROM t CROSS JOIN s""",
    // Same cells; per-label margins, integer-form F1.
    "q216_class_report" ->
      """WITH d AS (SELECT lang AS a,
                   CASE WHEN doc_id % 10 = 0 THEN 'en' ELSE lang END AS p
                 FROM documents WHERE lang IS NOT NULL),
          cells AS (SELECT a, p, count(*) AS c FROM d GROUP BY a, p),
          act AS (SELECT a AS label, CAST(sum(c) AS BIGINT) AS support
                  FROM cells GROUP BY a),
          prd AS (SELECT p AS label, CAST(sum(c) AS BIGINT) AS pred
                  FROM cells GROUP BY p),
          dg AS (SELECT a AS label, CAST(c AS BIGINT) AS tp
                 FROM cells WHERE a = p),
          j AS (SELECT coalesce(act.label, prd.label) AS label,
                       coalesce(support, 0) AS support,
                       coalesce(tp, 0) AS tp,
                       coalesce(pred, 0) - coalesce(tp, 0) AS fp,
                       coalesce(support, 0) - coalesce(tp, 0) AS fn
                FROM act FULL OUTER JOIN prd ON act.label = prd.label
                         LEFT JOIN dg ON dg.label = coalesce(act.label, prd.label))
          SELECT label, support, tp, fp, fn,
                 CASE WHEN tp + fp > 0
                      THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS precision,
                 CASE WHEN tp + fn > 0
                      THEN round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END AS recall,
                 CASE WHEN tp * 2 + fp + fn > 0
                      THEN round(CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE), 6) END AS f1
          FROM j ORDER BY label""",
    // Same doubled-midrank integer core as q182's Mann-Whitney.
    "q217_auc" ->
      """WITH r AS (SELECT CAST(floor(n_chars / 100) AS DOUBLE) AS v,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
                 FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
          c AS (SELECT v, CAST(sum(pos) AS BIGINT) AS cp, count(*) AS t
                FROM r GROUP BY v),
          cum AS (SELECT cp, t,
                    coalesce(sum(t) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
                  FROM c),
          a AS (SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
                       CAST(sum(t - cp) AS BIGINT) AS n_neg,
                       sum(CAST(cp AS HUGEINT) * (before * 2 + t + 1)) AS r2p
                FROM cum)
          SELECT n_pos, n_neg,
                 CASE WHEN n_pos > 0 AND n_neg > 0
                      THEN round(CAST(r2p - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
                                 / CAST(CAST(n_pos AS HUGEINT) * n_neg * 2 AS DOUBLE), 6)
                 END AS auc
          FROM a""",
    // Score/label replay the same two independent key hashes; the
    // double expression SHAPES match the engine exactly (s = sb/1e6,
    // label = lb < s*1e6) so edge rows land in the same bins.
    "q218_calibration" -> {
      val sb = phashSql("'graft-cal|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      val lb = phashSql("'graft-lab|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      s"""WITH o AS (SELECT CAST($sb AS DOUBLE) / 1000000.0 AS s,
                       CAST($lb AS DOUBLE) AS lbd
                  FROM orders),
          r AS (SELECT s,
                  CASE WHEN lbd < s * 1000000.0 THEN 1 ELSE 0 END AS pos
                FROM o),
          b AS (SELECT CAST(least(floor(s * 10), 9) AS BIGINT) AS bin,
                       count(*) AS n,
                       sum(CAST(round(s * 1000000.0, 0) AS HUGEINT)) AS sm,
                       CAST(sum(pos) AS BIGINT) AS np
                FROM r GROUP BY 1)
          SELECT bin, n,
                 round(CAST(sm AS DOUBLE) / 1000000.0 / CAST(n AS DOUBLE), 6) AS mean_score,
                 round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6) AS frac_pos
          FROM b ORDER BY bin"""
    },
    // brierDecomposition replay: q218 hashes + segment cells, per-bin
    // REL/RES micro terms weighted by n_b, exact base rate, the same
    // REL − RES + UNC reconstruction.
    "q313_brier_decomp" -> {
      val sb = phashSql("'graft-cal|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      val lb = phashSql("'graft-lab|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      s"""WITH o AS (SELECT o_orderpriority AS g,
                       CAST($sb AS DOUBLE) / 1000000.0 AS s,
                       CAST($lb AS DOUBLE) AS lbd FROM orders),
          r AS (SELECT g, s, CASE WHEN lbd < s * 1000000.0 THEN 1 ELSE 0 END AS pos
                FROM o WHERE s >= 0 AND s <= 1),
          cells AS (SELECT g, CAST(least(floor(s * 10), 9) AS BIGINT) AS b,
                      count(*) AS n,
                      sum(CAST(round(s * 1000000, 0) AS BIGINT)) AS sm,
                      CAST(sum(pos) AS BIGINT) AS np
                    FROM r GROUP BY g, b),
          t AS (SELECT g, b, n, sm, np,
                  sum(n) OVER (PARTITION BY g) AS nt,
                  sum(np) OVER (PARTITION BY g) AS npt
                FROM cells),
          terms AS (SELECT g, nt,
                      CAST(npt AS DOUBLE) / nt AS base,
                      CAST(round((CAST(sm AS DOUBLE) / n / 1000000.0 - CAST(np AS DOUBLE) / n)
                        * (CAST(sm AS DOUBLE) / n / 1000000.0 - CAST(np AS DOUBLE) / n)
                        * n * 1000000, 0) AS BIGINT) AS relt,
                      CAST(round((CAST(np AS DOUBLE) / n - CAST(npt AS DOUBLE) / nt)
                        * (CAST(np AS DOUBLE) / n - CAST(npt AS DOUBLE) / nt)
                        * n * 1000000, 0) AS BIGINT) AS rest
                    FROM t),
          agg AS (SELECT g, nt, base,
                    round(CAST(sum(relt) AS DOUBLE) / nt / 1000000.0, 6) AS reliability,
                    round(CAST(sum(rest) AS DOUBLE) / nt / 1000000.0, 6) AS resolution,
                    round(base * (1.0 - base), 6) AS uncertainty
                  FROM terms GROUP BY g, nt, base)
          SELECT g AS o_orderpriority, CAST(nt AS BIGINT) AS n,
            round(reliability - resolution + uncertainty, 6) AS brier,
            reliability, resolution, uncertainty
          FROM agg ORDER BY o_orderpriority"""
    },
    // group-conformal replay: q286's chain with PARTITION BY category in
    // the cumulative windows and a per-group min-over-threshold q-hat.
    "q310_group_conformal" ->
      """WITH pred AS (SELECT o_orderpriority AS c,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                / count(*), 6) AS pred
            FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_orderpriority),
          resid AS (SELECT p.c, round(abs(CAST(o.o_totalprice AS DOUBLE) - p.pred), 6) AS r
            FROM orders o JOIN pred p ON o.o_orderpriority = p.c
            WHERE o.o_orderkey % 3 = 1),
          cum AS (SELECT c, r, cnt,
                    sum(cnt) OVER (PARTITION BY c ORDER BY r) AS cum,
                    sum(cnt) OVER (PARTITION BY c) AS n
                  FROM (SELECT c, r, count(*) AS cnt FROM resid GROUP BY c, r)),
          q AS (SELECT c, min(r) AS q_hat FROM cum
                WHERE cum >= least(n,
                  CAST(ceil((n + 1) * CAST(0.9 AS DOUBLE)) AS BIGINT))
                GROUP BY c),
          t AS (SELECT o.o_orderpriority AS c, q.q_hat,
                  count(*) AS n_test,
                  CAST(sum(CASE WHEN round(abs(CAST(o.o_totalprice AS DOUBLE) - p.pred), 6)
                    <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
                FROM orders o JOIN pred p ON o.o_orderpriority = p.c
                JOIN q ON q.c = p.c
                WHERE o.o_orderkey % 3 = 2 GROUP BY o.o_orderpriority, q.q_hat)
          SELECT c AS o_orderpriority, q_hat, n_test, n_covered,
            round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage
          FROM t ORDER BY o_orderpriority""",
    // eceBySegment replay: q218's hashes + segment, per-(segment, bin)
    // micro score mass, |np·1e6 − sm|/n gap re-quantized before the
    // weighted cross-bin sum.
    "q300_ece_by_segment" -> {
      val sb = phashSql("'graft-cal|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      val lb = phashSql("'graft-lab|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      s"""WITH o AS (SELECT o_orderpriority AS g,
                       CAST($sb AS DOUBLE) / 1000000.0 AS s,
                       CAST($lb AS DOUBLE) AS lbd FROM orders),
          r AS (SELECT g, s, CASE WHEN lbd < s * 1000000.0 THEN 1 ELSE 0 END AS pos
                FROM o WHERE s >= 0 AND s <= 1),
          cells AS (SELECT g, CAST(least(floor(s * 10), 9) AS BIGINT) AS b,
                      count(*) AS n,
                      sum(CAST(round(s * 1000000, 0) AS BIGINT)) AS sm,
                      CAST(sum(pos) AS BIGINT) AS np
                    FROM r GROUP BY g, b),
          gap AS (SELECT g, n,
                    CAST(round(CAST(abs(np * 1000000 - sm) AS DOUBLE)
                      / CAST(n AS DOUBLE), 0) AS BIGINT) AS gp
                  FROM cells)
          SELECT g AS o_orderpriority, CAST(sum(n) AS BIGINT) AS n,
            round(CAST(sum(gp * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) / 1000000.0, 6) AS ece
          FROM gap GROUP BY g ORDER BY g"""
    },
    // aucRocBySegment replay: q217's midrank rank-sum per source
    // (PARTITION BY added to the cumulative window, grouped final agg).
    "q296_auc_by_segment" ->
      """WITH r AS (SELECT source AS g, CAST(floor(n_chars / 100) AS DOUBLE) AS v,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
                 FROM documents
                 WHERE n_chars IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL),
          c AS (SELECT g, v, CAST(sum(pos) AS BIGINT) AS cp, count(*) AS t
                FROM r GROUP BY g, v),
          cum AS (SELECT g, cp, t,
                    coalesce(sum(t) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
                  FROM c),
          a AS (SELECT g, CAST(sum(cp) AS BIGINT) AS n_pos,
                       CAST(sum(t - cp) AS BIGINT) AS n_neg,
                       sum(CAST(cp AS HUGEINT) * (before * 2 + t + 1)) AS r2p
                FROM cum GROUP BY g)
          SELECT g AS source, n_pos, n_neg,
                 CASE WHEN n_pos > 0 AND n_neg > 0
                      THEN round(CAST(r2p - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
                                 / CAST(CAST(n_pos AS HUGEINT) * n_neg * 2 AS DOUBLE), 6)
                 END AS auc
          FROM a ORDER BY source""",
    // neymanAllocation replay: decimal moments -> 6-dp sd -> micro
    // weights, integral quota + exact remainder, largest-remainder
    // seats, stratum-size cap.
    "q297_neyman_alloc" ->
      """WITH g AS (SELECT o_orderpriority AS h, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS s,
              CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS ss
            FROM orders GROUP BY o_orderpriority),
          a0 AS (SELECT h, n,
                   CASE WHEN n > 1 THEN round(sqrt((ss - s * s / n) / (n - 1)), 6) END AS sd
                 FROM g),
          w2 AS (SELECT h, n, sd,
                   CAST(round(n * sd * 1000000, 0) AS HUGEINT) AS wm
                 FROM a0 WHERE n > 1),
          t AS (SELECT h, n, sd, wm, sum(wm) OVER () AS wt FROM w2),
          q AS (SELECT h, n, sd, (1000 * wm) // wt AS q,
                  (1000 * wm) % wt AS rem FROM t WHERE wt > 0),
          fin AS (SELECT h, n, sd, q, rem,
                    1000 - sum(q) OVER () AS leftover,
                    row_number() OVER (ORDER BY rem DESC, h) AS rk FROM q),
          al AS (SELECT h,
                   least(q + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, n) AS alloc
                 FROM fin)
          SELECT a0.h AS o_orderpriority, CAST(a0.n AS BIGINT) AS n_rows, a0.sd,
            CAST(coalesce(al.alloc, 0) AS BIGINT) AS n_alloc
          FROM a0 LEFT JOIN al ON a0.h = al.h ORDER BY o_orderpriority""",
    // oofTargetEncode replay: md5 fold assignment, (cat, fold) cells,
    // cat/fold/global marginal windows, the identical smoothed-mean
    // expression shape.
    "q284_target_encode" -> {
      val fold = phashSql("'graft-te|' || CAST(o_orderkey AS VARCHAR)") + " % 5"
      s"""WITH r AS (SELECT o_orderkey, o_orderpriority AS cat,
                CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
                $fold AS fold
              FROM orders),
          c AS (SELECT cat, fold, count(*) AS n, CAST(sum(y) AS BIGINT) AS s
                FROM r GROUP BY cat, fold),
          m AS (SELECT cat, fold, n, s,
                sum(n) OVER (PARTITION BY cat) AS tn,
                sum(s) OVER (PARTITION BY cat) AS ts,
                sum(n) OVER (PARTITION BY fold) AS fn,
                sum(s) OVER (PARTITION BY fold) AS fs,
                sum(n) OVER () AS gn, sum(s) OVER () AS gs FROM c),
          e AS (SELECT cat, fold,
                round((CAST(ts - s AS DOUBLE)
                    + 20.0 * (CAST(gs - fs AS DOUBLE) / CAST(gn - fn AS DOUBLE)))
                  / (CAST(tn - n AS DOUBLE) + 20.0), 6) AS te FROM m)
          SELECT r.o_orderkey, r.cat AS o_orderpriority,
            CAST(r.fold AS BIGINT) AS fold, e.te
          FROM r JOIN e ON r.cat IS NOT DISTINCT FROM e.cat AND r.fold = e.fold
          ORDER BY r.o_orderkey"""
    },
    // isotonicCalibration replay: q218's score/label hashes, 20 bins,
    // then the minimax lattice as the same relational triple join —
    // pooled rates are single double divisions of exact counts.
    "q285_isotonic" -> {
      val sb = phashSql("'graft-cal|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      val lb = phashSql("'graft-lab|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      s"""WITH o AS (SELECT CAST($sb AS DOUBLE) / 1000000.0 AS s,
                       CAST($lb AS DOUBLE) AS lbd FROM orders),
          r AS (SELECT s, CASE WHEN lbd < s * 1000000.0 THEN 1 ELSE 0 END AS pos
                FROM o WHERE s >= 0 AND s <= 1),
          cells AS (SELECT CAST(least(floor(s * 20), 19) AS BIGINT) AS bin,
                      count(*) AS n, CAST(sum(pos) AS BIGINT) AS np
                    FROM r GROUP BY 1),
          spans AS (SELECT a.bin AS sa, b.bin AS sb2 FROM cells a, cells b
                    WHERE a.bin <= b.bin),
          pooled AS (SELECT sa, sb2,
                       CAST(sum(c.np) AS DOUBLE) / CAST(sum(c.n) AS DOUBLE) AS rate
                     FROM spans JOIN cells c ON c.bin BETWEEN sa AND sb2
                     GROUP BY sa, sb2),
          mn AS (SELECT i.bin, p.sa, min(p.rate) AS m
                 FROM cells i JOIN pooled p ON p.sa <= i.bin AND p.sb2 >= i.bin
                 GROUP BY i.bin, p.sa),
          iso AS (SELECT bin, max(m) AS iso FROM mn GROUP BY bin)
          SELECT c.bin, c.n,
            round(CAST(c.np AS DOUBLE) / CAST(c.n AS DOUBLE), 6) AS frac_pos,
            round(i.iso, 6) AS iso_fit
          FROM cells c JOIN iso i ON c.bin = i.bin ORDER BY c.bin"""
    },
    // conformalInterval replay: per-priority decimal-mean predictor from
    // the train split, the exact ⌈(n+1)·0.9⌉-th smallest 6-dp residual
    // via distinct-value cumulative counts, coverage on the test split.
    "q286_conformal" ->
      """WITH pred AS (SELECT o_orderpriority AS c,
              round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                / count(*), 6) AS pred
            FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_orderpriority),
          resid AS (SELECT round(abs(CAST(o.o_totalprice AS DOUBLE) - p.pred), 6) AS r
            FROM orders o JOIN pred p ON o.o_orderpriority = p.c
            WHERE o.o_orderkey % 3 = 1),
          nn AS (SELECT count(*) AS n FROM resid),
          cum AS (SELECT r, sum(cnt) OVER (ORDER BY r) AS cum
                  FROM (SELECT r, count(*) AS cnt FROM resid GROUP BY r)),
          q AS (SELECT min(r) AS q_hat FROM cum, nn
                WHERE cum >= least(nn.n,
                  CAST(ceil((nn.n + 1) * CAST(0.9 AS DOUBLE)) AS BIGINT))),
          t AS (SELECT o.o_orderpriority AS c, q.q_hat,
                  count(*) AS n_test,
                  CAST(sum(CASE WHEN round(abs(CAST(o.o_totalprice AS DOUBLE) - p.pred), 6)
                    <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
                FROM orders o JOIN pred p ON o.o_orderpriority = p.c, q
                WHERE o.o_orderkey % 3 = 2 GROUP BY o.o_orderpriority, q.q_hat)
          SELECT c AS o_orderpriority, q_hat, n_test, n_covered,
            round(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6) AS coverage
          FROM t ORDER BY o_orderpriority""",
    // q218's score/label hashes; rank()-1 = the strictly-smaller count,
    // same div-10 tile identity, cumulative windows over the tile table.
    "q228_lift" -> {
      val sb = phashSql("'graft-cal|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      val lb = phashSql("'graft-lab|' || CAST(o_orderkey AS VARCHAR)") + " % 1000000"
      s"""WITH o AS (SELECT CAST($sb AS DOUBLE) / 1000000.0 AS s,
                       CAST($lb AS DOUBLE) AS lbd
                  FROM orders),
          r AS (SELECT s,
                  CASE WHEN lbd < s * 1000000.0 THEN 1 ELSE 0 END AS pos
                FROM o),
          t AS (SELECT CAST((rank() OVER (ORDER BY s) - 1) * 10
                            // (SELECT count(*) FROM r) + 1 AS BIGINT) AS tile,
                       pos
                FROM r),
          g AS (SELECT tile, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos
                FROM t GROUP BY tile),
          w AS (SELECT tile, n, n_pos,
                  CAST(sum(n_pos) OVER () AS BIGINT) AS gt,
                  CAST(sum(n) OVER () AS BIGINT) AS nt,
                  CAST(sum(n_pos) OVER (ORDER BY tile DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp,
                  CAST(sum(n) OVER (ORDER BY tile DESC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn
                FROM g)
          SELECT tile, n, n_pos,
                 CASE WHEN gt > 0
                      THEN round(CAST(cp AS DOUBLE) / CAST(gt AS DOUBLE), 6) END AS cum_capture,
                 CASE WHEN gt > 0
                      THEN round((CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                                 / (CAST(gt AS DOUBLE) / CAST(nt AS DOUBLE)), 6) END AS lift
          FROM w ORDER BY tile DESC"""
    },
    // Same (subject, category) cell table; P-bar and P-e replay the
    // engine's exact decimal numerators and double division shapes.
    "q220_fleiss_kappa" ->
      """WITH d AS (SELECT doc_id, lang FROM documents WHERE lang IS NOT NULL),
          r AS (SELECT doc_id, lang AS rating FROM d
                UNION ALL
                SELECT doc_id, CASE WHEN doc_id % 10 = 0 THEN 'en' ELSE lang END FROM d
                UNION ALL
                SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN 'de' ELSE lang END FROM d),
          cells AS (SELECT doc_id AS s, rating AS j, count(*) AS c
                    FROM r GROUP BY 1, 2),
          ps AS (SELECT s, sum(CAST(c AS HUGEINT) * c) AS ss,
                        CAST(sum(c) AS BIGINT) AS n
                 FROM cells GROUP BY s),
          sa AS (SELECT count(*) AS subjects, min(n) AS nmn, max(n) AS nmx,
                        sum(ss) AS sumsq, CAST(sum(n) AS HUGEINT) AS tot
                 FROM ps),
          ca AS (SELECT sum(CAST(tj AS HUGEINT) * tj) AS sumtj2
                 FROM (SELECT rating, CAST(count(*) AS BIGINT) AS tj
                       FROM r GROUP BY rating)),
          k AS (SELECT subjects, nmn, nmx,
                       CAST(sumsq - tot AS DOUBLE)
                         / CAST(tot * (nmn - 1) AS DOUBLE) AS pbar,
                       CAST(sumtj2 AS DOUBLE) / CAST(tot * tot AS DOUBLE) AS pe
                FROM sa CROSS JOIN ca)
          SELECT subjects,
                 CASE WHEN nmn = nmx THEN nmn END AS ratings_per_subject,
                 CASE WHEN nmn = nmx AND nmn > 1 THEN round(pbar, 6) END AS p_bar,
                 round(pe, 6) AS p_e,
                 CASE WHEN nmn = nmx AND nmn > 1 AND pe < 1.0
                      THEN round((pbar - pe) / (1.0 - pe), 6) END AS kappa
          FROM k""",
    "q210_hll_rolling" -> {
      val hv = phashSql("'graft-hll|' || CAST(user_id AS VARCHAR)")
      s"""WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events),
          r AS (SELECT day, $hv % 64 AS bucket,
                   CASE WHEN $hv // 64 = 0 THEN 55
                        ELSE 55 - length(bin($hv // 64)) END AS rho
                 FROM e),
          reg AS (SELECT day, bucket, max(rho) AS mj
                  FROM r GROUP BY day, bucket),
          grid AS (SELECT d.day, b.bucket
                   FROM (SELECT DISTINCT day FROM reg) d
                   CROSS JOIN (SELECT DISTINCT bucket FROM reg) b),
          win AS (SELECT g.day, g.bucket,
                    max(reg.mj) OVER (PARTITION BY g.bucket ORDER BY g.day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mj
                  FROM grid g LEFT JOIN reg ON reg.day = g.day AND reg.bucket = g.bucket),
          cf AS (SELECT day, bucket, mj FROM win WHERE mj IS NOT NULL),
          agg AS (SELECT day, sum(power(2.0, -mj)) AS s, count(*) AS nb
                  FROM cf GROUP BY day),
          est AS (SELECT day, s + (64 - nb) AS den, 64 - nb AS v FROM agg)
          SELECT day,
                 round(CASE WHEN 0.709 * 64 * 64 / den <= 160.0 AND v > 0
                            THEN 64.0 * ln(64.0 / v)
                            ELSE 0.709 * 64 * 64 / den END, 6) AS hll_est
          FROM est ORDER BY day"""
    },
    "q163_hll_distinct" -> {
      val hv = phashSql("'graft-hll|' || CAST(user_id AS VARCHAR)")
      s"""WITH r AS (SELECT event_type, $hv % 64 AS bucket,
                   CASE WHEN $hv // 64 = 0 THEN 55
                        ELSE 55 - length(bin($hv // 64)) END AS rho
                 FROM events),
          reg AS (SELECT event_type, bucket, max(rho) AS mj
                  FROM r GROUP BY event_type, bucket),
          agg AS (SELECT event_type, sum(power(2.0, -mj)) AS s, count(*) AS nb
                  FROM reg GROUP BY event_type),
          est AS (SELECT event_type, s + (64 - nb) AS den, 64 - nb AS v FROM agg)
          SELECT event_type,
                 round(CASE WHEN 0.709 * 64 * 64 / den <= 160.0 AND v > 0
                            THEN 64.0 * ln(64.0 / v)
                            ELSE 0.709 * 64 * 64 / den END, 6) AS hll_est
          FROM est ORDER BY event_type"""
    },
    "q155_cms_join_size" -> {
      val ph = phashSql("'graft-cms|' || r || '|' || CAST(user_id AS VARCHAR)")
      s"""WITH kc AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
          sk AS (SELECT r, $ph % 1024 AS bucket, CAST(sum(c) AS BIGINT) AS cnt
                 FROM kc CROSS JOIN (SELECT unnest(range(4)) AS r) GROUP BY 1, 2),
          dp AS (SELECT r, sum(cnt * cnt) AS d FROM sk GROUP BY r),
          ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS exact_self_join FROM kc)
          SELECT CAST(min(d) AS BIGINT) AS cms_join_est,
                 min(exact_self_join) AS exact_self_join FROM dp, ex"""
    },
    "q156_full_domain_2d" -> {
      val wa = Seq(10L, 20L, 40L, 80L); val wb = Seq(5L, 10L, 25L, 50L)
      val combos = (for (la <- wa.indices; lb <- wb.indices)
        yield s"($la, $lb, ${wa(la)}, ${wb(lb)})").mkString(", ")
      s"""WITH lv(la, lb, wa, wb) AS (VALUES $combos),
          b AS (SELECT la, lb, wa, wb,
                       CAST(floor(p_retailprice / wa) AS BIGINT) * wa AS ba,
                       CAST(floor(p_size / wb) AS BIGINT) * wb AS bb, count(*) AS n
                FROM part CROSS JOIN lv GROUP BY la, lb, wa, wb, ba, bb),
          m AS (SELECT la, lb, min(n) AS mn FROM b GROUP BY la, lb),
          ch AS (SELECT la, lb FROM m WHERE mn >= 15 ORDER BY la + lb, la LIMIT 1),
          chw AS (SELECT ch.la, ch.lb, lv.wa, lv.wb
                  FROM ch JOIN lv ON lv.la = ch.la AND lv.lb = ch.lb)
          SELECT p_partkey,
                 CASE WHEN chw.la IS NULL THEN '*'
                      ELSE '[' || CAST(CAST(floor(p_retailprice / chw.wa) AS BIGINT) * chw.wa AS VARCHAR)
                        || ',' || CAST(CAST(floor(p_retailprice / chw.wa) AS BIGINT) * chw.wa + chw.wa AS VARCHAR) || ')'
                 END AS price_range,
                 CASE WHEN chw.lb IS NULL THEN '*'
                      ELSE '[' || CAST(CAST(floor(p_size / chw.wb) AS BIGINT) * chw.wb AS VARCHAR)
                        || ',' || CAST(CAST(floor(p_size / chw.wb) AS BIGINT) * chw.wb + chw.wb AS VARCHAR) || ')'
                 END AS size_range,
                 CAST(coalesce(chw.la, -1) AS BIGINT) AS glevel_a,
                 CAST(coalesce(chw.lb, -1) AS BIGINT) AS glevel_b
          FROM part LEFT JOIN chw ON true"""
    },
    "q157_scd2" ->
      """WITH log AS (SELECT doc_id, 1 AS version, false AS deleted FROM documents
            UNION ALL SELECT doc_id, 2, false FROM documents WHERE doc_id % 7 = 0
            UNION ALL SELECT doc_id, 3, true FROM documents WHERE doc_id % 11 = 3
            UNION ALL SELECT doc_id, 4, false FROM documents WHERE doc_id % 14 = 0),
          r AS (SELECT doc_id, version, deleted,
                       lead(version) OVER (PARTITION BY doc_id ORDER BY version) AS vt
                FROM log)
          SELECT doc_id, CAST(version AS BIGINT) AS version,
                 CAST(version AS BIGINT) AS valid_from, CAST(vt AS BIGINT) AS valid_to
          FROM r WHERE NOT deleted ORDER BY doc_id, version""",
    "q158_point_in_time" ->
      """WITH log AS (SELECT doc_id, 1 AS version, false AS deleted FROM documents
            UNION ALL SELECT doc_id, 2, false FROM documents WHERE doc_id % 7 = 0
            UNION ALL SELECT doc_id, 3, true FROM documents WHERE doc_id % 11 = 3
            UNION ALL SELECT doc_id, 4, false FROM documents WHERE doc_id % 14 = 0),
          dim AS (SELECT doc_id, version, deleted, version AS valid_from,
                         lead(version) OVER (PARTITION BY doc_id ORDER BY version) AS valid_to
                  FROM log),
          live AS (SELECT * FROM dim WHERE NOT deleted),
          probes AS (SELECT doc_id, 1 + doc_id % 4 AS pv FROM documents)
          SELECT p.doc_id, CAST(p.pv AS BIGINT) AS pv, CAST(d.version AS BIGINT) AS version
          FROM probes p JOIN live d USING (doc_id)
          WHERE d.valid_from <= p.pv AND (d.valid_to IS NULL OR d.valid_to > p.pv)
          ORDER BY p.doc_id""",
    "q149_global_rank" ->
      """WITH r AS (SELECT o_orderkey, o_totalprice,
                           CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS rnk,
                           count(*) OVER () AS n
                    FROM orders)
          SELECT o_orderkey, o_totalprice, rnk,
                 round((rnk - 1) * 1.0 / (n - 1), 6) AS pct
          FROM r""")
}
