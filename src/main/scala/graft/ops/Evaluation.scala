package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
    // cells feeds three consumers (row margins, col margins, totals);
    // persist the |labels|²-row table so the data aggregates once
    val cells = df.select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => cells.unpersist())
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
    // same three-consumer shape as cohensKappa: persist the cell table
    val cells = df.select(col(actualCol).cast("string").as("__a"),
        col(predCol).cast("string").as("__p"))
      .filter(col("__a").isNotNull && col("__p").isNotNull)
      .groupBy(col("__a"), col("__p"))
      .agg(count(lit(1)).as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => cells.unpersist())
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

  /** ROC AUC of a score column against a binary label, in its exact
    * rank-sum (Mann-Whitney) form: AUC = P(score⁺ > score⁻) +
    * ½·P(score⁺ = score⁻) = U⁺ / (n⁺·n⁻) with midranks for ties — the
    * threshold-free ranking-quality number for a model/quality-score
    * audit (threshold metrics like q216's F1 move with the operating
    * point; AUC doesn't).
    *
    * Determinism and scale are [[graft.ops.DataQuality.mannWhitneyU]]'s
    * contract verbatim: ranks come from the distinct-score counts table
    * via [[Ranking.globalPrefixSum]] (1024 monotone score buckets — a
    * continuous score's distinct domain is DATA-sized, so no `ORDER BY
    * score` global window), doubled midranks keep every intermediate
    * integer, and products widen to decimal(38) before multiplying
    * (2·R⁺ ≈ n⁺·2n ~ 1e24 at 1e12 rows — past a silent 64-bit wrap).
    * Rows with a NULL score or label are excluded (a null score can't
    * be ranked and must not count toward n⁺/n⁻ either — the ksTest
    * NULL contract). Output: one row (n_pos, n_neg, auc); auc is null
    * when either class is empty. */
  def aucRoc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val rows = df.select(col(scoreCol).cast("double").as("__v"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__pos"))
      .filter(col("__v").isNotNull && col(labelCol).isNotNull)
    val counts = rows.groupBy(col("__v"))
      .agg(sum(col("__pos")).as("__cp"), count(lit(1)).as("__t"))
    val cum = Ranking.valueCountsBefore(counts, "__v", "__t")
    val agg = cum.agg(
      sum(col("__cp")).as("n_pos"),
      sum(col("__t") - col("__cp")).as("n_neg"),
      // doubled positive rank-sum: midrank(v) = before + (t+1)/2, so
      // 2·R⁺ = Σ cp·(2·before + t + 1) stays integer under ties
      sum(dec(col("__cp")) * (col("__before") * 2 + col("__t") + 1)).as("__r2p"))
    // U⁺ = R⁺ − n⁺(n⁺+1)/2, all in decimal(38) before the one edge division
    val u2p = col("__r2p") - dec(col("n_pos")) * (col("n_pos") + 1)
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(u2p.cast("double")
          / (dec(col("n_pos")) * col("n_neg") * 2).cast("double"), 6))
        .as("auc"))
  }

  /** Calibration (reliability) table of a [0,1] score against a binary
    * label: `nBins` equal-width score bins, and per bin the count, the
    * mean predicted score, and the observed positive rate — the curve
    * whose diagonal gap is miscalibration (a model can rank perfectly,
    * q217's AUC = 1, and still be wildly over-confident).
    *
    * Determinism: the bin index is a pure projection
    * (least(floor(s·nBins), nBins−1) — the right edge closes the last
    * bin, the F1 equal-width convention); mean score accumulates in
    * micro-units (round(s·1e6) longs summed in decimal(38) — double
    * tree-aggregation order would make the mean run-dependent); both
    * ratios divide once at the edge, rounded 6 dp. One map-side-combined
    * aggregation; output is nBins rows. */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"calibrationBins: nBins=$nBins must be >= 2")
    val rows = df.select(col(scoreCol).cast("double").as("__s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__pos"))
      .filter(col("__s").isNotNull && col(labelCol).isNotNull
        && col("__s") >= 0 && col("__s") <= 1)
    rows
      .withColumn("bin",
        least(floor(col("__s") * nBins), lit(nBins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("__s") * 1e6, 0).cast("decimal(38,0)")).as("__sm"),
        sum(col("__pos")).as("__np"))
      .select(col("bin"), col("n"),
        round(col("__sm").cast("double") / 1e6
          / col("n").cast("double"), 6).as("mean_score"),
        round(col("__np").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"))
  }

  /** Cumulative gains / lift table: score-rank `nTiles`-iles (tile
    * `nTiles` = highest scores) with, walking DOWN from the top tile,
    * the cumulative share of positives captured and the lift over the
    * base rate — "the top 20% of scores capture 54% of positives at
    * 2.7× lift", the business-facing readout between [[aucRoc]]'s one
    * number and [[calibrationBins]]'s probability audit.
    *
    * Tiles are the exact tie-stable quantiles of the RFM identity
    * (before·`nTiles` div n + 1, computed on the distinct-score counts
    * table via [[Ranking.globalPrefixSum]] — no ntile, no data-sized
    * sort window, tied scores always share a tile). Heavy ties can
    * leave some tiles empty; rows are emitted for present tiles only.
    * Counts are exact longs; capture and lift are fixed-shape double
    * divisions at the edge, rounded 6 dp. */
  def liftTable(df: DataFrame, labelCol: String, scoreCol: String,
                nTiles: Int = 10): DataFrame = {
    require(nTiles >= 2, s"liftTable: nTiles=$nTiles must be >= 2")
    val rows = df.select(col(scoreCol).cast("double").as("__v"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__pos"))
      .filter(col("__v").isNotNull && col(labelCol).isNotNull)
    // the distinct-score counts feed three consumers (bounds probe,
    // row total, prefix-sum pass): persist so the data aggregates once
    val counts = rows.groupBy(col("__v"))
      .agg(sum(col("__pos")).as("__cp"), count(lit(1)).as("__t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => counts.unpersist())
    val nRow = counts.agg(sum(col("__t")).as("__n"))
    val tiles = Ranking.valueCountsBefore(counts, "__v", "__t")
      .crossJoin(broadcast(nRow))
      .withColumn("tile",
        (expr(s"(__before * $nTiles) div __n") + 1).cast("long"))
      .groupBy(col("tile"))
      .agg(sum(col("__t")).as("n"), sum(col("__cp")).as("n_pos"))
    // everything below runs over <= nTiles rows
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wTop = org.apache.spark.sql.expressions.Window.orderBy(col("tile").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tiles
      .withColumn("__gt", sum(col("n_pos")).over(wAll))
      .withColumn("__nt", sum(col("n")).over(wAll))
      .withColumn("__cp", sum(col("n_pos")).over(wTop))
      .withColumn("__cn", sum(col("n")).over(wTop))
      .select(col("tile"), col("n"), col("n_pos"),
        when(col("__gt") > 0,
          round(col("__cp").cast("double") / col("__gt").cast("double"), 6))
          .as("cum_capture"),
        when(col("__gt") > 0,
          round((col("__cp").cast("double") / col("__cn").cast("double"))
            / (col("__gt").cast("double") / col("__nt").cast("double")), 6))
          .as("lift"))
  }

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for N
    * raters, the multi-annotator generalization of [[cohensKappa]]
    * (which only compares two): input is one row per RATING
    * (subject, category); every subject must carry the same number of
    * ratings n (the classic fixed-panel design — kappa is null when
    * panel sizes differ, not silently wrong).
    *
    * Exact integer core over the (subject, category) count table:
    * P̄ = (ΣΣ c_ij² − N·n) / (N·n·(n−1)) and P̄e = Σ_j t_j² / (N·n)²
    * with every square/product in decimal(38); the two ratios and
    * κ = (P̄ − P̄e)/(1 − P̄e) are fixed-shape double divisions at the
    * edge (decimal(38) can't hold the cross-multiplied closed form at
    * 1e12 rows — (Nn)²·ΣΣc² ~ 1e48), rounded 6 dp, same shapes the
    * oracle replays. Scale: one map-side-combined aggregation to the
    * cell table; everything after is |subjects|+|categories| rows.
    * Output: one row (subjects, ratings_per_subject, p_bar, p_e,
    * kappa). */
  def fleissKappa(df: DataFrame, subjectCol: String,
                  categoryCol: String): DataFrame = {
    // cells feeds the per-subject squares AND the category totals
    val cells = df.select(col(subjectCol).as("__s"),
        col(categoryCol).cast("string").as("__j"))
      .filter(col("__s").isNotNull && col("__j").isNotNull)
      .groupBy(col("__s"), col("__j"))
      .agg(count(lit(1)).as("__c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => cells.unpersist())
    val perSubject = cells.groupBy(col("__s"))
      .agg(sum(dec(col("__c")) * col("__c")).as("__ss"),
        sum(col("__c")).as("__n"))
    val subjAgg = perSubject.agg(
      count(lit(1)).as("__subjects"),
      min(col("__n")).as("__nmn"), max(col("__n")).as("__nmx"),
      sum(col("__ss")).as("__sumsq"),
      sum(col("__n")).as("__tot"))
    val catAgg = cells.groupBy(col("__j")).agg(sum(col("__c")).as("__tj"))
      .agg(sum(dec(col("__tj")) * col("__tj")).as("__sumtj2"))
    val nTot = dec(col("__tot"))
    val nPer = col("__nmn")
    val pBar = (col("__sumsq") - nTot).cast("double") /
      (nTot * (nPer - 1)).cast("double")
    val pE = col("__sumtj2").cast("double") / (nTot * nTot).cast("double")
    subjAgg.crossJoin(broadcast(catAgg)).select(
      col("__subjects").as("subjects"),
      when(col("__nmn") === col("__nmx"), col("__nmn"))
        .as("ratings_per_subject"),
      when(col("__nmn") === col("__nmx") && nPer > 1, round(pBar, 6)).as("p_bar"),
      round(pE, 6).as("p_e"),
      when(col("__nmn") === col("__nmx") && nPer > 1 && pE < 1.0,
        round((pBar - pE) / (lit(1.0) - pE), 6)).as("kappa"))
  }
}
