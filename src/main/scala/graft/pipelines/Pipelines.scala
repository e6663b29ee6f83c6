package graft.pipelines

import graft.metrics.{PrivacyMetrics, PrivacyReport}
import graft.ml.{ClusteringAnonymizer, ClusteringResult}
import graft.ops.{Generalization, KAnonymity, TCloseness}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three entry-point scripts as composable pipelines
  * (SURVEY §3 E1/E2/E3). Each is a pure DataFrame → result function; the
  * anonymized DataFrame is cached before the metric fan-out so the five
  * metric aggregates don't recompute the suppression (SURVEY §4 "metric
  * fan-out recomputation").
  */
/** `emdBasis` (E3 only): the table whose sensitive distribution the
  * t-closeness filter measured groups against — the k-anonymized binned
  * input. The violation recheck must reuse it: suppression shifts the
  * surviving table's own distribution, so rechecking against the OUTPUT's
  * distribution can flag boundary groups the filter correctly admitted. */
final case class AnonymizationResult(
    anonymized: DataFrame,
    report: PrivacyReport,
    ncp: Double,
    emdBasis: Option[DataFrame] = None)

object NaiveSuppressionPipeline {
  /** E1 (naive-suppresion.py): k-anonymity by record suppression over the
    * QI set, then the printed metric block. */
  def run(df: DataFrame, qis: Seq[String], k: Int): AnonymizationResult = {
    val anonymized = KAnonymity.suppress(df, qis, k).cache()
    val report = PrivacyMetrics.report(df, anonymized, qis, k)
    val ncp = PrivacyMetrics.ncp(df, anonymized, qis)
    AnonymizationResult(anonymized, report, ncp)
  }
}

object ClusteringPipeline {
  /** E2 (clustering-anon.py): label-encode + scale + KMeans, per-cluster
    * min-max generalization, metrics against the cluster grouping. */
  def run(df: DataFrame, numericCols: Seq[String], categoricalCols: Seq[String],
          nClusters: Int, seed: Long = 42L): (ClusteringResult, PrivacyReport, Double) = {
    val res = ClusteringAnonymizer.anonymize(df, numericCols, categoricalCols,
      nClusters, seed)
    val clustered = res.clustered.cache()
    val report = PrivacyMetrics.report(df, clustered, Seq("cluster"), k = 1)
    val ncp = PrivacyMetrics.ncp(df, res.generalized, numericCols)
    (res, report, ncp)
  }
}

object TClosenessPipeline {
  /** E3 (t-closeness.py, INTENDED semantics — SURVEY §3): equal-width-bin
    * the numeric QIs, k-anonymity, then suppress groups whose sensitive
    * distribution sits further than t (1-D EMD) from the global one.
    *
    * `binCols` maps numeric QI -> bin count (age->5, capital->3 in the
    * reference); binned columns REPLACE the originals in the QI set, like
    * the reference's in-place `df_qi['age'] = pd.cut(...)`.
    */
  def run(df: DataFrame, qis: Seq[String], sensitiveOrdinal: String,
          k: Int, t: Double, binCols: Map[String, Int] = Map.empty): AnonymizationResult = {
    val binned = binCols.foldLeft(df) { case (acc, (c, n)) =>
      Generalization.equalWidthBin(acc, c, n, c + "__bin")
        .drop(c).withColumnRenamed(c + "__bin", c)
    }
    val anonymized = TCloseness.filter(binned, qis, sensitiveOrdinal, k, t).cache()
    val report = PrivacyMetrics.report(binned, anonymized, qis, k)
    val ncp = PrivacyMetrics.ncp(binned, anonymized, qis)
    AnonymizationResult(anonymized, report, ncp,
      emdBasis = Some(KAnonymity.suppress(binned, qis, k)))
  }

  /** The reference's own self-check (t-closeness.py:134-143): after the
    * filter, zero groups may violate t — against the SAME distribution
    * basis the filter used (see [[AnonymizationResult.emdBasis]]). */
  def violations(result: AnonymizationResult, qis: Seq[String],
                 sensitiveOrdinal: String, t: Double): Long =
    TCloseness.violationCount(result.anonymized, qis, sensitiveOrdinal, t,
      reference = result.emdBasis)
}
