package graft.ml

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}

/** The single construction point for every KMeans fit in the engine
  * (IVF coarse quantizer, PQ sub-codebooks, clustering anonymizer), so
  * the degenerate-input contract lives in exactly one place:
  *
  * MLlib's KMeans returns FEWER than k centers when the training data
  * has fewer distinct points (its init dedups seeds) — so consumers must
  * size every downstream structure from the MODEL, never from the
  * requested k. [[roundedCenters]] is that sizing point for the two
  * centroid-table consumers; prediction consumers are safe by
  * construction (cluster ids always index actual centers).
  */
object GraftKMeans {

  /** Canonically-configured estimator: fixed seed for replayability,
    * explicit feature/prediction columns. */
  def estimator(k: Int, seed: Long, featuresCol: String,
                predictionCol: String): KMeans = {
    require(k >= 1, s"k=$k must be at least 1")
    new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol(predictionCol)
  }

  /** Cluster centers sized from the model (NOT the requested k), each
    * element rounded to 6dp before any routing comparison — the
    * rank-stability contract, with HALF_UP so an oracle replaying
    * trained centroids agrees on exact midpoints (math.rint would round
    * half-to-even). */
  def roundedCenters(model: KMeansModel): IndexedSeq[IndexedSeq[Double]] =
    model.clusterCenters.map(_.toArray.map(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .toIndexedSeq).toIndexedSeq
}
