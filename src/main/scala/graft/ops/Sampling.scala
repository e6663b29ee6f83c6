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
}
