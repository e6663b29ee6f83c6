package graft.ops

import graft.functions.PortableHash.puniform
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic microdata release from 1-way marginals: generate `n` rows
  * whose per-column value distributions converge to the source table's,
  * with columns drawn INDEPENDENTLY — the classic disclosure-control
  * release (a synthetic row matches no real individual by construction;
  * joint correlations are deliberately destroyed, which is the privacy
  * property AND the stated utility limit). Compose with
  * [[DifferentialPrivacy.dpHistogram]] upstream for DP marginals, or
  * [[DataQuality.chiSquareIndependence]] downstream to verify how much
  * association was erased.
  *
  * Mechanism: inverse-CDF over each column's exact marginal. Row i's
  * draw for column c is u = puniform(salt|c|i) (deterministic,
  * engine-portable — the q42 noise contract), mapped through the
  * cumulative distribution: the FIRST value (in value-sorted order)
  * whose cumulative fraction ≥ u. Cumulative fractions are exact
  * integer ratios (cumCount/total, one IEEE division each), so an
  * external engine replays every synthetic cell bit-for-bit.
  *
  * Scale shape: the marginal per column is one tiny aggregation; the
  * collected (value, count) list is a BOUNDED-DOMAIN artifact
  * (`maxDomain`-guarded, like Generalization's level tables) that
  * compiles into a codegen'd CASE chain — generation itself is a pure
  * per-row projection over `spark.range(n)`, embarrassingly parallel,
  * no joins, no shuffle. Continuous columns should be binned first
  * (Generalization.equiWidth / equiDepth) — the guard makes that
  * explicit rather than letting a high-cardinality CASE chain blow up
  * codegen.
  */
object SyntheticData {

  /** Generate `n` synthetic rows over `cols` from `df`'s marginals.
    * Output: `sid` (0-based synthetic id) + one column per input col
    * (string-typed — the marginal domain). Null source values are
    * excluded from the marginals. */
  def fromMarginals(df: DataFrame, cols: Seq[String], n: Long,
                    salt: String = "graft-synth",
                    maxDomain: Int = 100): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(n >= 1, s"n=$n must be positive")
    val spark = df.sparkSession
    val base = spark.range(n).select(col("id").as("sid"))
    cols.foldLeft(base) { (acc, c) =>
      // bounded-domain collect: |distinct values| rows of (value, count).
      // The LIMIT caps the driver transfer at maxDomain+1 rows, so a
      // high-cardinality (e.g. continuous) column fails fast with the
      // bin-it-first error instead of collecting an unbounded marginal;
      // when the guard passes, the capped probe IS the complete marginal.
      val probe = df.filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("__v"))
        .agg(count(lit(1)).as("__cnt"))
        .limit(maxDomain + 1)
        .collect()
      require(probe.nonEmpty, s"column $c has no non-null values")
      require(probe.length <= maxDomain,
        s"column $c has > maxDomain=$maxDomain distinct values — " +
          "bin it first (Generalization.equiWidth/equiDepth)")
      val marg = probe.map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      val total = marg.map(_._2).sum.toDouble
      val cums = marg.scanLeft(("", 0L)) { case ((_, acc0), (v, cnt)) =>
        (v, acc0 + cnt)
      }.tail.map { case (v, cum) => (v, cum / total) }
      val u = puniform(concat_ws("|", lit(salt), lit(c), col("sid")))
      // codegen'd CASE chain in value order; the last arm is the
      // unreachable-but-total fallback (u < 1 always, last cum == 1.0)
      val chain: Column = cums.init.foldLeft(Option.empty[Column]) {
        case (accCol, (v, cum)) =>
          val w = accCol match {
            case None      => when(u <= lit(cum), lit(v))
            case Some(col0) => col0.when(u <= lit(cum), lit(v))
          }
          Some(w)
      } match {
        case Some(w) => w.otherwise(lit(cums.last._1))
        case None    => lit(cums.last._1)
      }
      acc.withColumn(c, chain)
    }
  }
}
