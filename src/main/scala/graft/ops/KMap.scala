package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-map / δ-presence auditing: re-identification risk measured against
  * an external POPULATION table rather than the released sample itself.
  * k-anonymity within a sample overstates risk protection when the
  * attacker knows the sample came from a larger population (k-map:
  * El Emam & Dankar, JAMIA 2008; δ-presence: Nergiz, Atzori & Clifton,
  * SIGMOD 2007): what matters is how many POPULATION rows share the
  * class, and what fraction of them leaked into the sample.
  *
  * Scale: both tables reduce to per-class counts (map-side partial
  * aggregation, shuffle carries one row per class), then the class
  * tables join co-keyed on the QIs — null-safe ([[NullSafe]]), since
  * groupBy emits NULL-keyed classes that a plain `=` join would drop.
  * Nothing ever joins row-level data against row-level data.
  */
object KMap {

  /** Per-class presence audit: for every QI class present in `sample`,
    * its sample count, population count, and δ-presence ratio
    * n_sample/n_pop (6dp). Inner join: a sample drawn from the
    * population cannot have a class the population lacks — if the
    * inputs violate that, the dropped class is a data bug the caller
    * should hear about via the row-count mismatch, not a silent null. */
  def audit(sample: DataFrame, population: DataFrame,
            qis: Seq[String]): DataFrame = {
    val sc = sample.groupBy(qis.map(col): _*)
      .agg(count(lit(1)).as("n_sample"))
    val pc = population.groupBy(qis.map(col): _*)
      .agg(count(lit(1)).as("n_pop"))
    NullSafe.join(sc, pc, qis, "inner")
      .withColumn("ratio", round(col("n_sample") / col("n_pop"), 6))
  }

  /** k-map suppression: keep only sample rows whose QI class has at
    * least `k` POPULATION rows — the population-side analogue of
    * [[KAnonymity.suppress]]. One class-table semi-join back onto the
    * sample (null-safe, broadcastable: |classes| << |rows|). */
  def suppress(sample: DataFrame, population: DataFrame,
               qis: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val passing = population.groupBy(qis.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .select(qis.map(col): _*)
    NullSafe.semi(sample, passing, qis)
  }
}
