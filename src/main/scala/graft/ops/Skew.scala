package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for heavy-hitter group keys (SURVEY
  * §7.4 "skewed QI groups at scale").
  *
  * AQE's skew-join splitting handles joins automatically; for AGGREGATES
  * over a skewed key the classic fix is salting: shard each key into
  * `saltBuckets` sub-keys, aggregate the shards (map-side combine now
  * spreads the heavy key over many reducers), then aggregate the shard
  * partials. Semantics are identical to the direct groupBy for any
  * decomposable aggregate; q54 proves it against the plain-SQL oracle.
  *
  * The salt is `pmod(hash(random-ish row attr), buckets)` — here a cheap
  * deterministic spread over an unrelated column so results stay
  * reproducible for the oracle (production would use rand()).
  */
object Skew {

  /** Salted two-stage count/sum per key set. `spreadCol` is any column
    * with per-row variation (an id) used to derive the deterministic salt. */
  def saltedAgg(df: DataFrame, keys: Seq[String], spreadCol: String,
                sumCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(spreadCol)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pc"), sum(col(sumCol)).as("__ps"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__pc").as("n_rows"), round(sum("__ps"), 2).as("sum_value"))
  }
}
