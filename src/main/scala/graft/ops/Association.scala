package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant's support/
  * confidence framing, VLDB 1994) for item PAIRS — the co-occurrence
  * miner behind "what co-occurs with X": which item pairs appear
  * together in more baskets than their individual popularities explain
  * (lift > 1), and how reliably one side implies the other
  * (confidence).
  *
  * Pairs-only is deliberate: at lake scale the useful part of apriori
  * is almost always the 2-itemset pass (longer itemsets explode
  * combinatorially and are post-filtered from pair stats anyway).
  *
  * Scale: baskets collapse to DISTINCT (basket, item) first; the pair
  * join is basket-keyed, so its surface is Σ_b |b|² — bounded by the
  * basket size (items per order), never corpus². Item supports are a
  * |items|-row table joined back by item key (broadcast-sized for any
  * real catalog). minSupport prunes BEFORE the support joins.
  */
object Association {

  /** Mine pair rules from one-row-per-(basket, item) input. Output: one
    * row per ordered rule a→b over unordered pairs passing `minPairs`
    * baskets — n_pairs, n_a, n_b, support/confidence/lift rounded 6 dp.
    */
  def pairRules(df: DataFrame, basketCol: String, itemCol: String,
                minPairs: Long = 2L): DataFrame = {
    require(minPairs >= 1, s"pairRules: minPairs=$minPairs must be >= 1")
    // the distinct (basket, item) table feeds FOUR consumers (basket
    // count, item supports, both sides of the pair join); persist it so
    // the corpus-sized distinct runs once — released via the
    // QueryCleanup handover contract
    val bi = df.select(col(basketCol).as("__b"),
        col(itemCol).cast("string").as("__i"))
      .filter(col("__i").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => bi.unpersist())
    val nBaskets = bi.agg(countDistinct(col("__b")).as("__nb"))
    val itemCounts = bi.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val pairs = bi.as("l")
      .join(bi.as("r"), col("l.__b") === col("r.__b")
        && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("__a"), col("r.__i").as("__bb"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minPairs)
    // both rule directions from one pair row, then per-item supports
    val rules = pairs
      .select(col("__a").as("antecedent"), col("__bb").as("consequent"),
        col("n_pairs"))
      .unionByName(pairs.select(col("__bb").as("antecedent"),
        col("__a").as("consequent"), col("n_pairs")))
      .join(itemCounts.withColumnRenamed("__i", "antecedent")
        .withColumnRenamed("__ni", "n_a"), Seq("antecedent"))
      .join(itemCounts.withColumnRenamed("__i", "consequent")
        .withColumnRenamed("__ni", "n_b"), Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
    rules.select(
      col("antecedent"), col("consequent"),
      col("n_pairs"), col("n_a"), col("n_b"),
      round(col("n_pairs").cast("double") / col("__nb").cast("double"), 6)
        .as("support"),
      round(col("n_pairs").cast("double") / col("n_a").cast("double"), 6)
        .as("confidence"),
      round(col("n_pairs").cast("double") * col("__nb").cast("double")
        / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
        .as("lift"))
  }
}
