package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: group whole documents into ~`budget`-token bins for
  * training-batch assembly (the "concat short docs into one context
  * window" pass every LLM data pipeline runs before tokenizer sharding).
  *
  * Bin id = floor(exclusive-prefix-sum(tokens) / budget) within a shard,
  * ordered by the document key: a pure window computation — one shuffle
  * on the shard column, deterministic, engine-portable. Documents are
  * never split; a document straddling a boundary belongs to the bin its
  * FIRST token falls in, so bins hold ~budget tokens and only the last
  * document of a bin may overflow it (bounded by the max doc length —
  * cap upstream with [[TextAnalysis.corpusFilter]]'s maxTokens).
  *
  * Scale: the window partitions by shard — parallelism = shard count, so
  * shard 100 TB into many sources/files upstream; within a shard the
  * running sum is the streaming pass a packer does anyway.
  */
object Packing {

  /** Assign each row a `bin` within its shard by token budget.
    * `orderCol` fixes the packing order (deterministic!); `tokenCol` is a
    * precomputed token count column. */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    shardCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    df.withColumn("bin",
      floor((sum(col(tokenCol)).over(w) - col(tokenCol)) / lit(budget.toDouble))
        .cast("long"))
  }

  /** Packing-efficiency report per shard over [[packSequences]] output:
    * bins used, docs per bin, mean fill (tokens/budget — >1 possible on
    * the overflow bin contract documented above), the share of bins
    * under 80% full, and the padding waste share
    * Σ max(0, budget − tokens_b) / (bins·budget) — the number that
    * tells a training-batch owner how much context-window is burned as
    * padding at the chosen budget. All counts exact integers; ratios
    * are single double divisions rounded 6 dp.
    *
    * Scale: one (shard, bin) map-side-combined aggregation of the
    * already-packed table, then one shard-keyed aggregation — both
    * metadata-scale after the first exchange. */
  def packingStats(packed: DataFrame, shardCol: String, tokenCol: String,
                   budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val bins = packed.groupBy(col(shardCol), col("bin"))
      .agg(sum(col(tokenCol)).as("__tok"), count(lit(1)).as("__docs"))
    bins.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("__docs")).as("n_docs"),
        sum(col("__tok")).as("__tt"),
        sum(when(col("__tok") < (budget * 0.8), 1L).otherwise(0L))
          .as("__under"),
        sum(greatest(lit(budget.toLong) - col("__tok"), lit(0L)))
          .as("__waste"))
      .select(col(shardCol), col("n_bins"), col("n_docs"),
        round(col("__tt").cast("double") / (col("n_bins") * budget)
          .cast("double"), 6).as("mean_fill"),
        round(col("__under").cast("double") / col("n_bins").cast("double"), 6)
          .as("underfull_share"),
        round(col("__waste").cast("double") / (col("n_bins") * budget)
          .cast("double"), 6).as("waste_share"))
  }
}
