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
}
