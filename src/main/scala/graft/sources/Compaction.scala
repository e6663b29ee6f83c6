package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB lake needs. Streaming ingest and fine-grained partitioning
  * accumulate thousands of tiny parquet files; each costs a task, a
  * footer read, and an object-store request, so scan latency degrades
  * far below data-size expectations. Compaction rewrites a directory
  * into ~`targetBytes` files, restoring healthy scan parallelism.
  *
  * The rewrite uses `repartitionByRange` on a sort column rather than a
  * plain `repartition`: each output file then covers a tight, disjoint
  * range of the column, so the parquet min/max footer statistics let
  * downstream range predicates skip whole files (the data-layout half of
  * compaction — what table formats call clustering). One range exchange
  * over the input is the entire cost.
  */
object Compaction {

  /** Rewrite the parquet directory `inDir` into `outDir` as
    * ceil(inputBytes / targetBytes) range-clustered files sorted by
    * `sortCol`. Input size comes from the relation's file statistics (no
    * data scan). EAGER: the rewrite runs at call time. Returns the
    * output file count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              sortCol: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val df = spark.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1L, (bytes.toLong + targetBytes - 1) / targetBytes).toInt
    df.repartitionByRange(n, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
