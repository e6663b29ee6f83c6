package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the shuffle-free co-located join.
  *
  * A join between two big fact tables normally shuffles BOTH sides on the
  * join key — at 100 TB that exchange dominates the query. Writing each
  * table bucketed (hash-partitioned into a fixed number of files per key,
  * Spark's `bucketBy`) moves that shuffle to WRITE time, once: every
  * subsequent join between tables bucketed on the same key with the same
  * bucket count reads matching buckets side by side and the join plan has
  * ZERO exchanges — Catalyst sees the scans' HashPartitioning and drops
  * the shuffle requirement. `sortBy` additionally pre-sorts each bucket
  * file so sort-merge join can skip its per-task sort.
  *
  * This is the standard warehouse layout for repeatedly-joined 100 TB
  * fact tables (pay one shuffle at ingest; every downstream join and
  * `groupBy` on the bucket key is exchange-free). Aggregations whose keys
  * CONTAIN the bucket key also reuse the distribution — scan → join →
  * agg runs as one exchange-free stage pipeline.
  */
object Bucketing {

  /** Write `df` as a parquet table hash-bucketed AND per-bucket sorted on
    * `key`, at an explicit `path` (external table — survives the session;
    * re-registering in a new session is a `saveAsTable` away). EAGER: the
    * write (one shuffle-free pass; each task hashes rows to bucket files)
    * runs at call time. Returns the re-read bucketed relation. */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
                    numBuckets: Int): DataFrame = {
    require(numBuckets > 0, s"numBuckets $numBuckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
    df.sparkSession.table(table)
  }

  /** Equi-join of two registered bucketed tables on their shared bucket
    * key. The `merge` hint pins sort-merge join (a broadcast would hide
    * the point at toy scale; at 100 TB neither side broadcasts anyway);
    * with equal bucket counts on both sides the plan contains no
    * exchange. */
  def bucketedEquiJoin(spark: SparkSession, leftTable: String,
                       rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), Seq(key))
}
