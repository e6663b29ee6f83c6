package graft.queries

import graft.Tables
import graft.ml.{ClusteringAnonymizer, UtilityMetrics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML-boundary queries (SURVEY §2.9, pipeline E2). KMeans/RF outputs are
  * engine-specific (no DuckDB oracle — the driver records a rows-only
  * check); invariants are asserted in ClusteringMlSpec instead.
  */
object MlQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // E2: cluster customers on (acctbal, mktsegment), generalize acctbal
    // to per-cluster min-max ranges.
    "q45_cluster_generalize" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      ClusteringAnonymizer.anonymize(c,
        numericCols = Seq("c_acctbal"),
        categoricalCols = Seq("c_mktsegment"),
        nClusters = 10).generalized
        .select("c_custkey", "cluster", "c_acctbal")
        .orderBy("c_custkey")
    }),

    // M4-M6: RF accuracy predicting order priority band from order facts
    // (single-row utility report).
    "q46_rf_utility" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("high_value", (col("o_totalprice") > 200000).cast("string"))
      val r = UtilityMetrics.rfAccuracy(o, "high_value",
        Seq("o_totalprice", "o_orderstatus"), numTrees = 20)
      val spark = s
      import spark.implicits._
      Seq((r.accuracy, r.trainRows, r.testRows))
        .toDF("accuracy", "train_rows", "test_rows")
    }))

  val oracles: Map[String, String] = Map.empty
}
