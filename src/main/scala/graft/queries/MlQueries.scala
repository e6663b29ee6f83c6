package graft.queries

import graft.Tables
import graft.ml.{ClusteringAnonymizer, UtilityMetrics}
import graft.ops.Generalization
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
    }),

    // The reference's headline utility output: original-vs-anonymized RF
    // accuracy (naive-suppresion.py:115-118). Anonymization here is E2-style
    // resolution loss — the price feature coarsened to 5 equal-width bins.
    // Trained on a fixed 20% sample (~= the reference's 30k-row scale);
    // the utility estimate doesn't need the full table and training does
    // not get cheaper at 100 TB. Sampled by key HASH, not df.sample —
    // the engine's own reproducibility contract (Sampling.scala): same
    // keys in, same sample out, independent of partitioning.
    "q68_accuracy_drop" -> ((s, dir) => {
      val o = graft.ops.Sampling.hashSample(
        Tables.orders(s, dir), "o_orderkey", 0.2)
        .withColumn("high_value", (col("o_totalprice") > 200000).cast("string"))
      val anon = Generalization
        .equalWidthBin(o, "o_totalprice", 3, "__bin")
        .withColumn("o_totalprice", col("__bin").cast("double")).drop("__bin")
      val (orig, anonR, drop) = UtilityMetrics.accuracyDrop(o, anon,
        "high_value", Seq("o_totalprice", "o_orderstatus"), numTrees = 20)
      val spark = s
      import spark.implicits._
      Seq((orig.accuracy, anonR.accuracy, drop))
        .toDF("orig_accuracy", "anon_accuracy", "accuracy_drop")
    }),

    // E2 with EVERY QI generalized (clustering-anon.py:51): the numeric QI
    // and the label-encoded categorical QI are both replaced by their
    // cluster's min-max range.
    "q69_multicol_generalize" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      ClusteringAnonymizer.anonymize(c,
        numericCols = Seq("c_acctbal"),
        categoricalCols = Seq("c_mktsegment"),
        nClusters = 10,
        generalizeColsOpt = Some(Seq("c_acctbal", "__idx_c_mktsegment")))
        .generalized
        .select(col("c_custkey"), col("cluster"), col("c_acctbal"),
          col("__idx_c_mktsegment").as("mktsegment_range"))
        .orderBy("c_custkey")
    }))

  val oracles: Map[String, String] = Map.empty
}
