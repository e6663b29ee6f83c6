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
    // to per-cluster min-max ranges. Deterministic integer-micro KMeans
    // (DeterministicKMeans) — the full fit unrolls in the SQL oracle, so
    // assignments AND ranges are hash-checked, not just invariant-checked.
    "q45_cluster_generalize" -> ((s, dir) => {
      // pre-fix the (2-dp) balance to decimal so the rendered range
      // strings are the engine-stable decimal form (the q14 contract)
      val c = Tables.customer(s, dir)
        .withColumn("c_acctbal", col("c_acctbal").cast("decimal(18,2)"))
      // memoKey: the fit is deterministic per dataset, so reps time
      // assignment + generalization, not re-training (r13 advice #5)
      ClusteringAnonymizer.anonymizeDeterministic(c,
        numericCols = Seq("c_acctbal"),
        categoricalCols = Seq("c_mktsegment"),
        nClusters = 10, memoKey = Some(s"q45|$dir")).generalized
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
        .withColumn("c_acctbal", col("c_acctbal").cast("decimal(18,2)"))
      ClusteringAnonymizer.anonymizeDeterministic(c,
        numericCols = Seq("c_acctbal"),
        categoricalCols = Seq("c_mktsegment"),
        nClusters = 10,
        generalizeColsOpt = Some(Seq("c_acctbal", "__idx_c_mktsegment")),
        memoKey = Some(s"q69|$dir"))
        .generalized
        .select(col("c_custkey"), col("cluster"), col("c_acctbal"),
          col("__idx_c_mktsegment").as("mktsegment_range"))
        .orderBy("c_custkey")
    }))

  /** DuckDB replay of the ENTIRE deterministic E2 fit (q45/q69): label
    * encode, exact-moment standardization to integer micros, the
    * quantile-spread init, `Iters` unrolled Lloyd rounds (assignment =
    * integer argmin with cid tie-break, update = half-away integer means,
    * empty clusters carry forward), final assignment, per-cluster min-max
    * range render. Every stage is the same arithmetic the Scala side
    * runs (DeterministicKMeans scaladoc maps the stages); CTEs are
    * MATERIALIZED — an inlined unroll would replay the whole chain once
    * per reference and explode exponentially. */
  private val Iters = 8
  private val K = 10

  private def kmeansOracleSql(multiCol: Boolean): String = {
    val seedRanks = (0 until K)
      .map(i => s"rn = ($i * nd) // $K + 1").mkString(" OR ")
    def iterBlock(t: Int): String = {
      val prev = if (t == 1) "k0" else s"k${t - 1}"
      s"""a$t AS MATERIALIZED (
            SELECT p.z0, p.z1, p.cnt, c.cid,
                   row_number() OVER (PARTITION BY p.z0, p.z1
                     ORDER BY (p.z0-c.c0)*(p.z0-c.c0) + (p.z1-c.c1)*(p.z1-c.c1), c.cid) AS rk
            FROM pts p CROSS JOIN $prev c),
          u$t AS MATERIALIZED (
            SELECT cid,
              CASE WHEN s0 >= 0 THEN (abs(s0)*2 + w) // (w*2) ELSE -((abs(s0)*2 + w) // (w*2)) END AS c0,
              CASE WHEN s1 >= 0 THEN (abs(s1)*2 + w) // (w*2) ELSE -((abs(s1)*2 + w) // (w*2)) END AS c1
            FROM (SELECT cid, sum(CAST(z0 AS HUGEINT) * cnt) AS s0,
                         sum(CAST(z1 AS HUGEINT) * cnt) AS s1,
                         CAST(sum(cnt) AS HUGEINT) AS w
                  FROM a$t WHERE rk = 1 GROUP BY cid)),
          k$t AS MATERIALIZED (
            SELECT p.cid, CAST(COALESCE(u.c0, p.c0) AS BIGINT) AS c0,
                   CAST(COALESCE(u.c1, p.c1) AS BIGINT) AS c1
            FROM $prev p LEFT JOIN u$t u USING (cid)),"""
    }
    val rangeCols =
      if (multiCol)
        """CAST(min(c_acctbal) AS VARCHAR) || '-' || CAST(max(c_acctbal) AS VARCHAR) AS r0,
           CAST(min(idx) AS VARCHAR) || '-' || CAST(max(idx) AS VARCHAR) AS r1"""
      else
        "CAST(min(c_acctbal) AS VARCHAR) || '-' || CAST(max(c_acctbal) AS VARCHAR) AS r0"
    val finalSelect =
      if (multiCol)
        """SELECT f.c_custkey, CAST(f.cid AS INTEGER) AS cluster, r.r0 AS c_acctbal,
                  r.r1 AS mktsegment_range"""
      else
        "SELECT f.c_custkey, CAST(f.cid AS INTEGER) AS cluster, r.r0 AS c_acctbal"
    s"""WITH codes AS MATERIALIZED (
          SELECT c_mktsegment,
                 CAST(row_number() OVER (ORDER BY c_mktsegment) - 1 AS DOUBLE) AS idx
          FROM (SELECT DISTINCT c_mktsegment FROM customer)),
        base AS MATERIALIZED (
          SELECT c.c_custkey, CAST(c.c_acctbal AS DECIMAL(18,2)) AS c_acctbal, co.idx
          FROM customer c JOIN codes co USING (c_mktsegment)),
        stats AS MATERIALIZED (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sx0,
                 CAST(sum(CAST(CAST(c_acctbal AS DOUBLE) * CAST(c_acctbal AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS sxx0,
                 count(c_acctbal) AS n0,
                 CAST(sum(CAST(idx AS DECIMAL(28,6))) AS DOUBLE) AS sx1,
                 CAST(sum(CAST(idx * idx AS DECIMAL(38,12))) AS DOUBLE) AS sxx1,
                 count(idx) AS n1
          FROM base),
        z AS MATERIALIZED (
          SELECT c_custkey, c_acctbal, idx,
            CASE WHEN sqrt((sxx0 - sx0*sx0/n0)/(n0-1)) > 0
                 THEN CAST(round((CAST(c_acctbal AS DOUBLE) - sx0/n0)
                      / sqrt((sxx0 - sx0*sx0/n0)/(n0-1)) * 1000000.0, 0) AS BIGINT)
                 ELSE 0 END AS z0,
            CASE WHEN sqrt((sxx1 - sx1*sx1/n1)/(n1-1)) > 0
                 THEN CAST(round((idx - sx1/n1)
                      / sqrt((sxx1 - sx1*sx1/n1)/(n1-1)) * 1000000.0, 0) AS BIGINT)
                 ELSE 0 END AS z1
          FROM base CROSS JOIN stats),
        pts AS MATERIALIZED (
          SELECT z0, z1, count(*) AS cnt FROM z GROUP BY 1, 2),
        ranked AS MATERIALIZED (
          SELECT z0, z1, row_number() OVER (ORDER BY z0, z1) AS rn,
                 count(*) OVER () AS nd FROM pts),
        k0 AS MATERIALIZED (
          SELECT z0 AS c0, z1 AS c1,
                 row_number() OVER (ORDER BY z0, z1) - 1 AS cid
          FROM ranked WHERE $seedRanks),
        ${(1 to Iters).map(iterBlock).mkString("\n")}
        asg AS MATERIALIZED (
          SELECT z.c_custkey, z.c_acctbal, z.idx, c.cid,
                 row_number() OVER (PARTITION BY z.c_custkey
                   ORDER BY (z.z0-c.c0)*(z.z0-c.c0) + (z.z1-c.c1)*(z.z1-c.c1), c.cid) AS rk
          FROM z CROSS JOIN k$Iters c),
        fin AS MATERIALIZED (
          SELECT c_custkey, c_acctbal, idx, cid FROM asg WHERE rk = 1),
        rng AS MATERIALIZED (
          SELECT cid, $rangeCols FROM fin GROUP BY cid)
        $finalSelect
        FROM fin f JOIN rng r USING (cid) ORDER BY c_custkey"""
  }

  val oracles: Map[String, String] = Map(
    "q45_cluster_generalize" -> kmeansOracleSql(multiCol = false),
    "q69_multicol_generalize" -> kmeansOracleSql(multiCol = true))
}
