package graft.pipelines

import graft.SparkSpec
import graft.ops.TCloseness
import org.apache.spark.sql.functions._
import scala.util.Random

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  // ---- micro-fixture (FIXTURES.md §1): hand-verifiable E1 goldens -------
  // QI = (city, sex). Groups: (a,m)x4, (b,f)x3, (c,m)x2, (d,f)x1 -> k=3
  // keeps 7 of 10 rows in 2 groups.
  private val micro = Seq(
    ("a", "m", 1), ("a", "m", 0), ("a", "m", 1), ("a", "m", 0),
    ("b", "f", 1), ("b", "f", 1), ("b", "f", 0),
    ("c", "m", 1), ("c", "m", 0),
    ("d", "f", 1)
  ).toDF("city", "sex", "income")

  test("E1 on the micro-fixture matches hand-computed goldens") {
    val r = NaiveSuppressionPipeline.run(micro, Seq("city", "sex"), k = 3)
    assert(r.report.originalRows == 10 && r.report.anonymizedRows == 7)
    assert(r.report.nGroups == 2 && r.report.kMin == 3 && r.report.kMax == 4)
    assert(r.report.kSatisfied)
    assert(math.abs(r.report.suppressionRate - 0.3) < 1e-12)
    assert(math.abs(r.report.reidentificationRisk - 2.0 / 7) < 1e-12)
    assert(r.report.uniquenessRate == 0.0)
    // NCP: city 4->2 distinct (0.5), sex 2->2 (0.0) -> mean 0.25
    assert(math.abs(r.ncp - 0.25) < 1e-12)
  }

  // ---- synthetic Adult-like table (FIXTURES.md §1, deterministic) -------
  private lazy val adultish = {
    val rnd = new Random(42)
    val workclass = Seq("private", "gov", "self", null)
    val education = Seq("hs", "college", "masters", "phd")
    val marital = Seq("single", "married", "divorced")
    val country = Seq("us", "mx", "in", null)
    val rows = (1 to 2000).map { _ =>
      (18 + rnd.nextInt(60),
        workclass(rnd.nextInt(workclass.size)),
        education(rnd.nextInt(education.size)),
        marital(rnd.nextInt(marital.size)),
        if (rnd.nextInt(10) == 0) rnd.nextInt(5000) else 0,
        country(rnd.nextInt(country.size)),
        if (rnd.nextDouble() < 0.25) ">50K" else "<=50K")
    }
    rows.toDF("age", "workclass", "education", "marital_status",
      "capital_gain", "native_country", "income").na.drop("any").cache()
  }

  private val qis = Seq("age", "workclass", "education", "marital_status")

  test("E1 on adult-like data: invariants + determinism") {
    val r1 = NaiveSuppressionPipeline.run(adultish, qis, k = 5)
    val r2 = NaiveSuppressionPipeline.run(adultish, qis, k = 5)
    assert(r1.report == r2.report && r1.ncp == r2.ncp) // deterministic
    assert(r1.report.kMin >= 5 || r1.report.nGroups == 0)
    assert(r1.report.anonymizedRows <= r1.report.originalRows)
    assert(r1.report.reidentificationRisk <= 1.0 / 5 + 1e-12)
    assert(r1.ncp >= 0.0 && r1.ncp <= 1.0)
  }

  test("E3 on adult-like data: binned QIs, zero t-violations after filter") {
    val withOrd = TCloseness.ordinal(adultish, "income", "income_pos")
    val r = TClosenessPipeline.run(withOrd,
      qis = Seq("age", "workclass", "education"),
      sensitiveOrdinal = "income_pos", k = 5, t = 0.2,
      binCols = Map("age" -> 5))
    assert(r.report.kSatisfied)
    // the reference's own double-check: no surviving group violates t
    val v = TClosenessPipeline.violations(r,
      Seq("age", "workclass", "education"), "income_pos", t = 0.2)
    assert(v == 0, s"$v groups violate t after filtering")
    // binning replaced age: surviving domain has at most 5 values
    assert(r.anonymized.select("age").distinct().count() <= 5)
  }

  test("E2 on adult-like data: clusters cover rows, generalization lossy") {
    val (res, report, ncp) = ClusteringPipeline.run(adultish,
      numericCols = Seq("age", "capital_gain"),
      categoricalCols = Seq("education"), nClusters = 8)
    assert(res.clustered.count() == adultish.count())
    assert(report.nGroups <= 8 && report.nGroups >= 1)
    assert(ncp > 0.0 && ncp <= 1.0)
  }
}
