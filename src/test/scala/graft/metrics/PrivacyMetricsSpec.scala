package graft.metrics

import graft.SparkSpec
import graft.ops.KAnonymity

class PrivacyMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def orig = Seq(
    (30, "A"), (30, "A"), (30, "A"),
    (40, "B"), (40, "B"),
    (50, "C")
  ).toDF("age", "zip")

  test("report on k=2 suppression") {
    val anon = KAnonymity.suppress(orig, Seq("age", "zip"), 2)
    val r = PrivacyMetrics.report(orig, anon, Seq("age", "zip"), 2)
    assert(r.originalRows == 6 && r.anonymizedRows == 5)
    assert(r.nGroups == 2 && r.kMin == 2 && r.kMax == 3)
    assert(r.kSatisfied)
    assert(r.uniquenessRate == 0.0)
    assert(math.abs(r.reidentificationRisk - 2.0 / 5.0) < 1e-12)
    assert(math.abs(r.suppressionRate - 1.0 / 6.0) < 1e-12)
  }

  test("report handles empty anonymized set") {
    val anon = KAnonymity.suppress(orig, Seq("age", "zip"), 100)
    val r = PrivacyMetrics.report(orig, anon, Seq("age", "zip"), 100)
    assert(r.anonymizedRows == 0 && r.suppressionRate == 1.0 && r.kSatisfied)
  }

  test("ncp measures distinct-value loss over QI columns") {
    val anon = KAnonymity.suppress(orig, Seq("age", "zip"), 2)
    // age: 3 -> 2 distinct, zip: 3 -> 2 distinct => mean((1/3 + 1/3)) /?? per-col avg
    val v = PrivacyMetrics.ncp(orig, anon, Seq("age", "zip"))
    assert(math.abs(v - (1.0 / 3 + 1.0 / 3) / 2) < 1e-12)
  }
}
