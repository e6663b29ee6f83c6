package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SyntheticDataSpec extends SparkSpec {
  import spark.implicits._

  private val src = (Seq.fill(700)("A") ++ Seq.fill(200)("B") ++ Seq.fill(100)("C"))
    .zipWithIndex.map { case (v, i) => (v, if (i % 4 == 0) "x" else "y") }
    .toDF("cat", "flag")

  test("fromMarginals: deterministic, domain-valued, marginal-convergent") {
    val out = SyntheticData.fromMarginals(src, Seq("cat", "flag"), n = 4000L)
    val rows = out.as[(Long, String, String)].collect()
    assert(rows.length == 4000)
    assert(rows.map(_._1).sorted.toSeq == (0L until 4000L))
    assert(rows.forall(r => Set("A", "B", "C")(r._2) && Set("x", "y")(r._3)))
    // reproducible
    val again = SyntheticData.fromMarginals(src, Seq("cat", "flag"), n = 4000L)
      .as[(Long, String, String)].collect()
    assert(rows.toSeq == again.toSeq)
    // marginal convergence: hash draws are uniform, so the synthetic
    // shares sit within a loose band of the source shares
    val share = rows.groupBy(_._2).view.mapValues(_.length / 4000.0).toMap
    assert(math.abs(share("A") - 0.7) < 0.05, share.toString)
    assert(math.abs(share("B") - 0.2) < 0.05, share.toString)
    // independence: no synthetic row copies a source row's joint beyond
    // what the product of marginals implies (smoke: both flags appear
    // under every cat)
    val joints = rows.map(r => (r._2, r._3)).toSet
    assert(joints.size == 6, joints.toString)
  }

  test("fromMarginals guards the domain and rejects empty columns") {
    intercept[IllegalArgumentException] {
      SyntheticData.fromMarginals(
        spark.range(200).select(col("id").cast("string").as("v")),
        Seq("v"), n = 10L, maxDomain = 100)
    }
    intercept[IllegalArgumentException] {
      SyntheticData.fromMarginals(
        Seq.empty[String].toDF("v"), Seq("v"), n = 10L)
    }
  }
}
