package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMapSpec extends SparkSpec {
  import spark.implicits._

  // population of 10: class A has 6 rows, class B has 3, class C has 1;
  // the sample drew 2 from A, 2 from B, 1 from C
  private lazy val pop = Seq(
    "A", "A", "A", "A", "A", "A", "B", "B", "B", "C"
  ).zipWithIndex.map { case (q, i) => (i.toLong, q) }.toDF("id", "qi")
  private lazy val sample = pop.filter($"id".isin(0L, 1L, 6L, 7L, 9L))

  test("audit reports per-class sample/population counts and delta-presence ratio") {
    val got = KMap.audit(sample, pop, Seq("qi"))
      .select("qi", "n_sample", "n_pop", "ratio")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got == Set(("A", 2L, 6L, 0.333333), ("B", 2L, 3L, 0.666667),
      ("C", 1L, 1L, 1.0)))
  }

  test("suppress keeps only sample rows whose POPULATION class reaches k") {
    val got = KMap.suppress(sample, pop, Seq("qi"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(got == Set(0L, 1L, 6L, 7L)) // C's lone member suppressed
    // population-side k: class B has only 2 SAMPLE rows but 3 population
    // rows, so k=3 keeps it — sample-side k-anonymity would not
    val kanon = KAnonymity.suppress(sample, Seq("qi"), 3)
      .select("id").as[Long].collect().toSet
    assert(!kanon.contains(6L) && got.contains(6L))
  }

  test("audit and suppress keep NULL-keyed classes (null-safe joins)") {
    val p = Seq((1L, Some("x")), (2L, None), (3L, None), (4L, None)).toDF("id", "qi")
    val s = p.filter($"id".isin(2L, 3L))
    val audit = KMap.audit(s, p, Seq("qi"))
      .select("n_sample", "n_pop").as[(Long, Long)].collect().toSet
    assert(audit == Set((2L, 3L)))
    val kept = KMap.suppress(s, p, Seq("qi"), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }
}
