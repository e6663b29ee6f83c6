package graft.ops

class AssociationSpec extends graft.SparkSpec {
  import spark.implicits._

  test("pairRules: hand-computed support/confidence/lift, both directions") {
    // baskets: {A,B}, {A,B}, {A,C}, {B} -> n_baskets=4
    // AB: n=2, n_A=3, n_B=3 -> supp 0.5, conf A->B 2/3, lift 2*4/9
    val bi = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B")).toDF("b", "i")
    val r = Association.pairRules(bi, "b", "i", minPairs = 2L)
      .orderBy("antecedent", "consequent")
      .select("antecedent", "consequent", "n_pairs", "n_a", "n_b",
        "support", "confidence", "lift")
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect()
    // only the A-B pair survives minPairs=2 ({A,C} appears once)
    assert(r.toSeq == Seq(
      ("A", "B", 2L, 3L, 3L, 0.5, 0.666667, 0.888889),
      ("B", "A", 2L, 3L, 3L, 0.5, 0.666667, 0.888889)), r.mkString(","))
  }

  test("pairRules: duplicate items in one basket count once; guard trips") {
    val bi = Seq((1L, "A"), (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"))
      .toDF("b", "i")
    val r = Association.pairRules(bi, "b", "i", minPairs = 1L)
      .filter($"antecedent" === "A")
      .select("n_pairs", "n_a").as[(Long, Long)].head()
    assert(r == ((2L, 2L)), r.toString)
    intercept[IllegalArgumentException](
      Association.pairRules(bi, "b", "i", minPairs = 0L))
  }

  test("pairRules: independent items land at lift 1") {
    // A in every basket, B in every basket -> P(AB) = P(A)P(B) = 1
    val bi = (1L to 8L).flatMap(b => Seq((b, "A"), (b, "B"))).toDF("b", "i")
    val r = Association.pairRules(bi, "b", "i")
      .select("support", "confidence", "lift")
      .as[(Double, Double, Double)].collect()
    assert(r.forall(_ == ((1.0, 1.0, 1.0))), r.mkString(","))
  }
}
