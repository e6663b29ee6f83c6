package graft.ops

class EvaluationSpec extends graft.SparkSpec {
  import spark.implicits._

  test("cohensKappa: textbook 2x2 table, perfect and chance-level agreement") {
    // Cohen's worked shape: cells (a,a)=20 (a,b)=5 (b,a)=10 (b,b)=15
    // n=50 d=35 po=0.7; S = 25*30 + 25*20 = 1250; kappa = (35*50-1250)
    // / (2500-1250) = 500/1250 = 0.4
    val df = (Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))).toDF("r1", "r2")
    val r = Evaluation.cohensKappa(df, "r1", "r2")
      .select("n", "po", "pe", "kappa")
      .as[(Long, Double, Double, Double)].head()
    assert(r == ((50L, 0.7, 0.5, 0.4)), r.toString)
    // perfect agreement -> kappa 1
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("r1", "r2")
    assert(Evaluation.cohensKappa(perfect, "r1", "r2")
      .select("kappa").as[Double].head() == 1.0)
    // both raters constant: chance agreement total -> kappa null
    val const = Seq(("x", "x"), ("x", "x")).toDF("r1", "r2")
    assert(Evaluation.cohensKappa(const, "r1", "r2")
      .select("kappa").collect().head.isNullAt(0))
  }

  test("classificationReport: hand confusion matrix incl. a never-predicted class") {
    // actual a: 3 (2 hit, 1 -> b); actual b: 2 (1 hit, 1 -> c);
    // class c never actual, predicted once
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"))
      .toDF("y", "yhat")
    val r = Evaluation.classificationReport(df, "y", "yhat")
      .orderBy("label")
      .select("label", "support", "tp", "fp", "fn", "precision", "recall", "f1")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect()
    assert(r(0) == (("a", 3L, 2L, 0L, 1L, Some(1.0), Some(0.666667),
      Some(0.8))), r(0).toString)
    assert(r(1) == (("b", 2L, 1L, 1L, 1L, Some(0.5), Some(0.5),
      Some(0.5))), r(1).toString)
    // c: support 0, tp 0, fp 1 -> precision 0, recall null, f1 0
    assert(r(2) == (("c", 0L, 0L, 1L, 0L, Some(0.0), None, Some(0.0))),
      r(2).toString)
  }
}
