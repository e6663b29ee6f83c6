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

  test("aucRoc: midrank tie handling, perfect separation, degenerate class") {
    // pos {3, 2}, neg {1, 2}: pairs -> 3 beats both (2), 2 vs 1 (1),
    // 2 vs 2 tie (0.5) => U+ = 3.5, AUC = 3.5 / 4 = 0.875
    val df = Seq((true, 3.0), (true, 2.0), (false, 1.0), (false, 2.0))
      .toDF("y", "s")
    val r = Evaluation.aucRoc(df, "y", "s")
      .as[(Long, Long, Double)].head()
    assert(r == ((2L, 2L, 0.875)), r.toString)
    // perfect separation -> 1.0; inverted -> 0.0
    val sep = Seq((true, 10.0), (true, 9.0), (false, 2.0), (false, 1.0))
      .toDF("y", "s")
    assert(Evaluation.aucRoc(sep, "y", "s").select("auc").as[Double].head() == 1.0)
    val inv = Seq((false, 10.0), (true, 1.0)).toDF("y", "s")
    assert(Evaluation.aucRoc(inv, "y", "s").select("auc").as[Double].head() == 0.0)
    // single-class input -> auc null, counts still reported
    val one = Seq((true, 1.0), (true, 2.0)).toDF("y", "s")
    val d = Evaluation.aucRoc(one, "y", "s").collect().head
    assert(d.getLong(0) == 2L && d.getLong(1) == 0L && d.isNullAt(2))
    // null score / null label rows are excluded from BOTH counts
    val withNulls = Seq((Some(true), Some(3.0)), (Some(true), None),
      (None, Some(5.0)), (Some(false), Some(1.0))).toDF("y", "s")
    val n = Evaluation.aucRoc(withNulls, "y", "s")
      .as[(Long, Long, Double)].head()
    assert(n == ((1L, 1L, 1.0)), n.toString)
  }

  test("calibrationBins: bin edges, right-closed last bin, exact micro-mean") {
    val df = Seq((false, 0.05), (true, 0.15), (true, 0.95), (true, 1.0))
      .toDF("y", "s")
    val r = Evaluation.calibrationBins(df, "y", "s", nBins = 10)
      .orderBy("bin")
      .as[(Long, Long, Double, Double)].collect()
    assert(r(0) == ((0L, 1L, 0.05, 0.0)), r(0).toString)
    assert(r(1) == ((1L, 1L, 0.15, 1.0)), r(1).toString)
    // s = 1.0 closes into bin 9 (least(floor(10), 9)) with 0.95
    assert(r(2) == ((9L, 2L, 0.975, 1.0)), r(2).toString)
    assert(r.length == 3)
  }

  test("liftTable: tie-stable tiles, top-down capture and lift") {
    // 5 rows at score 1.0 (1 positive), 5 at 2.0 (4 positives), 2 tiles:
    // tile 2 = the high-score half -> capture 4/5, lift (4/5)/(5/10)=1.6
    val df = (Seq.fill(1)((true, 1.0)) ++ Seq.fill(4)((false, 1.0)) ++
      Seq.fill(4)((true, 2.0)) ++ Seq.fill(1)((false, 2.0))).toDF("y", "s")
    val r = Evaluation.liftTable(df, "y", "s", nTiles = 2)
      .orderBy($"tile".desc)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r(0) == ((2L, 5L, 4L, 0.8, 1.6)), r(0).toString)
    assert(r(1) == ((1L, 5L, 1L, 1.0, 1.0)), r(1).toString)
  }

  test("fleissKappa: hand panel, and non-uniform panels yield null") {
    // 3 subjects x 2 raters: (a,a) (a,b) (b,b) -> SS = 4+2+4 = 10,
    // P-bar = (10-6)/(3*2*1) = 2/3; t_a = t_b = 3, P-e = 18/36 = 0.5;
    // kappa = (2/3 - 1/2) / (1/2) = 1/3
    val df = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, "b"), (3, "b"))
      .toDF("subj", "cat")
    val r = Evaluation.fleissKappa(df, "subj", "cat")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r == ((3L, 2L, 0.666667, 0.5, 0.333333)), r.toString)
    // perfect agreement -> kappa 1
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y")).toDF("subj", "cat")
    assert(Evaluation.fleissKappa(perfect, "subj", "cat")
      .select("kappa").as[Double].head() == 1.0)
    // ragged panel (subject 2 rated three times) -> null kappa, not a wrong one
    val ragged = df.unionAll(Seq((2, "b")).toDF("subj", "cat"))
    val row = Evaluation.fleissKappa(ragged, "subj", "cat").collect().head
    assert(row.isNullAt(1) && row.isNullAt(4), row.toString)
  }

  test("isotonicCalibration: PAV pools the violating pair, leaves the rest") {
    // bins (nBins=4): bin0 2/4=0.5, bin1 1/4=0.25 (violation), bin2 3/4
    // PAV pools bins 0-1 to 3/8 = 0.375; bin2 stays 0.75
    def rows(score: Double, pos: Int, n: Int) =
      (0 until n).map(i => (score, i < pos))
    val df = (rows(0.1, 2, 4) ++ rows(0.3, 1, 4) ++ rows(0.6, 3, 4))
      .toDF("s", "y")
    val r = Evaluation.isotonicCalibration(df, "y", "s", nBins = 4)
      .orderBy("bin")
      .select("bin", "n", "frac_pos", "iso_fit")
      .as[(Long, Long, Double, Double)].collect()
    assert(r.toSeq == Seq((0L, 4L, 0.5, 0.375), (1L, 4L, 0.25, 0.375),
      (2L, 4L, 0.75, 0.75)), r.mkString(", "))
    // already-monotone input is a fixed point
    val mono = (rows(0.1, 1, 4) ++ rows(0.3, 2, 4) ++ rows(0.6, 3, 4))
      .toDF("s", "y")
    val m = Evaluation.isotonicCalibration(mono, "y", "s", nBins = 4)
      .orderBy("bin").select("frac_pos", "iso_fit")
      .as[(Double, Double)].collect()
    assert(m.forall { case (f, i) => f == i }, m.mkString(", "))
  }

  test("conformalInterval: q_hat is the exact ceil((n+1)(1-alpha))-th residual") {
    // predictor: mean 10 for cat x; calib residuals exactly 1..10;
    // k = ceil(11 * 0.9) = 10 -> q_hat = 10
    val train = Seq(("x", 10.0), ("x", 10.0)).toDF("c", "y")
    val calib = (1 to 10).map(i => ("x", 10.0 + i)).toDF("c", "y")
    val test0 = Seq(("x", 15.0), ("x", 25.0)).toDF("c", "y")
    val r = Evaluation.conformalInterval(train, calib, test0, "c", "y",
        alpha = 0.1)
      .select("c", "q_hat", "n_test", "n_covered", "coverage")
      .as[(String, Double, Long, Long, Double)].head()
    assert(r == (("x", 10.0, 2L, 1L, 0.5)), r.toString)
    // alpha = 0.5: k = ceil(11 * 0.5) = 6 -> q_hat = 6, nothing changes
    // about the exactness (no interpolation)
    val r2 = Evaluation.conformalInterval(train, calib, test0, "c", "y",
        alpha = 0.5).select("q_hat").as[Double].head()
    assert(r2 == 6.0, r2.toString)
  }

  test("ndcgAtK: hand DCG over the shared micro discounts; zero-rel guard") {
    val disc = Evaluation.discountMicros(3)
    val prefix = disc.scanLeft(0L)(_ + _).tail
    // ranks 1..3 with rel (F, T, T): DCG = d2 + d3, IDCG = prefix(2)
    val df = Seq((1L, 1L, false), (1L, 2L, true), (1L, 3L, true),
      (2L, 1L, false), (2L, 2L, false)).toDF("q", "rank", "rel")
    val got = Evaluation.ndcgAtK(df, "q", "rank", "rel", k = 3)
      .orderBy("q").select("q", "n_rel", "ndcg")
      .as[(Long, Long, Double)].collect()
    val expected = BigDecimal((disc(1) + disc(2)).toDouble / prefix(1).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 2L, expected), (2L, 0L, 0.0)),
      got.mkString(", "))
    // perfect ranking -> 1.0
    val perfect = Seq((1L, 1L, true), (1L, 2L, true)).toDF("q", "rank", "rel")
    assert(Evaluation.ndcgAtK(perfect, "q", "rank", "rel", k = 3)
      .select("ndcg").as[Double].head() == 1.0)
  }

  test("aucRocBySegment: per-segment midranks match the global op per slice") {
    // segment A reuses the aucRoc spec fixture (AUC 0.875); segment B is
    // perfectly separated (AUC 1); segment C has one class only (null)
    val df = Seq(("A", true, 3.0), ("A", true, 2.0), ("A", false, 1.0),
      ("A", false, 2.0), ("B", true, 9.0), ("B", false, 1.0),
      ("C", true, 5.0), ("C", true, 6.0)).toDF("seg", "y", "s")
    val got = Evaluation.aucRocBySegment(df, "seg", "y", "s")
      .orderBy("seg").collect()
    assert(got(0).getAs[Double]("auc") == 0.875, got(0).toString)
    assert(got(1).getAs[Double]("auc") == 1.0, got(1).toString)
    assert(got(2).isNullAt(got(2).fieldIndex("auc")), got(2).toString)
    // cross-check segment A against the global op on its slice
    val global = Evaluation.aucRoc(df.filter($"seg" === "A"), "y", "s")
      .select("auc").as[Double].head()
    assert(got(0).getAs[Double]("auc") == global)
  }

  test("conformalIntervalByGroup: per-category q_hat tracks each group's noise") {
    // cat x residuals 1..10 (q_hat = 10), cat y residuals 10..100 by 10
    // (q_hat = 100) — a global q_hat would mis-cover both
    val train = Seq(("x", 10.0), ("x", 10.0), ("y", 50.0), ("y", 50.0))
      .toDF("c", "y")
    val calib = ((1 to 10).map(i => ("x", 10.0 + i)) ++
      (1 to 10).map(i => ("y", 50.0 + 10 * i))).toDF("c", "y")
    val test0 = Seq(("x", 15.0), ("x", 30.0), ("y", 100.0), ("y", 200.0))
      .toDF("c", "y")
    val got = Evaluation.conformalIntervalByGroup(train, calib, test0,
        "c", "y", alpha = 0.1)
      .orderBy("c").select("c", "q_hat", "n_covered")
      .as[(String, Double, Long)].collect()
    // x: |15-10|=5 <= 10 covered, |30-10|=20 not; y: 50 <= 100, 150 <= 100? no
    assert(got.toSeq == Seq(("x", 10.0, 1L), ("y", 100.0, 1L)),
      got.mkString(", "))
  }

  test("eceBySegment: hand gaps — (4·0.2 + 4·0.05)/8 = 0.125") {
    // bin0: conf 0.05, obs 0.25 (gap 0.2); bin9: conf 0.95, obs 1.0 (gap 0.05)
    val df = ((1 to 4).map(i => ("s", 0.05, i == 1)) ++
      (1 to 4).map(_ => ("s", 0.95, true))).toDF("seg", "sc", "y")
    val r = Evaluation.eceBySegment(df, "seg", "y", "sc", nBins = 10)
      .select("seg", "n", "ece").as[(String, Long, Double)].head()
    assert(r == (("s", 8L, 0.125)), r.toString)
    // perfectly calibrated bins -> 0
    val cal = ((1 to 4).map(i => ("s", 0.25, i == 1)) ++
      (1 to 4).map(i => ("s", 0.75, i <= 3))).toDF("seg", "sc", "y")
    assert(Evaluation.eceBySegment(cal, "seg", "y", "sc", nBins = 2)
      .select("ece").as[Double].head() == 0.0)
  }
}
