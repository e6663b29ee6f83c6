package graft.ops

class SurvivalSpec extends graft.SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring between events") {
    // durations (observed): 1(d), 2(censored), 3(d), 4(d), 5(censored)
    // t=1: n=5, d=1 -> S=0.8; t=3: n=3 (censor at 2 left) -> S=0.8*2/3;
    // t=4: n=2 -> S=0.8*2/3*1/2; censored times emit no step row
    val df = Seq(("g", 1L, 1L), ("g", 2L, 0L), ("g", 3L, 1L),
      ("g", 4L, 1L), ("g", 5L, 0L)).toDF("g", "t", "e")
    val r = Survival.kaplanMeier(df, "g", "t", "e")
      .orderBy("t").select("t", "n_risk", "d_events", "survival")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.length == 3, r.mkString(","))
    assert(r(0) == ((1L, 5L, 1L, 0.8)), r(0).toString)
    assert(r(1) == ((3L, 3L, 1L, 0.533333)), r(1).toString)
    assert(r(2) == ((4L, 2L, 1L, 0.266667)), r(2).toString)
  }

  test("kaplanMeier: extinction hits exact zero; censored-only group is empty") {
    val df = Seq(("a", 1L, 1L), ("a", 1L, 1L), ("a", 2L, 1L),
      ("b", 9L, 0L), ("b", 9L, 0L)).toDF("g", "t", "e")
    val r = Survival.kaplanMeier(df, "g", "t", "e")
      .orderBy("g", "t").select("g", "t", "survival")
      .as[(String, Long, Double)].collect()
    // group a: t=1 S=1/3; t=2 all remaining die -> S exactly 0.0
    assert(r.toSeq == Seq(("a", 1L, 0.333333), ("a", 2L, 0.0)), r.mkString(","))
  }

  test("kaplanMeier: ties at one time count as a single multi-death step") {
    val df = (Seq.fill(3)(("g", 2L, 1L)) ++ Seq.fill(7)(("g", 5L, 0L)))
      .toDF("g", "t", "e")
    val r = Survival.kaplanMeier(df, "g", "t", "e")
      .select("t", "n_risk", "d_events", "survival")
      .as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((2L, 10L, 3L, 0.7)), r.mkString(","))
  }

  test("logRank: hand-worked two-arm table") {
    // A dies at 1,2; B dies at 3,4.
    // t=1: na=2 nb=2 dA=1 -> E=0.5,  V=0.25
    // t=2: na=1 nb=2 dA=1 -> E=1/3,  V=2/9
    // t=3: na=0 nb=2 dB=1 -> E=0,    V=0
    // t=4: nb=1 dB=1: n=1 -> V guard zeroes the term
    // O_A=2, E_A=0.833333 (micro-summed), V=0.472222
    val df = Seq(("A", 1L, 1L), ("A", 2L, 1L), ("B", 3L, 1L), ("B", 4L, 1L))
      .toDF("arm", "t", "e")
    val r = Survival.logRank(df, "arm", "t", "e")
      .as[(String, String, Long, Long, Long, Long, Double, Double)].head()
    val expChi2 = BigDecimal((2.0 - 0.833333) * (2.0 - 0.833333) / 0.472222)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r == (("A", "B", 2L, 2L, 2L, 2L, 0.833333, expChi2)), r.toString)
  }

  test("logRank: identical arms give chi2 ~ 0; >2 arms yield null") {
    // symmetric arms: every death is matched, O = E exactly
    val df = Seq(("A", 1L, 1L), ("B", 1L, 1L), ("A", 2L, 0L), ("B", 2L, 0L))
      .toDF("arm", "t", "e")
    val r = Survival.logRank(df, "arm", "t", "e")
      .select("expected_a", "chi2").as[(Double, Double)].head()
    assert(r == ((1.0, 0.0)), r.toString)
    val three = df.unionAll(Seq(("C", 3L, 1L)).toDF("arm", "t", "e"))
    val row = Survival.logRank(three, "arm", "t", "e")
      .select("chi2").collect().head
    assert(row.isNullAt(0), row.toString)
  }
}
