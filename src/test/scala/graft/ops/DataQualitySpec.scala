package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame) =
    df.select("check_name", "n_bad", "n_total", "bad_rate")
      .as[(String, Long, Long, Double)].collect().head

  test("nullCheck counts nulls with the exact rate") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("c")
    assert(row(DataQuality.nullCheck(df, "c")) == ("null:c", 2L, 4L, 0.5))
  }

  test("rangeCheck flags out-of-range and null values") {
    val df = Seq(Some(1.0), Some(5.0), Some(99.0), None).toDF("v")
    assert(row(DataQuality.rangeCheck(df, "v", 2.0, 50.0)) == ("range:v", 3L, 4L, 0.75))
  }

  test("uniqueCheck counts every member of a colliding key group") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    // groups: 1x1, 2x2, 3x3 -> bad = 2 + 3 = 5 of 6
    assert(row(DataQuality.uniqueCheck(df, Seq("k"))) ==
      ("unique:k", 5L, 6L, 0.833333))
  }

  test("referenceCheck counts orphans against distinct parent keys") {
    val child = Seq(10L, 10L, 20L, 30L).toDF("fk")
    val parent = Seq(10L, 10L, 20L).toDF("pk") // dup parent keys must not fan out
    assert(row(DataQuality.referenceCheck(child, parent, "fk", "pk")) ==
      ("ref:fk->pk", 1L, 4L, 0.25))
  }

  test("skewReport: exact max/percentile/skew_ppm on a known distribution") {
    // keys: a x 6, b x 2, c x 1, d x 1 -> per-key counts [6,2,1,1]
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")).toDF("k")
    val r = DataQuality.skewReport(df, "k")
      .select("n_rows", "n_keys", "max_key_rows", "p50_key_rows", "skew_ppm")
      .as[(Long, Long, Long, Double, Long)].collect().head
    // p50 of [1,1,2,6] interpolates to 1.5; skew_ppm = 6*4*1e6 div 10
    assert(r == ((10L, 4L, 6L, 1.5, 2400000L)))
  }

  test("columnProfile: nulls, distinct, top share, entropy per column") {
    val df = Seq(
      (Some("x"), Some(1L)), (Some("x"), Some(2L)),
      (Some("y"), None), (None, Some(2L))).toDF("s", "n")
    val out = DataQuality.columnProfile(df, Seq("s", "n"))
      .select("col_name", "n_rows", "n_distinct", "null_ppm", "top_share_ppm",
        "entropy_nats")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // s: 4 rows, 1 null, values x,x,y -> distinct 2, top 2/3,
    //    H = ln(3) - (2 ln2 + 1 ln1)/3 = 0.636514
    assert(out("s") == (("s", 4L, 2L, 250000L, 666666L, 0.636514)))
    // n: values 1,2,2 -> distinct 2, top 2/3, same entropy
    assert(out("n") == (("n", 4L, 2L, 250000L, 666666L, 0.636514)))
  }

  test("psiDrift: identical snapshots give zero PSI; disjoint give large") {
    val a = (1 to 100).map(i => (i % 50).toDouble).toDF("v")
    val same = DataQuality.psiDrift(a, a, "v", 10)
      .select("term_micro", "psi_micro").as[(Long, Long)].collect()
    assert(same.forall(t => t._1 == 0L && t._2 == 0L), same.mkString(","))

    val lo = (1 to 100).map(_ => 1.0).toDF("v")
    val hi = (1 to 100).map(_ => 100.0).toDF("v")
    val drift = DataQuality.psiDrift(lo, hi, "v", 10)
      .select("bin", "count_a", "count_b", "psi_micro")
      .as[(Long, Long, Long, Long)].collect()
    // two occupied bins (0 and 9), fully one-sided
    assert(drift.map(_._1).sorted.toSeq == Seq(0L, 9L))
    assert(drift.forall(_._4 > 2 * 1000000L), drift.mkString(","))
  }

  test("psiDrift: constant column collapses to one bin, PSI zero when balanced") {
    val a = Seq.fill(30)(7.0).toDF("v")
    val out = DataQuality.psiDrift(a, a, "v", 10)
      .select("bin", "count_a", "count_b", "psi_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 30L, 30L, 0L)), out.mkString(","))
  }

  test("ksTest: identical samples D=0 p=1; hand-computed small case; disjoint D=1") {
    val a = (1 to 50).map(i => (i % 7).toDouble).toDF("v")
    val same = DataQuality.ksTest(a, a, "v")
      .select("d_stat", "p_value").as[(Double, Double)].head()
    assert(same == ((0.0, 1.0)), same.toString)
    // A=[1,2], B=[2,3]: gaps at 1,2,3 are 0.5, 0.5, 0 -> D=0.5
    val small = DataQuality.ksTest(Seq(1.0, 2.0).toDF("v"), Seq(2.0, 3.0).toDF("v"), "v")
      .select("d_stat").as[Double].head()
    assert(small == 0.5, small.toString)
    val disjoint = DataQuality.ksTest(
      (1 to 30).map(_.toDouble).toDF("v"),
      (100 to 130).map(_.toDouble).toDF("v"), "v")
      .select("d_stat", "p_value").as[(Double, Double)].head()
    assert(disjoint._1 == 1.0 && disjoint._2 < 1e-9, disjoint.toString)
  }

  test("benfordAudit: digit extraction and a near-Benford sample scoring low chi2") {
    // counts proportional to log10(1+1/d) over 10000 rows
    val counts = (1 to 9).map(d => d -> math.round(10000 * math.log10(1.0 + 1.0 / d)).toInt)
    val rows = counts.flatMap { case (d, n) => Seq.fill(n)(d * 111.0 + 0.5) }
    val out = DataQuality.benfordAudit(rows.toDF("v"), "v")
      .select("digit", "n_obs", "chi2_micro").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq == (1L to 9L))
    // 111*d keeps the leading digit d for every d in 1..9
    out.foreach { case (d, n, _) => assert(n == counts(d.toInt - 1)._2.toLong) }
    // rounding-only deviation: chi2 far below any rejection threshold
    assert(out.head._3 < 10000L, out.head._3.toString)
    // values < 1 and nulls are excluded; the densified domain remains
    val tiny = DataQuality.benfordAudit(Seq(0.5, 0.01).toDF("v"), "v")
      .select("digit", "n_obs", "chi2_term_micro").as[(Long, Long, Long)].collect()
    assert(tiny.map(_._1).sorted.toSeq == (1L to 9L))
    assert(tiny.forall(r => r._2 == 0L && r._3 == 0L), tiny.mkString(","))
  }

  test("benfordAudit: digits with zero observations still charge their expected mass") {
    // every value leads with digit 1 — the degenerate distribution the
    // audit exists to flag; digits 2..9 must each contribute E_d·1e6
    val out = DataQuality.benfordAudit(Seq.fill(100)(1.0).toDF("v"), "v")
      .select("digit", "n_obs", "chi2_term_micro", "chi2_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 9L))
    assert(out.head._2 == 100L && out.tail.forall(_._2 == 0L))
    val p = (d: Int) => math.log10(1.0 + 1.0 / d)
    val expTerms = (1 to 9).map { d =>
      val e = p(d) * 100
      math.round((if (d == 1) (100 - e) * (100 - e) / e else e) * 1e6)
    }
    assert(out.map(_._3).toSeq == expTerms, out.map(_._3).mkString(","))
    assert(out.head._4 == expTerms.sum)
  }

  test("mutualInformation: independent ~0; determined pair has MI = H; hand case") {
    // perfectly independent uniform 2x2: MI exactly 0 (o*n == ra*cb)
    val indep = Seq.tabulate(400)(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val r0 = DataQuality.mutualInformation(indep, "x", "y")
      .select("n", "mi_micro", "u_a").as[(Long, Long, Double)].head()
    assert(r0._1 == 400L && r0._2 == 0L && r0._3 == 0.0, r0.toString)
    // y determined by x (bijective): MI = H(A) = H(B) = ln 3 micro-nats
    val det = Seq.tabulate(300)(i => (s"a${i % 3}", s"b${i % 3}")).toDF("x", "y")
    val r1 = DataQuality.mutualInformation(det, "x", "y")
      .select("mi_micro", "h_a_micro", "u_a", "u_b")
      .as[(Long, Long, Double, Double)].head()
    assert(r1._1 == r1._2 && r1._3 == 1.0 && r1._4 == 1.0, r1.toString)
    assert(math.abs(r1._1 - math.round(math.log(3.0) * 1e6)) <= 3, r1.toString)
    // hand case: cells (a0,b0)=50, (a0,b1)=50, (a1,b0)=100 (absent
    // (a1,b1) contributes 0): MI = 0.5*ln(4/3) + 0.25*ln(2/3) + 0.5*ln(4/3)...
    // computed directly against the closed form below
    val sparse = (Seq.fill(50)(("a0", "b0")) ++ Seq.fill(50)(("a0", "b1")) ++
      Seq.fill(100)(("a1", "b0"))).toDF("x", "y")
    val got = DataQuality.mutualInformation(sparse, "x", "y")
      .select("mi_micro").as[Long].head()
    // n=200, ra=(100,100), cb=(150,50); terms: o/n * ln(o*n/(ra*cb))
    val expect = Seq((50.0, 100.0 * 150), (50.0, 100.0 * 50), (100.0, 100.0 * 150))
      .map { case (o, rc) => math.round(o / 200 * math.round(math.log(o * 200 / rc) * 1e6)) }
      .sum
    assert(math.abs(got - expect) <= 5, s"$got vs $expect")
  }

  test("fingerprint: order/partitioning-invariant, mutation-sensitive, null != ''") {
    val base = (1L to 500L).map(i => (i, s"p$i")).toDF("id", "p")
    def fp(df: org.apache.spark.sql.DataFrame) =
      DataQuality.fingerprint(df, Seq("id", "p"))
        .select($"n", $"hsum".cast("string"), $"hxor")
        .as[(Long, String, Long)].head()
    val a = fp(base)
    // shuffled row order + different partitioning: identical fingerprint
    assert(fp(base.orderBy(rand(7)).repartition(13)) == a)
    // one mutated row flips it
    val mutated = base.withColumn("p",
      when($"id" === 250L, lit("px")).otherwise($"p"))
    assert(fp(mutated) != a)
    // dropping + re-adding a row restores it (multiset semantics)
    val cycled = base.filter($"id" =!= 9L)
      .unionByName(Seq((9L, "p9")).toDF("id", "p"))
    assert(fp(cycled) == a)
    // null and empty string hash differently (chr(1) null marker)
    val withNull = Seq((1L, null: String)).toDF("id", "p")
    val withEmpty = Seq((1L, "")).toDF("id", "p")
    assert(fp(withNull) != fp(withEmpty))
  }

  test("cusum: detects an upward mean shift, stays quiet on steady noise") {
    // deterministic "noise": small alternating wiggle around 0, then a
    // sustained +2 shift from t=20 — per-point z stays modest but the
    // positive accumulator must cross 4 sigma shortly after the shift
    val wig = (1 to 40).map(i => if (i % 2 == 0) 0.3 else -0.3)
    val shifted = wig.zipWithIndex.map { case (w, i0) =>
      ("a", (i0 + 1).toDouble, w + (if (i0 + 1 > 20) 2.0 else 0.0)) }
    val steady = wig.zipWithIndex.map { case (w, i0) =>
      ("b", (i0 + 1).toDouble, w) }
    val r = DataQuality.cusum((shifted ++ steady).toDF("g", "x", "v"), "g", "x", "v")
      .select("g", "max_s_pos", "first_up_x", "first_down_x")
      .as[(String, Double, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(r("a")._2 > 4.0 && r("a")._3.isDefined, r("a").toString)
    assert(r("a")._3.get > 20.0 && r("a")._3.get <= 30.0, r("a").toString)
    assert(r("b")._3.isEmpty && r("b")._4.isEmpty, r("b").toString)
    // constant series: sd = 0 -> z = 0 everywhere, maxima 0, no alarms
    val const = (1 to 10).map(i => ("c", i.toDouble, 7.0)).toDF("g", "x", "v")
    val rc = DataQuality.cusum(const, "g", "x", "v")
      .select("max_s_pos", "max_s_neg", "first_up_x")
      .as[(Double, Double, Option[Double])].head()
    assert(rc._1 == 0.0 && rc._2 == 0.0 && rc._3.isEmpty, rc.toString)
  }

  test("cusum: recursion identity on a hand-traced series") {
    // z sequence in sigma units after standardization is monotone enough
    // to trace: verify S+ equals the textbook recursion by recomputing
    // max over a direct scala fold on identically standardized values
    val vs = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 10.0)
    val df = vs.zipWithIndex.map { case (v, i) => ("g", (i + 1).toDouble, v) }
      .toDF("g", "x", "v")
    val got = DataQuality.cusum(df, "g", "x", "v", slack = 0.5, threshold = 99.0)
      .select("max_s_pos", "max_s_neg").as[(Double, Double)].head()
    val n = vs.size
    val mean = vs.sum / n
    val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / (n - 1))
    val zmu = vs.map(v => math.round((v - mean) / sd * 1e6))
    def side(sign: Int) = zmu.foldLeft((0L, 0L)) { case ((s, m), z) =>
      val s2 = math.max(0L, s + sign * z - 500000L); (s2, math.max(m, s2))
    }._2
    assert(got._1 == math.round(side(1) / 1e6 * 1e6) / 1e6, got.toString)
    assert(got._2 == math.round(side(-1) / 1e6 * 1e6) / 1e6, got.toString)
  }

  test("theilSen: outlier-immune slope, even/odd medians, guard trips") {
    // y = 2x with one wild outlier: OLS would move, Theil-Sen stays 2
    val pts = ((1 to 9).map(i => ("a", i.toDouble, 2.0 * i)) :+ (("a", 10.0, 500.0)))
      .toDF("g", "x", "y")
    val r = DataQuality.theilSen(pts, "g", "x", "y")
      .select("slope", "n_pairs").as[(Double, Long)].head()
    assert(r._1 == 2.0 && r._2 == 45L, r.toString)
    // even pair count: mean of the two middle slopes. 3 points -> 3
    // slopes is odd; 4 collinear-ish points -> 6 slopes (even)
    val even = Seq(("b", 0.0, 0.0), ("b", 1.0, 1.0), ("b", 2.0, 4.0), ("b", 3.0, 9.0))
      .toDF("g", "x", "y")
    // slopes: (0,1)=1 (0,2)=2 (0,3)=3 (1,2)=3 (1,3)=4 (2,3)=5 ->
    // sorted 1,2,3,3,4,5; median = (3+3)/2 = 3
    val r2 = DataQuality.theilSen(even, "g", "x", "y")
      .select("slope").as[Double].head()
    assert(r2 == 3.0, r2.toString)
    // a genuinely distinct middle pair: slopes 1,2,3,4 -> (2+3)/2 = 2.5
    val even2 = Seq(("d", 0.0, 0.0), ("d", 1.0, 1.0), ("d", 2.0, 4.0))
      .toDF("g", "x", "y")
    // slopes: (0,1)=1 (0,2)=2 (1,2)=3 -> odd count, median 2
    assert(DataQuality.theilSen(even2, "g", "x", "y")
      .select("slope").as[Double].head() == 2.0)
    val big = (1 to 50).map(i => ("c", i.toDouble, i.toDouble)).toDF("g", "x", "y")
    val e = intercept[IllegalArgumentException](
      DataQuality.theilSen(big, "g", "x", "y", maxPoints = 10))
    assert(e.getMessage.contains("aggregate the series first"))
  }

  test("fingerprintDiff: emits exactly the diverged partitions with the right status") {
    val a = (1L to 300L).map(i => (s"p${i % 3}", i, s"v$i")).toDF("part", "id", "v")
    val b = a.filter($"part" =!= "p0")                                 // p0 removed
      .withColumn("v", when($"part" === "p1" && $"id" === 100L, "vX") // p1 changed
        .otherwise($"v"))
      .unionByName(Seq(("p9", 1L, "new")).toDF("part", "id", "v"))    // p9 added
    val d = DataQuality.fingerprintDiff(a, b, Seq("part"), Seq("id", "v"))
      .as[(String, String)].collect().toMap
    assert(d == Map("p0" -> "removed", "p1" -> "changed", "p9" -> "added"), d.toString)
    // identical replicas diff to empty
    assert(DataQuality.fingerprintDiff(a, a.orderBy(rand(3)), Seq("part"),
      Seq("id", "v")).count() == 0L)
  }

  test("kendallTau: monotone 1, reversed -1, hand ties 1/3, guard trips") {
    val up = (1 to 40).map(i => (i.toDouble, (i * i).toDouble)).toDF("a", "b")
    val r1 = DataQuality.kendallTau(up, "a", "b")
      .select("n", "tau_b").as[(Long, Double)].head()
    assert(r1 == ((40L, 1.0)), r1.toString)
    val down = (1 to 40).map(i => (i.toDouble, -i.toDouble)).toDF("a", "b")
    assert(DataQuality.kendallTau(down, "a", "b")
      .select("tau_b").as[Double].head() == -1.0)
    // hand case: cells (1,1)x2 (1,2)x1 (2,1)x1 (2,2)x2 -> C=4, D=1,
    // n0=15, n1=n2=6, tau = 3/9
    val ties = Seq((1, 1), (1, 1), (1, 2), (2, 1), (2, 2), (2, 2)).toDF("a", "b")
    val r3 = DataQuality.kendallTau(ties, "a", "b")
      .select("conc", "disc", "tau_b")
      .as[(java.math.BigDecimal, java.math.BigDecimal, Double)].head()
    assert(r3._1.longValue == 4L && r3._2.longValue == 1L &&
      r3._3 == 0.333333, r3.toString)
    // constant column: no concordance surface -> null tau, not a crash
    val const = (1 to 10).map(i => (1.0, i.toDouble)).toDF("a", "b")
    assert(DataQuality.kendallTau(const, "a", "b")
      .select("tau_b").as[java.lang.Double].head() == null)
    // continuous-domain guard fails fast instead of a cells-squared join
    val wide = (1 to 300).map(i => (i * 1.7, i * 3.1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      DataQuality.kendallTau(wide, "a", "b", maxCells = 100))
    assert(e.getMessage.contains("bin first"))
  }

  test("spearman: monotone 1, reversed -1, hand-computed ties, constant null") {
    val up = (1 to 40).map(i => (i.toDouble, math.exp(i / 7.0))).toDF("a", "b")
    val r1 = DataQuality.spearman(up, "a", "b").select("n", "rho")
      .as[(Long, Double)].head()
    assert(r1 == ((40L, 1.0)), r1.toString) // any monotone map: rho = 1
    val down = (1 to 40).map(i => (i.toDouble, -i * 3.0)).toDF("a", "b")
    assert(DataQuality.spearman(down, "a", "b").select("rho").as[Double].head() == -1.0)
    // ties: a = [1,2,2,3], b = [10,20,20,40] — tied midranks align
    // perfectly, rho = 1; hand-computed mixed case: midranks
    // a -> [1, 2.5, 2.5, 4], b -> [2, 3, 4, 1], Sxy = -1.5,
    // Sxx = 4.5, Syy = 5 -> rho = -1.5/sqrt(22.5) = -0.316228
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0)).toDF("a", "b")
    assert(DataQuality.spearman(tied, "a", "b").select("rho").as[Double].head() == 1.0)
    val mixed = Seq((1.0, 2.0), (2.0, 3.0), (2.0, 4.0), (3.0, 1.0)).toDF("a", "b")
    val got = DataQuality.spearman(mixed, "a", "b").select("rho").as[Double].head()
    assert(math.abs(got - (-0.316228)) < 1e-6, got.toString)
    // constant column: undefined, not a crash
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    assert(DataQuality.spearman(const, "a", "b").select("rho").head().isNullAt(0))
    // null rows excluded from BOTH rank sets
    val withNull = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(1.0)), (Some(2.0), Some(2.0)), (Some(9.0), None), (None, Some(9.0)))
      .toDF("a", "b")
    val rn = DataQuality.spearman(withNull, "a", "b").select("n", "rho")
      .as[(Long, Double)].head()
    assert(rn == ((2L, 1.0)), rn.toString)
  }

  test("ksTest/mannWhitneyU: NULL values neither rank nor inflate the totals") {
    val withNulls = Seq[Option[Double]](Some(1.0), Some(2.0), None, None)
      .toDF("v")
    val clean = Seq(1.0, 2.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val ks = DataQuality.ksTest(withNulls, b, "v")
      .select("d_stat", "n_a", "n_b").as[(Double, Long, Long)].head()
    assert(ks == ((0.5, 2L, 2L)), ks.toString)
    val mw = DataQuality.mannWhitneyU(withNulls, b, "v")
      .select("n_a", "n_b", "u_b").as[(Long, Long, Double)].head()
    val mwClean = DataQuality.mannWhitneyU(clean, b, "v")
      .select("n_a", "n_b", "u_b").as[(Long, Long, Double)].head()
    assert(mw == mwClean, s"$mw vs $mwClean")
  }

  test("chiSquareIndependence: independent uniform grid scores ~0; determined pair maxes V") {
    // perfectly independent 2x2 with equal counts: chi2 = 0, V = 0
    val indep = Seq.tabulate(400)(i => (s"a${i % 2}", s"b${(i / 2) % 2}"))
      .toDF("x", "y")
    val r0 = DataQuality.chiSquareIndependence(indep, "x", "y")
      .select("n", "dof", "chi2_micro", "cramers_v")
      .as[(Long, Long, Long, Double)].head()
    assert(r0 == ((400L, 1L, 0L, 0.0)), r0.toString)
    // y fully determined by x: V = 1
    val det = Seq.tabulate(300)(i => (s"a${i % 3}", s"b${i % 3}")).toDF("x", "y")
    val r1 = DataQuality.chiSquareIndependence(det, "x", "y")
      .select("dof", "cramers_v").as[(Long, Double)].head()
    assert(r1._1 == 4L && math.abs(r1._2 - 1.0) < 1e-6, r1.toString)
    // absent cells contribute their expectation: 2x2 with one empty cell
    val sparse = (Seq.fill(50)(("a0", "b0")) ++ Seq.fill(50)(("a0", "b1")) ++
      Seq.fill(50)(("a1", "b0"))).toDF("x", "y")
    val r2 = DataQuality.chiSquareIndependence(sparse, "x", "y")
      .select("chi2_micro").as[Long].head()
    // hand-computed: E = (100*100, 100*50, 50*100, 50*50)/150; chi2 =
    // (50-66.67)^2/66.67 + 2*(50-33.33)^2/33.33 + (0-16.67)^2/16.67
    // = 4.1667 + 8.3333 + 8.3333 + 16.6667 = 37.5
    assert(math.abs(r2 - 37500000L) < 20L, r2.toString)
  }

  test("mannWhitneyU: hand-computed midranks with ties; identity z=0; shift sign") {
    // A=[1,2], B=[2,3]: midranks 1, 2.5, 4; R_B=6.5, U_B=3.5, mean=2,
    // var=(4/12)*(5 - 6/12)=1.5, z=1.5/sqrt(1.5)
    val r = DataQuality.mannWhitneyU(
      Seq(1.0, 2.0).toDF("v"), Seq(2.0, 3.0).toDF("v"), "v")
      .select("n_a", "n_b", "u_b", "z").as[(Long, Long, Double, Double)].head()
    assert(r._1 == 2L && r._2 == 2L && r._3 == 3.5, r.toString)
    assert(math.abs(r._4 - 1.224745) < 1e-6, r.toString)
    // identical samples: U = mean, z = 0
    val a = (1 to 60).map(i => (i % 9).toDouble).toDF("v")
    val same = DataQuality.mannWhitneyU(a, a, "v").select("z").as[Double].head()
    assert(same == 0.0, same.toString)
    // B shifted far above A: z strongly positive (B ranks higher)
    val hi = (1 to 60).map(i => (i % 9 + 100).toDouble).toDF("v")
    val up = DataQuality.mannWhitneyU(a, hi, "v").select("z").as[Double].head()
    assert(up > 5.0, up.toString)
  }

  test("fdViolations: hand-computed g3 on held and broken dependencies") {
    val df = Seq(
      // k -> v holds (each k maps to one v); k -> w broken on k=1
      (1L, "a", "x"), (1L, "a", "y"), (1L, "a", "y"),
      (2L, "b", "z"), (2L, "b", "z")).toDF("k", "v", "w")
    val r = DataQuality.fdViolations(df,
        Seq((Seq("k"), "v"), (Seq("k"), "w")))
      .orderBy("fd")
      .select("fd", "n_groups", "violating_groups", "g3_rows", "g3_ratio", "holds")
      .as[(String, Long, Long, Long, Double, Boolean)].collect()
    // k -> v: 2 groups, 0 violating, g3 = 0
    assert(r(0) == (("k -> v", 2L, 0L, 0L, 0.0, true)), r(0).toString)
    // k -> w: group k=1 has counts {x:1, y:2} -> drop 1 row; k=2 clean
    assert(r(1) == (("k -> w", 2L, 1L, 1L, 0.2, false)), r(1).toString)
    // composite lhs: (k, v) -> w has the same violation surface here
    val comp = DataQuality.fdViolations(df, Seq((Seq("k", "v"), "w")))
      .select("fd", "g3_rows").as[(String, Long)].head()
    assert(comp == (("k,v -> w", 1L)), comp.toString)
    intercept[IllegalArgumentException](DataQuality.fdViolations(df, Seq.empty))
  }

  test("autocorrelation: alternating series has acf(1) = -(n-1)/n pattern") {
    // z_t alternates +-c after standardization, so r_l = +-(n-l)/n exactly
    val alt = (1 to 10).map(t => ("g", t.toDouble, if (t % 2 == 0) 1.0 else -1.0))
      .toDF("g", "x", "v")
    val r = DataQuality.autocorrelation(alt, "g", "x", "v", maxLag = 3)
      .orderBy("lag").select("lag", "n_pairs", "acf")
      .as[(Long, Long, Double)].collect()
    assert(r.length == 3, r.mkString(","))
    assert(r(0) == ((1L, 9L, -0.9)), r(0).toString)
    assert(r(1) == ((2L, 8L, 0.8)), r(1).toString)
    assert(r(2) == ((3L, 7L, -0.7)), r(2).toString)
    // constant series: sd = 0 -> null acf, pairs still counted
    val const = (1 to 5).map(t => ("c", t.toDouble, 7.0)).toDF("g", "x", "v")
    val rc = DataQuality.autocorrelation(const, "g", "x", "v", maxLag = 2)
      .select("acf").collect()
    assert(rc.forall(_.isNullAt(0)), rc.mkString(","))
    intercept[IllegalArgumentException](
      DataQuality.autocorrelation(alt, "g", "x", "v", maxLag = 0))
  }

  test("weightedMedian: mass-weighted center, dominance, and tie blocks") {
    val df = Seq(
      // g1: values 1..4 weight 1 except v=4 carries half the mass
      ("g1", 1.0, 1.0), ("g1", 2.0, 1.0), ("g1", 3.0, 1.0), ("g1", 4.0, 3.0),
      // g2: one heavy row dominates regardless of the others
      ("g2", 10.0, 100.0), ("g2", 99.0, 1.0), ("g2", -5.0, 1.0),
      // g3: threshold lands inside an equal-value tie block
      ("g3", 7.0, 1.0), ("g3", 7.0, 1.0), ("g3", 8.0, 1.0)).toDF("g", "v", "w")
    val r = DataQuality.weightedMedian(df, "g", "v", "w")
      .orderBy("g").select("g", "n", "total_weight", "wmedian")
      .as[(String, Long, Double, Double)].collect()
    // g1 total 6: cum at v=3 is 3, 2*3 >= 6 -> median 3
    assert(r(0) == (("g1", 4L, 6.0, 3.0)), r(0).toString)
    assert(r(1) == (("g2", 3L, 102.0, 10.0)), r(1).toString)
    assert(r(2) == (("g3", 3L, 3.0, 7.0)), r(2).toString)
    // zero/negative weights are dropped, not poison
    val z = Seq(("z", 1.0, 0.0), ("z", 2.0, 1.0)).toDF("g", "v", "w")
    assert(DataQuality.weightedMedian(z, "g", "v", "w")
      .select("n", "wmedian").as[(Long, Double)].head() == ((1L, 2.0)))
  }

  test("corrMatrix: exact +1/-1 on linear pairs, pairwise null deletion, constants null") {
    val df = Seq(
      (Some(1.0), Some(2.0), Some(-1.0), Some(5.0)),
      (Some(2.0), Some(4.0), Some(-2.0), Some(5.0)),
      (Some(3.0), Some(6.0), Some(-3.0), Some(5.0)),
      (Some(4.0), None, Some(9.0), Some(5.0))).toDF("x", "y2", "yn", "c")
    val r = DataQuality.corrMatrix(df, Seq("x", "y2", "yn", "c"))
      .collect().map(row => (row.getString(0), row.getString(1),
        row.getLong(2), if (row.isNullAt(3)) None else Some(row.getDouble(3))))
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // y2 = 2x on the 3 rows where both present -> +1
    assert(r(("x", "y2")) == ((3L, Some(1.0))), r.toString)
    // yn = -x on the first 3 rows, row 4 breaks it: hand moments
    // n=4, covn=58, vx=20, vy=371 -> 58/sqrt(7420)
    assert(r(("x", "yn")) == ((4L, Some(0.673327))), r.toString)
    // constant column -> null corr, full n
    assert(r(("x", "c")) == ((4L, None)), r.toString)
    intercept[IllegalArgumentException](DataQuality.corrMatrix(df, Seq("x")))
    intercept[IllegalArgumentException](
      DataQuality.corrMatrix(df, Seq("x", "x")))
  }

  test("profile: one-pass per-column stats with numeric/string/other extremes") {
    val df = Seq(
      (Some(1L), Some("ab"), Some(1.5)),
      (Some(2L), None, Some(-0.5)),
      (None, Some("xyz"), Some(1.5))).toDF("k", "s", "v")
      .withColumn("d", to_date(lit("2024-01-01")))
    val r = DataQuality.profile(df, Seq("k", "s", "v", "d"))
      .orderBy("column")
      .select("column", "n_rows", "n_null", "n_distinct",
        "min_num", "max_num", "min_len", "max_len")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[Long], Option[Long])].collect()
    assert(r(0) == (("d", 3L, 0L, 1L, None, None, None, None)), r(0).toString)
    assert(r(1) == (("k", 3L, 1L, 2L, Some(1.0), Some(2.0), None, None)), r(1).toString)
    assert(r(2) == (("s", 3L, 1L, 2L, None, None, Some(2L), Some(3L))), r(2).toString)
    assert(r(3) == (("v", 3L, 0L, 2L, Some(-0.5), Some(1.5), None, None)), r(3).toString)
    intercept[IllegalArgumentException](DataQuality.profile(df, Seq.empty))
  }

  test("gini: 0 when even, (n-1)/n when one member holds all, hand value") {
    val df = Seq(
      ("even", 5.0), ("even", 5.0), ("even", 5.0), ("even", 5.0),
      ("one", 0.0), ("one", 0.0), ("one", 0.0), ("one", 12.0),
      ("mix", 1.0), ("mix", 2.0), ("mix", 3.0), ("mix", 4.0),
      ("zero", 0.0), ("zero", 0.0)).toDF("g", "v")
    val r = DataQuality.gini(df, "g", "v")
      .orderBy("g").select("g", "n", "total", "gini")
      .as[(String, Long, Double, Option[Double])].collect()
    assert(r(0) == (("even", 4L, 20.0, Some(0.0))), r(0).toString)
    // mix sorted 1,2,3,4: G = (2*(1+4+9+16) - 5*10)/(4*10) = 10/40
    assert(r(1) == (("mix", 4L, 10.0, Some(0.25))), r(1).toString)
    // one member holds everything: G = (n-1)/n = 0.75
    assert(r(2) == (("one", 4L, 12.0, Some(0.75))), r(2).toString)
    // all-zero mass: gini undefined -> null
    assert(r(3) == (("zero", 2L, 0.0, None)), r(3).toString)
  }

  test("paretoCut: minimal prefix, exact-boundary member excluded from head") {
    // masses 50/30/15/5: cum shares .5/.8/.95/1 — the head stops at the
    // member that REACHES 0.8 (rank 2); rank 3 starts AT 0.8, not below
    val df = Seq(("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0))
      .toDF("m", "v")
    val r = DataQuality.paretoCut(df, "m", "v", target = 0.8)
      .orderBy("rank")
      .select("rank", "m", "share", "cum_share", "in_head")
      .as[(Long, String, Double, Double, Boolean)].collect()
    assert(r.map(x => (x._2, x._5)).toSeq ==
      Seq(("a", true), ("b", true), ("c", false), ("d", false)), r.mkString(","))
    assert(r(1)._4 == 0.8 && r(3)._4 == 1.0, r.mkString(","))
  }

  test("hhi: 3:1 split, even split, monopoly") {
    val df = Seq(("g", "m1", 3.0), ("g", "m2", 1.0),
      ("e", "a", 2.0), ("e", "b", 2.0),
      ("solo", "only", 7.0)).toDF("grp", "member", "v")
    val r = DataQuality.hhi(df, "grp", "member", "v")
      .orderBy("grp")
      .as[(String, Long, Double, Double)].collect()
    // even: 0.5 -> effective 2; 3:1: (9+1)/16 = 0.625 -> 1.6; monopoly 1
    assert(r(0) == (("e", 2L, 0.5, 2.0)), r(0).toString)
    assert(r(1) == (("g", 2L, 0.625, 1.6)), r(1).toString)
    assert(r(2) == (("solo", 1L, 1.0, 1.0)), r(2).toString)
  }

  test("dispersion: Poisson-ish fano near 1, constant series fano 0") {
    // values 2,4,6,8: mean 5, var (4*120-400)/12 = 80/12 = 6.666667
    val df = Seq(("g", 2L), ("g", 4L), ("g", 6L), ("g", 8L),
      ("c", 5L), ("c", 5L), ("c", 5L)).toDF("k", "v")
    val r = DataQuality.dispersion(df, "k", "v")
      .orderBy("k")
      .select("k", "n", "mean", "variance", "fano", "cv")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(r(0) == (("c", 3L, 5.0, Some(0.0), Some(0.0), Some(0.0))), r(0).toString)
    assert(r(1) == (("g", 4L, 5.0, Some(6.666667), Some(1.333333),
      Some(0.516398))), r(1).toString)
    // single point: variance undefined -> nulls, not zero
    val one = Seq(("x", 9L)).toDF("k", "v")
    val o = DataQuality.dispersion(one, "k", "v").collect().head
    assert(o.isNullAt(3) && o.isNullAt(4) && o.isNullAt(5), o.toString)
  }

  test("woeIv: hand table, one-sided bin nulls out and charges 0 to IV") {
    // nBins=2 over values {0,0,1,1}: bin0 = (T,T) -> one-sided, woe
    // null; bin1 = (T,F): woe = ln((1*1)/(1*3)) = -1.098612,
    // iv = (1/3 - 1)*(-1.098612) = 0.732408
    val df = Seq((true, 0.0), (true, 0.0), (true, 1.0), (false, 1.0))
      .toDF("y", "v")
    val r = DataQuality.woeIv(df, "y", "v", nBins = 2)
      .orderBy("bin")
      .select("bin", "n", "n_pos", "n_neg", "woe", "iv")
      .as[(Long, Long, Long, Long, Option[Double], Double)].collect()
    assert(r(0) == ((0L, 2L, 2L, 0L, None, 0.732408)), r(0).toString)
    assert(r(1) == ((1L, 2L, 1L, 1L, Some(-1.098612), 0.732408)), r(1).toString)
    // constant feature: single bin, woe = ln(B*g/(b*G)) at the priors
    val const = Seq((true, 5.0), (false, 5.0), (false, 5.0)).toDF("y", "v")
    val c = DataQuality.woeIv(const, "y", "v", nBins = 4)
      .select("bin", "n", "woe").as[(Long, Long, Option[Double])].collect()
    assert(c.toSeq == Seq((0L, 3L, Some(0.0))), c.mkString(","))
  }

  test("welchTTest: hand-computed two-cohort case; degenerate groups drop") {
    // A = (1,2,3): mean 2, var 1; B = (6,8): mean 7, var 2
    // t = (2-7)/sqrt(1/3 + 2/2) = -5/sqrt(4/3) = -4.330127...
    // df = (4/3)^2 / ((1/3)^2/2 + 1^2/1) = (16/9)/(1/18 + 1) = 32/19
    val df = Seq(
      ("g", true, 1.0), ("g", true, 2.0), ("g", true, 3.0),
      ("g", false, 6.0), ("g", false, 8.0),
      ("tiny", true, 1.0), ("tiny", false, 2.0) // na=nb=1 -> dropped
    ).toDF("grp", "cohort", "v")
    val got = DataQuality.welchTTest(df, "grp", "cohort", "v")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length == 1, got.mkString(","))
    val (g, na, nb, t, dfw) = got.head
    assert(g == "g" && na == 3 && nb == 2)
    assert(t == -4330127L, s"t_micro $t")
    assert(math.abs(dfw - 32.0 / 19.0) < 1e-6, s"df_w $dfw")
  }

  test("refPercentile: ties count as <=, bounds score 1.0/low, empty ref refuses") {
    val ref = Seq(1.0, 2.0, 2.0, 3.0, 4.0).toDF("v")
    val probe = Seq((10L, 2.0), (11L, 0.5), (12L, 9.0), (13L, 3.5)).toDF("k", "v")
    val got = DataQuality.refPercentile(ref, probe, "k", "v")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(got(10L) == 0.6, got.toString)  // 1,2,2 <= 2  -> 3/5
    assert(got(11L) == 0.0, got.toString)  // below the reference
    assert(got(12L) == 1.0, got.toString)  // above everything
    assert(got(13L) == 0.8, got.toString)  // 1,2,2,3 <= 3.5 -> 4/5
    val e = intercept[IllegalArgumentException] {
      DataQuality.refPercentile(ref.filter(col("v") > 99), probe, "k", "v")
    }
    assert(e.getMessage.contains("empty reference"))
  }

  test("minhashEstimateError: identical docs estimate 1.0 with zero error") {
    val d = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val got = Dedup.minhashEstimateError(d, "doc_id", "text", 2, 0.3)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1, got.mkString(","))
    assert(got.head == ((1L, 2L, 1.0, 1.0, 0.0)), got.head.toString)
  }

  test("normalCdf: A&S polynomial within 1e-6 of known values, symmetric") {
    import org.apache.spark.sql.functions._
    val zs = Seq(-2.5, -1.96, -1.0, 0.0, 0.5, 1.0, 1.644854, 1.96, 2.5, 3.5)
    val want = Seq(0.0062097, 0.0249979, 0.1586553, 0.5, 0.6914625,
      0.8413447, 0.95, 0.9750021, 0.9937903, 0.9997674)
    val got = zs.toDF("z").select(DataQuality.normalCdf(col("z")))
      .as[Double].collect()
    zs.indices.foreach { i =>
      assert(math.abs(got(i) - want(i)) < 1e-6, s"z=${zs(i)}: ${got(i)}")
    }
    // strictly monotone over the grid (rank-safety is the contract)
    assert(got.sliding(2).forall(p => p(0) < p(1)))
  }

  test("bhFdr implements the step-up rule (rank-1 fail rescued by rank-3 pass)") {
    import org.apache.spark.sql.functions._
    // m=4, alpha=.05 -> thresholds .0125 .025 .0375 .05
    // p=.013 fails its own rank-1 threshold but ranks 2 and 3 pass, so
    // the step-up rule rejects ranks 1..3; .19 stays null.
    val tests = Seq(("h1", 0.013), ("h2", 0.014), ("h3", 0.015), ("h4", 0.19))
      .toDF("hyp", "p_value")
    val got = DataQuality.bhFdr(tests, "hyp", "p_value", alpha = 0.05)
      .select("hyp", "rank", "discovery").as[(String, Long, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("h1" -> ((1L, true)), "h2" -> ((2L, true)),
      "h3" -> ((3L, true)), "h4" -> ((4L, false))))
    // nothing passes -> no discoveries (kmax null path)
    val none = DataQuality.bhFdr(
        Seq(("a", 0.9), ("b", 0.8)).toDF("hyp", "p_value"), "hyp", "p_value")
      .select("discovery").as[Boolean].collect()
    assert(none.forall(!_))
  }

  test("anovaF: hand fixture F=4.2, eta_sq=7/12; equal groups F=0") {
    // a:[1,2,3] b:[2,4,6] c:[5,5,5] -> SSB=14, SSW=10, SST=24
    // F = (14/2)/(10/6) = 4.2; eta² = 14/24 = 0.583333
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0),
      ("c", 5.0), ("c", 5.0), ("c", 5.0)).toDF("g", "v")
    val r = DataQuality.anovaF(df, "g", "v")
      .select("k", "n", "f", "eta_sq").as[(Long, Long, Double, Double)].head()
    assert(r == ((3L, 9L, 4.2, 0.583333)), r.toString)
    // identical distributions -> SSB = 0 -> F = 0
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    val r2 = DataQuality.anovaF(eq, "g", "v").select("f").as[Double].head()
    assert(r2 == 0.0, r2.toString)
  }

  test("jackknifeRatio: constant metric has zero SE; algebra matches a replay") {
    // constant values: every leave-one-out ratio identical -> se 0
    val const = (1 to 40).map(i => ("g", i.toLong, 5.0)).toDF("g", "u", "v")
    val c = DataQuality.jackknifeRatio(const, "g", "u", col("v"), lit(1.0),
        nBuckets = 8)
      .select("ratio", "se_jack").as[(Double, Double)].head()
    assert(c == ((5.0, 0.0)), c.toString)
    // independent replay: collect the op's own bucket sums (same portable
    // hash), recompute the jackknife in plain Scala doubles
    val data = (1 to 40).map(i => ("g", i.toLong, i.toDouble))
    val df = data.toDF("g", "u", "v")
    val nB = 8
    val buckets = df.withColumn("b",
        pmod(graft.functions.PortableHash.phash(
          concat_ws("|", lit("graft-jk"), col("u").cast("string"))), lit(nB.toLong)))
      .groupBy("b").agg(sum("v").as("sn"), count(lit(1)).as("sd"))
      .as[(Long, Double, Long)].collect()
    val tn = buckets.map(_._2).sum
    val td = buckets.map(_._3).sum.toDouble
    val ris = buckets.map { case (_, sn, sd) =>
      math.round((tn - sn) / (td - sd) * 1e6) }
    val b = ris.length
    val rbar = ris.sum
    val sumdev = ris.map(ri => { val d = BigInt(b.toLong * ri - rbar); d * d }).sum
    val se = BigDecimal(math.sqrt((sumdev.toDouble / (b.toLong * b))
      * (b - 1).toDouble / b) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = DataQuality.jackknifeRatio(df, "g", "u", col("v"), lit(1.0),
        nBuckets = nB)
      .select("n_buckets", "ratio", "se_jack")
      .as[(Long, Double, Double)].head()
    assert(got._1 == b.toLong && got._3 == se, s"$got vs se=$se b=$b")
    assert(got._2 == BigDecimal(tn / td)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("schemaDrift: dropped/added/retyped columns and a null-rate regression") {
    val a = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)).toDF("id", "v")
    val b = Seq((Some(1L), "1.0", 7), (None, "2.0", 8), (Some(3L), "3.0", 9),
      (None, "4.0", 10)).toDF("id", "v", "w")
    val got = DataQuality.schemaDrift(a, b).orderBy("column")
      .select("column", "in_a", "in_b", "dtype_a", "dtype_b", "type_changed",
        "null_rate_a", "null_rate_b")
      .as[(String, Boolean, Boolean, Option[String], Option[String], Boolean,
        Option[Double], Option[Double])].collect()
    assert(got(0) == (("id", true, true, Some("bigint"), Some("bigint"),
      false, Some(0.0), Some(0.5))), got(0).toString)
    assert(got(1) == (("v", true, true, Some("double"), Some("string"),
      true, Some(0.0), Some(0.0))), got(1).toString)
    assert(got(2) == (("w", false, true, None, Some("int"),
      false, None, Some(0.0))), got(2).toString)
  }

  test("schemaDrift: hostile column names (quotes, backticks, dots, __n collisions)") {
    // names that used to break the spliced-SQL stack() form, plus data
    // columns squatting on the old internal aliases
    val a = Seq((1L, "x", 2.0, 3L)).toDF("it's", "we`ird", "a.b", "__n")
    val b = Seq((Some(1L), "x", 2.0, 3L)).toDF("it's", "we`ird", "a.b", "__n")
    val got = DataQuality.schemaDrift(a, b).orderBy("column")
      .select("column", "in_a", "in_b", "type_changed").collect()
    assert(got.length == 4, got.mkString(", "))
    assert(got.map(_.getString(0)).toSeq.sorted ==
      Seq("__n", "a.b", "it's", "we`ird"), got.mkString(", "))
    assert(got.forall(r => r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3)),
      got.mkString(", "))
  }

  test("quarantineReport: first-match priority and ok fallthrough") {
    val df = Seq(("1.5", "2026-01-01 00:00:00"), ("N/A", "2026-01-01 00:00:00"),
      ("2.0", "junk"), ("N/A", "junk")).toDF("p", "d")
    val got = DataQuality.quarantineReport(df, Seq(
        "bad_price" -> expr("try_cast(p AS double)").isNull,
        "bad_date" -> expr("try_cast(d AS timestamp)").isNull))
      .orderBy("reason").as[(String, Long)].collect()
    // the doubly-bad row counts under the FIRST rule only
    assert(got.toSeq == Seq(("bad_date", 1L), ("bad_price", 2L), ("ok", 1L)),
      got.mkString(", "))
  }
}
