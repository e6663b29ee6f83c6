package graft.ops

class ExperimentSpec extends graft.SparkSpec {
  import spark.implicits._

  test("cuped: perfectly correlated covariate removes all variance") {
    // y = x exactly -> theta = 1, adjusted y' = mean(x) for every unit:
    // var_y_cuped = 0, var_reduction = 1, arm means collapse to mean(x)
    val units = Seq(("a", 1.0, 1.0), ("a", 3.0, 3.0),
      ("b", 5.0, 5.0), ("b", 7.0, 7.0)).toDF("arm", "x", "y")
    val r = Experiment.cuped(units, "arm", "x", "y")
      .orderBy("arm")
      .select("arm", "n", "mean_y", "mean_y_cuped", "var_y_cuped",
        "var_reduction", "theta")
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(r(0) == (("a", 2L, 2.0, 4.0, 0.0, 1.0, 1.0)), r(0).toString)
    assert(r(1) == (("b", 2L, 6.0, 4.0, 0.0, 1.0, 1.0)), r(1).toString)
  }

  test("cuped: uncorrelated covariate leaves the metric untouched (theta 0)") {
    // x constant -> var(x) = 0 -> theta defined as 0, y' = y
    val units = Seq(("a", 1.0, 10.0), ("a", 1.0, 20.0),
      ("b", 1.0, 30.0), ("b", 1.0, 40.0)).toDF("arm", "x", "y")
    val r = Experiment.cuped(units, "arm", "x", "y")
      .orderBy("arm").select("mean_y", "mean_y_cuped", "theta")
      .as[(Double, Double, Double)].collect()
    assert(r(0) == ((15.0, 15.0, 0.0)), r(0).toString)
    assert(r(1) == ((35.0, 35.0, 0.0)), r(1).toString)
  }

  test("cuped: global mean of the adjusted metric is preserved") {
    val units = (1 to 40).map { i =>
      (if (i % 2 == 0) "t" else "c", (i % 7).toDouble, (i % 7) * 2.0 + i % 3)
    }.toDF("arm", "x", "y")
    val r = Experiment.cuped(units, "arm", "x", "y")
      .select("n", "mean_y", "mean_y_cuped")
      .as[(Long, Double, Double)].collect()
    val n = r.map(_._1).sum.toDouble
    val gy = r.map(t => t._1 * t._2).sum / n
    val ga = r.map(t => t._1 * t._3).sum / n
    assert(math.abs(gy - ga) < 1e-4, s"$gy vs $ga")
  }

  test("twoProportionZ: hand-computed pooled z, and degenerate pools null out") {
    val units = ((1 to 10).map(i => ("a", if (i <= 7) 1L else 0L)) ++
      (1 to 10).map(i => ("b", if (i <= 3) 1L else 0L))).toDF("arm", "s")
    val r = Experiment.twoProportionZ(units, "arm", "s")
      .select("arm_a", "n_a", "conv_a", "arm_b", "conv_b", "p_a", "p_b", "z")
      .as[(String, Long, Long, String, Long, Double, Double, Double)].head()
    // pool = 0.5; z = 0.4 / sqrt(0.25 * 0.2) = 1.788854
    assert(r == (("a", 10L, 7L, "b", 3L, 0.7, 0.3, 1.788854)), r.toString)
    // nobody converts anywhere: pooled p = 0 -> z null
    val none = Seq(("a", 0L), ("a", 0L), ("b", 0L)).toDF("arm", "s")
    val z0 = Experiment.twoProportionZ(none, "arm", "s").select("z").collect()
    assert(z0.length == 1 && z0.head.isNullAt(0), z0.mkString(","))
    // a single arm yields no comparison row at all
    val one = Seq(("a", 1L), ("a", 0L)).toDF("arm", "s")
    assert(Experiment.twoProportionZ(one, "arm", "s").count() == 0)
  }

  test("diffInDiff: hand 2x2 table; >2 arms null") {
    val units = Seq(
      ("c", false, 8.0), ("c", false, 12.0),   // c pre mean 10
      ("c", true, 12.0), ("c", true, 12.0),    // c post mean 12
      ("t", false, 10.0), ("t", false, 10.0),  // t pre mean 10
      ("t", true, 15.0), ("t", true, 15.0))    // t post mean 15
      .toDF("arm", "post", "v")
    val r = Experiment.diffInDiff(units, "arm", "post", "v")
      .as[(String, String, Double, Double, Double, Double, Double)].head()
    // DiD = (15 - 10) - (12 - 10) = 3
    assert(r == (("c", "t", 10.0, 12.0, 10.0, 15.0, 3.0)), r.toString)
    val three = units.unionAll(Seq(("x", true, 1.0)).toDF("arm", "post", "v"))
    val row = Experiment.diffInDiff(three, "arm", "post", "v")
      .select("did").collect().head
    assert(row.isNullAt(0), row.toString)
  }

  test("poissonBootstrapCi: deterministic, ordered, brackets the true mean") {
    val df = (1 to 200).map(i => ("g", i.toLong, i.toDouble)).toDF("k", "id", "v")
    val r = Experiment.poissonBootstrapCi(df, "k", "id", "v", b = 32)
      .as[(String, Long, Double, Double, Double)].head()
    assert(r._2 == 32L, r.toString)
    assert(r._4 <= r._3 && r._3 <= r._5, r.toString)   // lo <= med <= hi
    // true mean 100.5; a 200-point bootstrap CI comfortably brackets it
    assert(r._4 < 100.5 && 100.5 < r._5, r.toString)
    assert(r._5 - r._4 < 30.0, r.toString)             // and is not vacuous
    // pure function of (salt, id): identical on a rerun and repartition
    val again = Experiment.poissonBootstrapCi(df.repartition(7), "k", "id", "v",
      b = 32).as[(String, Long, Double, Double, Double)].head()
    assert(r == again)
  }

  test("poisson weight kernel is bit-equal to the declarative puniform form") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val cdf = graft.functions.TextHashImpl.PoissonCdf.toSeq
    val ids = (1 to 500).map(_.toString).toDF("id")
    val rows = ids.select(col("id"),
      posexplode(graft.functions.GraftFunctions.poissonWeightsNative(
        lit("graft-boot"), col("id"), lit(32))).as(Seq("b", "wk")))
    val u = graft.functions.PortableHash.puniform(
      concat_ws("|", lit("graft-boot"), col("b").cast("string"), col("id")))
    val ref = cdf.map(t => when(u > t, 1L).otherwise(0L)).reduceLeft(_ + _)
    val bad = rows.withColumn("wref", ref)
      .filter(col("wk") =!= col("wref")).count()
    assert(bad == 0L, s"$bad kernel weights differ from the declarative form")
  }

  test("powerAnalysis: Fleiss sizing replayed, degenerate rates null") {
    import org.apache.spark.sql.functions.lit
    // 1000 units, 100 successes -> p1 = 0.1; replicate the exact double
    // chain the operator builds
    val units = ((1 to 100).map(i => ("g", true)) ++
      (1 to 900).map(i => ("g", false)) ++
      Seq.fill(5)(("all", true))).toDF("seg", "ok")
    val r = Experiment.powerAnalysis(units, "seg", "ok", mde = 0.05)
      .orderBy("seg")
      .select("seg", "n", "base_rate", "target_rate", "n_per_arm")
      .as[(String, Long, Double, Double, Option[Long])].collect()
    val p1 = 100.0 / 1000.0; val p2 = p1 * 1.05; val pb = (p1 + p2) / 2
    val num = 1.959964 * math.sqrt(2.0 * pb * (1.0 - pb)) +
      0.841621 * math.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    val d = p2 - p1
    val exp = math.ceil(num * num / (d * d)).toLong
    // "all" converts 100%: lifted rate leaves (0,1) -> null sizing
    assert(r(0) == (("all", 5L, 1.0, 1.05, None)), r(0).toString)
    assert(r(1) == (("g", 1000L, 0.1, 0.105, Some(exp))), r(1).toString)
    // ~56k per arm to see a 5% relative lift on a 10% base — sanity band
    assert(exp > 50000L && exp < 60000L, exp.toString)
  }

  test("jamesSteinMeans: shrinks toward the grand mean; k<=3 and SSB=0 edges") {
    import spark.implicits._
    // 5 groups, wide spread, within-noise present -> 0 < b < 1 and every
    // shrunk mean lies strictly between its raw mean and the grand mean
    val data = (1 to 5).flatMap(g =>
      (1 to 20).map(i => (s"g$g", g * 10.0 + (i % 5) - 2)))
    val got = Experiment.jamesSteinMeans(data.toDF("g", "v"), "g", "v")
      .orderBy("g").select("g", "mean", "shrunk", "b")
      .as[(String, Double, Double, Double)].collect()
    val grand = got.map(_._2).sum / got.length
    val b = got.head._4
    assert(b > 0 && b < 1, b.toString)
    got.foreach { case (_, m, s, _) =>
      if (math.abs(m - grand) > 1e-3)
        assert(math.abs(s - grand) < math.abs(m - grand)
          && math.abs(s - m) < math.abs(grand - m), s"$m -> $s (grand $grand)")
    }
    // k = 2 -> the correction doesn't apply, b = 1, shrunk = mean
    val two = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    val t = Experiment.jamesSteinMeans(two, "g", "v")
      .select("mean", "shrunk", "b").as[(Double, Double, Double)].collect()
    assert(t.forall(r => r._3 == 1.0 && r._1 == r._2), t.mkString(", "))
    // identical group means -> SSB 0 -> b = 0, shrunk = grand = mean
    val eq = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0),
      ("c", 1.0), ("c", 3.0), ("d", 1.0), ("d", 3.0)).toDF("g", "v")
    val e = Experiment.jamesSteinMeans(eq, "g", "v")
      .select("mean", "shrunk", "b").as[(Double, Double, Double)].collect()
    assert(e.forall(r => r._3 == 0.0 && r._1 == 2.0 && r._2 == 2.0),
      e.mkString(", "))
  }
}
