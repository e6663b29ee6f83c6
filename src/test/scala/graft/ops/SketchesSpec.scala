package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // zipfish stream: key k appears 200/k times, k in 1..50
  private lazy val stream = (1 to 50).flatMap(k => Seq.fill(200 / k)(s"key$k"))
    .toDF("k")

  test("cms estimates dominate exact counts and are exact absent collisions") {
    val sketch = Sketches.cmsBuild(stream, "k")
    val exact = stream.groupBy("k").agg(count(lit(1)).as("n"))
    val joined = Sketches.cmsEstimate(exact.select("k"), sketch, "k")
      .join(exact, Seq("k"))
      .select("k", "cms_est", "n").as[(String, Long, Long)].collect()
    assert(joined.length == 50)
    assert(joined.forall { case (_, est, n) => est >= n },
      "CMS must never underestimate")
    // 50 keys in 4x1024 cells: some row of the 4 is collision-free for
    // every key with overwhelming probability -> min equals exact
    assert(joined.forall { case (_, est, n) => est == n },
      joined.filter { case (_, e, n) => e != n }.mkString(","))
  }

  test("cms is deterministic under repartitioning and mergeable by construction") {
    val a = Sketches.cmsBuild(stream, "k").orderBy("r", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    val b = Sketches.cmsBuild(stream.repartition(17), "k").orderBy("r", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(a == b)
    // sketch of a union == cell-wise sum of the parts' sketches
    val half1 = stream.limit(300)
    val half2 = stream.exceptAll(half1)
    val merged = Sketches.cmsBuild(half1, "k")
      .unionByName(Sketches.cmsBuild(half2, "k"))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("r", "bucket").as[(Int, Long, Long)].collect().toSeq
    assert(merged == a)
  }

  test("kmv: exact below k, banded estimate above k, mergeable, partition-stable") {
    // exact path: 50 distinct keys < k=256
    val exact = Sketches.kmvEstimate(Sketches.kmvSketch(stream, "k"), k = 256)
      .as[Double].collect().head
    assert(exact == 50.0)
    // estimate path: 2000 distinct keys, k=128 -> (k-1)/u_k within ~25%
    val big = (1L to 2000L).map(i => s"key$i").toDF("k")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(big, "k", k = 128), k = 128)
      .as[Double].collect().head
    assert(est > 1500 && est < 2500, s"estimate $est far from 2000")
    // deterministic under repartitioning
    val again = Sketches.kmvEstimate(
      Sketches.kmvSketch(big.repartition(13), "k", k = 128), k = 128)
      .as[Double].collect().head
    assert(again == est)
    // sketch(union) == merge of the parts' sketches
    val h1 = big.filter($"k" < "key5")  // lexicographic split, both non-trivial
    val h2 = big.exceptAll(h1)
    val direct = Sketches.kmvSketch(big, "k", k = 128)
      .as[Double].collect().toSeq
    val merged = Sketches.kmvMerge(Seq(
        Sketches.kmvSketch(h1, "k", k = 128),
        Sketches.kmvSketch(h2, "k", k = 128)), k = 128)
      .as[Double].collect().toSeq
    assert(merged == direct)
  }

  test("quantile sketch: merge law is exact equality; estimates sit in the rank-error band") {
    // 10,000 rows, v = key^2 / 10000 (a skewed but monotone transform
    // with known quantiles: true q-quantile ~ (10000*q)^2 / 10000)
    val rows = spark.range(1, 10001)
      .selectExpr("id AS k", "CAST(id * id AS DOUBLE) / 10000.0 AS v")
    val k = 256
    val sketch = Sketches.quantileSketch(rows, "k", "v", k = k)
    assert(sketch.count() == k)
    // deterministic & partition-independent
    val again = Sketches.quantileSketch(rows.repartition(13), "k", "v", k = k)
      .as[(Double, Double)].collect().sorted.toSeq
    assert(again == sketch.as[(Double, Double)].collect().sorted.toSeq)
    // merge law: sketch(A union B) == merge(sketch(A), sketch(B)) EXACTLY
    val a = rows.filter($"k" % 2 === 0)
    val b = rows.exceptAll(a)
    val merged = Sketches.quantileMerge(Seq(
        Sketches.quantileSketch(a, "k", "v", k = k),
        Sketches.quantileSketch(b, "k", "v", k = k)), k = k)
      .as[(Double, Double)].collect().sorted.toSeq
    assert(merged == sketch.as[(Double, Double)].collect().sorted.toSeq)
    // rank-error band: the estimate's TRUE rank within ±4·sqrt(q(1-q)/k)
    // of q (norm-approx of the order-statistic distribution, p < 1e-4
    // per tail for a fixed hash — this is a deterministic replay, so
    // the assertion cannot flake)
    val est = Sketches.quantileEstimate(sketch, Seq(0.1, 0.5, 0.9))
      .as[(Double, Double)].collect().toMap
    for ((q, v) <- est) {
      val trueRank = math.sqrt(v * 10000.0) / 10000.0 // inverse of v = k^2/1e4
      val band = 4.0 * math.sqrt(q * (1 - q) / k)
      assert(math.abs(trueRank - q) <= band,
        s"q=$q est=$v trueRank=$trueRank band=$band")
    }
    // below-k input: the sketch IS the data and the median is exact
    val tiny = spark.range(1, 6).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val exactMedian = Sketches.quantileEstimate(
      Sketches.quantileSketch(tiny, "k", "v", k = k), Seq(0.5))
      .as[(Double, Double)].collect().head._2
    assert(exactMedian == 3.0)
  }

  test("grouped quantile sketch restricts to the per-group global sketch, one exchange") {
    val rows = spark.range(1, 4001)
      .selectExpr("concat('g', id % 4) AS g", "id AS k",
        "CAST((id * 17) % 500 AS DOUBLE) AS v")
    val k = 64
    val grouped = Sketches.quantileSketchGrouped(rows, "g", "k", "v", k = k)
    // restriction property: the grouped sketch of group g IS the plain
    // sketch of that group's rows (same hash, same bottom-k law)
    for (g <- Seq("g0", "g3")) {
      val fromGrouped = grouped.filter($"g" === g).select("u", "v")
        .as[(Double, Double)].collect().sorted.toSeq
      val direct = Sketches.quantileSketch(
          rows.filter($"g" === g), "k", "v", k = k)
        .as[(Double, Double)].collect().sorted.toSeq
      assert(fromGrouped == direct, s"group $g diverged")
    }
    // estimates carry the group key and stay in value range
    val est = Sketches.quantileEstimateGrouped(grouped, "g", Seq(0.5))
      .as[(String, Double, Double)].collect()
    assert(est.map(_._1).sorted.toSeq == Seq("g0", "g1", "g2", "g3"))
    assert(est.forall(e => e._3 >= 0.0 && e._3 < 500.0))
    // one group-keyed exchange; rank limit prunes map-side
    val plan = grouped.queryExecution.executedPlan.toString
    assert("(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("grouped KMV restricts per group, re-merges into the global sketch, exact below k") {
    val df = (1L to 600L).map(i => (s"g${i % 3}", s"v${(i * 7) % 101}")).toDF("g", "k")
    val k = 32
    val sk = Sketches.kmvSketchGrouped(df, "g", "k", k = k)
    // restriction property: each group's sketch IS the plain KMV sketch
    // of that group's rows (same hash, same bottom-k law)
    for (g <- Seq("g0", "g2")) {
      val fromGrouped = sk.filter($"g" === g).select("u")
        .as[Double].collect().sorted.toSeq
      val direct = Sketches.kmvSketch(df.filter($"g" === g), "k", k = k)
        .as[Double].collect().sorted.toSeq
      assert(fromGrouped == direct, s"group $g diverged")
    }
    // merge law: bottom-k of the group sketches == the global sketch
    val parts = Seq("g0", "g1", "g2").map(g => sk.filter($"g" === g).select("u"))
    val merged = Sketches.kmvMerge(parts, k = k).as[Double].collect().toSeq
    val global = Sketches.kmvSketch(df, "k", k = k).as[Double].collect().toSeq
    assert(merged == global)
    // below-k groups estimate exactly
    val exact = df.groupBy("g").agg(countDistinct(col("k")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = Sketches.kmvEstimateGrouped(
        Sketches.kmvSketchGrouped(df, "g", "k", k = 256), "g", k = 256)
      .as[(String, Double)].collect().toMap
    assert(exact.keySet == est.keySet)
    exact.foreach { case (g, n) => assert(est(g) == n.toDouble, s"group $g") }
    // map-side rank limit behind the group window
    val plan = sk.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("cms estimate for an absent key is zero when its cells are empty") {
    val tiny = Seq("a", "a", "b").toDF("k")
    val sketch = Sketches.cmsBuild(tiny, "k")
    val est = Sketches.cmsEstimate(Seq("zzz-absent").toDF("k"), sketch, "k")
      .as[(String, Long)].collect().head._2
    // 3 occupied cells out of 4096: the absent key hits an empty cell in
    // at least one of its 4 rows, so the min is 0
    assert(est == 0L)
  }

  test("heavyHitters returns exactly the frequent set, independent of partitioning") {
    // skewed stream: h1 x500, h2 x300, h3 x40, 2000 singleton tail keys
    val data = (Seq.fill(500)("h1") ++ Seq.fill(300)("h2") ++ Seq.fill(40)("h3") ++
      (1 to 2000).map(i => s"t$i")).toDF("k")
    val n = 500 + 300 + 40 + 2000
    val naive = data.groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 >= n)
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 4, 17)) {
      val hh = Sketches.heavyHitters(data.repartition(parts), "k",
        supportDen = 100, capacity = 128)
        .as[(String, Long)].collect().toMap
      graft.QueryCleanup.drain()
      assert(hh == naive, s"parts=$parts")
    }
    assert(naive.keySet == Set("h1", "h2", "h3")) // the check is value-bearing
  }

  test("heavyHitters rejects a capacity below the MG superset bound") {
    val data = Seq("a", "b").toDF("k")
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(data, "k", supportDen = 1000, capacity = 64)
    }
  }

  test("kmvIntersectEstimate is exact below k and zero on disjoint sets") {
    val a = Sketches.kmvSketch((1L to 40L).toDF("k"), "k", k = 64)
    val b = Sketches.kmvSketch((21L to 60L).toDF("k"), "k", k = 64)
    // union 60 < k=64 -> estimator degenerates to exact counting
    val est = Sketches.kmvIntersectEstimate(a, b, 64)
      .as[Double].head()
    assert(est == 20.0, s"exact-regime estimate $est != 20")
    val c = Sketches.kmvSketch((100L to 140L).toDF("k"), "k", k = 64)
    assert(Sketches.kmvIntersectEstimate(a, c, 64).as[Double].head() == 0.0)
  }

  test("kmvIntersectEstimate of two empty sketches is 0, not null") {
    val e1 = Sketches.kmvSketch(spark.emptyDataset[Long].toDF("k"), "k", k = 64)
    val e2 = Sketches.kmvSketch(spark.emptyDataset[Long].toDF("k"), "k", k = 64)
    val est = Sketches.kmvIntersectEstimate(e1, e2, 64).as[Double].head()
    assert(est == 0.0, s"empty-sketch intersection $est != 0.0")
  }

  test("kmvIntersectEstimate approximates a large overlap within a loose band") {
    val a = Sketches.kmvSketch((1L to 2000L).toDF("k"), "k", k = 128)
    val b = Sketches.kmvSketch((1001L to 3000L).toDF("k"), "k", k = 128)
    val est = Sketches.kmvIntersectEstimate(a, b, 128).as[Double].head()
    // true intersection 1000; k=128 KMV Jaccard estimate is coarse --
    // just pin the band that catches sign/off-by-k errors
    assert(est > 300 && est < 2500, s"estimate $est wildly off 1000")
  }

  test("cmsJoinSizeEstimate never underestimates and is exact without collisions") {
    // tiny key set, w=1024: collisions effectively impossible ->
    // estimate == exact self-join size == sum of squared counts
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val sk = Sketches.cmsBuild(df, "k")
    val est = Sketches.cmsJoinSizeEstimate(sk, sk).as[Long].head()
    assert(est == 25 + 9 + 1)
    // two-table join size: A(a:5, b:3) vs B(a:2, c:4) -> 5*2 = 10
    val b = (Seq.fill(2)("a") ++ Seq.fill(4)("c")).toDF("k")
    val skb = Sketches.cmsBuild(b, "k")
    val est2 = Sketches.cmsJoinSizeEstimate(sk, skb).as[Long].head()
    assert(est2 == 5 * 2 + 1 * 4)
    // upper-bound property on a wider key set
    val wide = (1 to 500).map(i => s"key$i").toDF("k")
    val skw = Sketches.cmsBuild(wide, "k")
    assert(Sketches.cmsJoinSizeEstimate(skw, skw).as[Long].head() >= 500L)
  }

  test("hll: merge law — sketch of a union IS the max-merge of part sketches") {
    val a = (1L to 800L).toDF("k")
    val b = (500L to 1500L).toDF("k")
    val merged = Sketches.hllMerge(Seq(
        Sketches.hllSketch(a, "k"), Sketches.hllSketch(b, "k")))
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    val direct = Sketches.hllSketch(a.unionByName(b), "k")
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    assert(merged == direct)
  }

  test("hll: estimate within the expected error band (m=64 -> ~13% rse)") {
    for (n <- Seq(1000L, 10000L)) {
      val est = Sketches.hllEstimate(
        Sketches.hllSketch(spark.range(0, n).toDF("k"), "k")).as[Double].head()
      assert(math.abs(est - n) / n < 0.4, s"n=$n est=$est")
    }
  }

  test("hll: small-range linear counting keeps tiny cardinalities tight") {
    val est = Sketches.hllEstimate(
      Sketches.hllSketch((1L to 20L).toDF("k"), "k")).as[Double].head()
    assert(math.abs(est - 20.0) < 5.0, s"est=$est")
    // duplicates do not move the estimate: registers are maxima
    val dup = Sketches.hllEstimate(Sketches.hllSketch(
      ((1L to 20L) ++ (1L to 20L)).toDF("k"), "k")).as[Double].head()
    assert(dup == est)
  }

  test("hll: grouped registers re-merge into the global sketch") {
    val df = (1L to 2000L).map(k => (if (k % 2 == 0) "a" else "b", k)).toDF("g", "k")
    val grouped = Sketches.hllSketchGrouped(df, "g", "k")
    val remerged = Sketches.hllMerge(Seq(grouped.select("bucket", "m_j")))
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    val direct = Sketches.hllSketch(df, "k")
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    assert(remerged == direct)
    // per-group estimates in band too (1000 distinct each)
    val ests = Sketches.hllEstimateGrouped(grouped, "g")
      .as[(String, Double)].collect().toMap
    assert(ests.size == 2 && ests.values.forall(e => math.abs(e - 1000) / 1000.0 < 0.4),
      ests.toString)
  }

  test("hllRollup: every level equals the direct sketch of that slice — exactly") {
    val rows = (1 to 600).map(i =>
      (s"t${i % 3}", s"d${i % 4}", (i % 131).toLong)).toDF("typ", "day", "uid")
    val roll = Sketches.hllRollup(rows, Seq("typ", "day"), "uid", b = 6)
      .as[(String, String, Int, Double)].collect()
    // 3*4 finest cells + 3 typ rows + 1 grand total
    assert(roll.length == 16, roll.length.toString)
    // level 0 == direct global sketch estimate (register max is
    // associative: rolled-up registers ARE the slice's registers)
    val global = Sketches.hllEstimate(Sketches.hllSketch(rows, "uid", b = 6), b = 6)
      .as[Double].head()
    assert(roll.find(_._3 == 0).get._4 == global)
    // level 1 == per-typ direct estimates, null day
    val perTyp = Sketches.hllEstimateGrouped(
        Sketches.hllSketchGrouped(rows, "typ", "uid", b = 6), "typ", b = 6)
      .as[(String, Double)].collect().toMap
    val l1 = roll.filter(_._3 == 1)
    assert(l1.forall(_._2 == null) && l1.map(r => r._1 -> r._4).toMap == perTyp)
    // level 2 spot check: one finest cell vs a filtered direct sketch
    val cell = Sketches.hllEstimate(
      Sketches.hllSketch(rows.filter($"typ" === "t1" && $"day" === "d2"),
        "uid", b = 6), b = 6).as[Double].head()
    assert(roll.find(r => r._3 == 2 && r._1 == "t1" && r._2 == "d2").get._4 == cell)
  }

  test("hllGrowthCurve: prefix points equal prefix sketches; curve is monotone") {
    val rows = (1 to 300).map(i => (f"d${i % 3}%s", (i % 97).toLong))
      .toDF("day", "user_id")
    val curve = Sketches.hllGrowthCurve(rows, "day", "user_id", b = 6)
      .as[(String, Double)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq("d0", "d1", "d2"))
    // monotone non-decreasing distinct-to-date
    assert(curve.sliding(2).forall(p => p(0)._2 <= p(1)._2), curve.mkString(","))
    // each curve point IS the estimate of the prefix union
    for (cut <- Seq("d0", "d1", "d2")) {
      val prefix = rows.filter($"day" <= cut)
      val direct = Sketches.hllEstimate(
        Sketches.hllSketch(prefix, "user_id", b = 6), b = 6)
        .as[Double].head()
      val fromCurve = curve.find(_._1 == cut).get._2
      assert(fromCurve == direct, s"$cut: $fromCurve vs $direct")
    }
  }

  test("hllSlidingCurve: window points equal direct window-union sketches") {
    // day d_i holds users [i*40, i*40+60) -> consecutive days overlap
    val rows = (0 to 5).flatMap(d => (0 until 60)
      .map(u => (f"d$d%s", (d * 40 + u).toLong))).toDF("day", "user_id")
    val curve = Sketches.hllSlidingCurve(rows, "day", "user_id",
      width = 3, b = 6).as[(String, Double)].collect().sortBy(_._1).toMap
    graft.QueryCleanup.drain()
    assert(curve.keySet == (0 to 5).map(d => s"d$d").toSet, curve.toString)
    // window-merge register identity: point d == sketch of days (d-2..d)
    for (d <- 0 to 5) {
      val lo = math.max(0, d - 2)
      val win = rows.filter($"day".isin((lo to d).map(i => s"d$i"): _*))
      val direct = Sketches.hllEstimate(
        Sketches.hllSketch(win, "user_id", b = 6), b = 6).as[Double].head()
      assert(curve(s"d$d") == direct, s"d$d: ${curve(s"d$d")} vs $direct")
    }
    // width 1 degenerates to the per-day estimates
    val w1 = Sketches.hllSlidingCurve(rows, "day", "user_id", width = 1, b = 6)
      .as[(String, Double)].collect().toMap
    graft.QueryCleanup.drain()
    val perDay = Sketches.hllEstimateGrouped(
      Sketches.hllSketchGrouped(rows, "day", "user_id", b = 6), "day", b = 6)
      .as[(String, Double)].collect().toMap
    assert(w1 == perDay, s"$w1 vs $perDay")
    intercept[IllegalArgumentException](
      Sketches.hllSlidingCurve(rows, "day", "user_id", width = 0))
  }

  test("kmvPairwiseOverlap: identical groups jaccard 1, disjoint 0, below-k exact") {
    // groups small enough that every sketch is exact (< k hashes)
    val rows = ((1 to 50).map(i => ("a", s"k$i")) ++
      (1 to 50).map(i => ("b", s"k$i")) ++          // b == a
      (1 to 50).map(i => ("c", s"x$i")) ++          // c disjoint from a/b
      (1 to 25).map(i => ("d", s"k$i")) ++          // d = half of a
      (1 to 25).map(i => ("d", s"y$i")))
      .toDF("g", "key")
    val r = Sketches.kmvPairwiseOverlap(rows, "g", "key", k = 256)
      .orderBy("group_a", "group_b")
      .as[(String, String, Double, Double, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    graft.QueryCleanup.drain()
    assert(r(("a", "b")) == ((50.0, 50.0, 1.0)), r(("a", "b")).toString)
    assert(r(("a", "c")) == ((100.0, 0.0, 0.0)), r(("a", "c")).toString)
    // a ∪ d = 50 + 25 new = 75; a ∩ d = 25; jaccard 25/75
    assert(r(("a", "d")) == ((75.0, 25.0, 0.333333)), r(("a", "d")).toString)
    assert(r.size == 6) // 4 groups -> 6 unordered pairs
  }
}
