package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnelDepth requires stage order, first-touch anchoring") {
    val e = Seq(
      // user 1: view -> click -> purchase in order: depth 3
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click BEFORE first view -> click doesn't count: depth 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: purchase before click: depth 2 (view, click; purchase too early)
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:01:00"), "purchase"),
      (3L, ts("2024-01-01 10:02:00"), "click"),
      // user 4: never viewed: depth 0
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnelDepth(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("weeklyRetention buckets users by first-event week and offset") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort W0 (2024-01-01 is a Monday)
      (1L, ts("2024-01-09 10:00:00")), // active W1
      (1L, ts("2024-01-16 10:00:00")), // active W2
      (2L, ts("2024-01-02 10:00:00")), // cohort W0
      (2L, ts("2024-01-03 10:00:00")), // still W0 -> one offset-0 row
      (3L, ts("2024-01-10 10:00:00"))  // cohort W1
    ).toDF("user_id", "ts").withColumn("event_type", lit("x"))
    val got = EventAnalytics.weeklyRetention(e, "user_id", "ts")
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("w"),
        col("week_offset"), col("n_active"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("zScoreOutliers flags per-group deviants only") {
    val vals = Seq.fill(20)(10.0) ++ Seq(100.0) // one huge outlier in group a
    val e = vals.zipWithIndex.map { case (v, i) => (i.toLong, "a", v) }
      .++(Seq((100L, "b", 1e9))) // singleton group: stddev null -> no flag
      .toDF("event_id", "event_type", "value")
    val got = EventAnalytics.zScoreOutliers(e, "event_type", "value", 2.5)
      .select("event_id").as[Long].collect().toSeq
    assert(got == Seq(20L))
  }

  test("winsorize clips into the per-group exact-percentile envelope") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = EventAnalytics.winsorize(df, "grp", "v", 0.05, 0.95)
      .select("v", "winsorized", "__wlo", "__whi")
      .as[(Double, Double, Double, Double)].collect()
    val (lo, hi) = (out.head._3, out.head._4)
    // exact interpolated percentiles of 1..100
    assert(lo == 5.95 && hi == 95.05, s"bounds ($lo, $hi)")
    out.foreach { case (v, w, _, _) =>
      assert(w >= lo && w <= hi)
      if (v >= lo && v <= hi) assert(w == v) // interior untouched
    }
    assert(out.count { case (v, w, _, _) => w != v } == 10) // 5 each tail
    intercept[IllegalArgumentException] {
      EventAnalytics.winsorize(df, "grp", "v", 0.9, 0.1)
    }
  }

  test("madOutliers flags on median/MAD, survives the outlier it hunts, skips MAD=0") {
    // group a: median 10, MAD 1; 100 gives mod_z = 0.6745*90 = 60.705
    val a = Seq(8.0, 9.0, 10.0, 11.0, 12.0, 100.0).map(("a", _))
    // group b: majority-constant -> MAD 0 -> nothing flagged
    val b = Seq(5.0, 5.0, 5.0, 5.0, 99.0).map(("b", _))
    val df = (a ++ b).zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("event_id", "grp", "v")
    val got = EventAnalytics.madOutliers(df, "grp", "v")
      .select("event_id", "mod_z").as[(Long, Double)].collect().toMap
    // only the group-a outlier: median of a = 10.5, MAD = 1.5
    // mod_z(100) = 0.6745 * 89.5 / 1.5 = 40.245167
    assert(got.keySet == Set(5L))
    assert(math.abs(got(5L) - 40.245167) < 1e-6, got.toString)
    // contrast: the mean/stddev z-score MISSES it at the same cut
    // (stddev inflated by the outlier itself: z(100) ~ 2.2)
    val z = EventAnalytics.zScoreOutliers(df.filter($"grp" === "a"), "grp", "v", 3.5)
    assert(z.count() == 0)
  }

  test("groupOls: exact line recovered; constant x yields nulls") {
    val line = (0 to 23).flatMap(x => Seq(("a", x, 2.0 * x + 3.0)))
      .toDF("g", "x", "y")
    val r = EventAnalytics.groupOls(line, "g", "x", "y")
      .select("g", "n", "slope", "intercept", "r2")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])].head()
    assert(r == (("a", 24L, Some(2.0), Some(3.0), Some(1.0))), r.toString)
    val const = Seq(("b", 5, 1.0), ("b", 5, 2.0)).toDF("g", "x", "y")
    val rc = EventAnalytics.groupOls(const, "g", "x", "y")
      .select("slope", "intercept", "r2")
      .as[(Option[Double], Option[Double], Option[Double])].head()
    assert(rc == ((None, None, None)), rc.toString)
  }

  test("markovTransitions: per-user pairing, row-normalized, tie-broken") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "B"),
      (3L, ts("2024-01-01 00:02:00"), 1L, "A"),
      (4L, ts("2024-01-01 00:03:00"), 1L, "B"),
      (5L, ts("2024-01-02 00:00:00"), 2L, "A"),
      (6L, ts("2024-01-02 00:05:00"), 2L, "A"),
      // user 3: equal timestamps -> event_id breaks the tie (C before D)
      (7L, ts("2024-01-03 00:00:00"), 3L, "C"),
      (8L, ts("2024-01-03 00:00:00"), 3L, "D"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventAnalytics
      .markovTransitions(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_state", "to_state")
      .select("from_state", "to_state", "n", "prob")
      .as[(String, String, Long, Double)].collect()
    assert(r.toSeq == Seq(
      ("A", "A", 1L, 0.333333), ("A", "B", 2L, 0.666667),
      ("B", "A", 1L, 1.0), ("C", "D", 1L, 1.0)), r.mkString(","))
  }

  test("sessionPaths: depth cut, session split on gap, count-desc path-asc order") {
    val ev = Seq(
      // user 1, session 1: a > b > c (d beyond the depth cut)
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "b"),
      (3L, ts("2024-01-01 10:02:00"), 1L, "c"),
      (4L, ts("2024-01-01 10:03:00"), 1L, "d"),
      // user 1, session 2 after a 2h gap: lone x
      (5L, ts("2024-01-01 13:00:00"), 1L, "x"),
      // user 2: a > b > c again -> that path counts 2
      (6L, ts("2024-01-02 09:00:00"), 2L, "a"),
      (7L, ts("2024-01-02 09:10:00"), 2L, "b"),
      (8L, ts("2024-01-02 09:20:00"), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val r = EventAnalytics.sessionPaths(ev, gapMinutes = 30, depth = 3, topK = 10)
      .as[(String, Long)].collect()
    assert(r.toSeq == Seq(("a>b>c", 2L), ("x", 1L)), r.mkString(","))
  }

  test("trimmedMean: one mega-outlier vanishes; cut is exact integer rank math") {
    // values 1..9 plus 1000: raw mean 104.5; trim 10% drops rank 1 and
    // rank 10 -> mean of 2..9 = 5.5
    val df = ((1 to 9).map(i => ("g", i.toDouble, i.toLong)) :+
      (("g", 1000.0, 10L))).toDF("k", "v", "id")
    val r = EventAnalytics.trimmedMean(df, "k", "v", "id", trim = 0.1)
      .as[(String, Long, Long, Double, Double)].head()
    assert(r == (("g", 10L, 8L, 104.5, 5.5)), r.toString)
    // n*trim < 1 -> nothing trimmed, means equal
    val tiny = Seq(("g", 3.0, 1L), ("g", 5.0, 2L)).toDF("k", "v", "id")
    val t = EventAnalytics.trimmedMean(tiny, "k", "v", "id", trim = 0.1)
      .as[(String, Long, Long, Double, Double)].head()
    assert(t == (("g", 2L, 2L, 4.0, 4.0)), t.toString)
  }

  test("cohortValueMatrix: Monday cohorts, integer week ages, micro-exact sums") {
    // 2024-01-01 is a Monday; users 1 and 2 share the cohort week
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "x", 1.5),
      (2L, ts("2024-01-09 09:00:00"), 1L, "x", 2.5),  // age 1
      (3L, ts("2024-01-03 09:00:00"), 2L, "x", 1.0))  // age 0, same cohort
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.cohortValueMatrix(ev, "user_id", "ts", "value")
      .orderBy("cohort_week", "age_week")
      .select("cohort_week", "age_week", "n_users", "value")
      .as[(java.sql.Date, Long, Long, Double)].collect()
    val monday = java.sql.Date.valueOf("2024-01-01")
    assert(r.toSeq == Seq((monday, 0L, 2L, 2.5), (monday, 1L, 1L, 2.5)),
      r.mkString(","))
  }

  test("attribution: bookend touches exclude conversions and later events") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 10.0),
      // second purchase: the earlier purchase must NOT become a touch
      (4L, ts("2024-01-01 10:20:00"), 1L, "purchase", 5.0),
      // user 2 converts with no preceding touch -> dropped entirely
      (5L, ts("2024-01-02 09:00:00"), 2L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.attribution(ev, "user_id", "ts", "event_type",
        "value", "event_id", "purchase")
      .orderBy("channel")
      .as[(String, Long, Double, Long, Double)].collect()
    assert(r.toSeq == Seq(("click", 0L, 0.0, 2L, 15.0),
      ("view", 2L, 15.0, 0L, 0.0)), r.mkString(","))
  }

  test("timeToConvert: pre-start conversions don't count; non-starters excluded") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 10:01:40"), 1L, "purchase", 1.0), // +100 s
      // user 2 purchased BEFORE their first view: started, not converted
      (3L, ts("2024-01-02 08:00:00"), 2L, "purchase", 1.0),
      (4L, ts("2024-01-02 09:00:00"), 2L, "view", 0.0),
      // user 3 never viewed: not in the population at all
      (5L, ts("2024-01-03 09:00:00"), 3L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = EventAnalytics.timeToConvert(ev, "user_id", "ts", "event_type",
        "view", "purchase")
      .as[(Long, Long, Double, Double)].head()
    assert(r == ((2L, 1L, 100.0, 100.0)), r.toString)
  }

  test("rfmScores: exact quintiles share scores on ties, reversed recency") {
    // 5 customers, one order each on distinct days; amounts ascending.
    // before*5 div 5 = rank-1 -> f_score all 1 (frequency ties), m_score
    // = 1..5, r_score 5 for the most recent customer.
    val o = (1 to 5).map { i =>
      (i.toLong, ts(f"2024-01-0$i%d 00:00:00"), i * 100.0)
    }.toDF("c", "d", "amt")
    val r = EventAnalytics.rfmScores(o, "c", "d", "amt")
      .orderBy("c")
      .select("c", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score", "rfm")
      .as[(Long, Long, Long, Double, Long, Long, Long, Long)].collect()
    // customer 5 ordered last (recency 0) -> r 5; customer 1 -> r 1
    assert(r(0) == ((1L, 4L, 1L, 100.0, 1L, 1L, 1L, 111L)), r(0).toString)
    assert(r(4) == ((5L, 0L, 1L, 500.0, 5L, 1L, 5L, 515L)), r(4).toString)
    // all five share the frequency tie -> same f_score
    assert(r.map(_._6).toSet == Set(1L))
  }
}
