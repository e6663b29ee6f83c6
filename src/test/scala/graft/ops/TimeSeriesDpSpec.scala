package graft.ops

import graft.SparkSpec
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesDpSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 10:10:00"), 7L, "click", 2.0),   // same session (10m gap)
    (3L, ts("2024-01-01 11:00:00"), 7L, "view", 3.0),    // new session (50m gap)
    (4L, ts("2024-01-01 10:05:00"), 8L, "click", 4.0),   // other user
    (5L, ts("2024-01-01 12:00:00"), 8L, "view", 500.0)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionize splits on gaps > threshold per user") {
    val got = TimeSeries.sessionize(events, 30)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1 && got(2L) == 1 && got(3L) == 2)
    assert(got(4L) == 1 && got(5L) == 2)
  }

  test("sessionStats aggregates bounds and counts per session") {
    val r = TimeSeries.sessionStats(events, 30)
      .filter($"user_id" === 7 && $"session_seq" === 1)
      .select("n_events", "sum_value").as[(Long, Double)].head()
    assert(r == ((2L, 3.0)))
  }

  test("windowAgg buckets into tumbling windows") {
    val got = TimeSeries.windowAgg(events, "1 hour")
      .select(date_format($"window_start", "HH:mm").as("w"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    assert(got.contains(("10:00", "click", 3L)))
    assert(got.contains(("11:00", "view", 1L)))
  }

  test("dp noise is deterministic for fixed seed, differs across seeds") {
    val a = DifferentialPrivacy.dpCount(events, Seq("event_type"), 1.0, 42L)
      .as[(String, Double)].collect().toMap
    val b = DifferentialPrivacy.dpCount(events, Seq("event_type"), 1.0, 42L)
      .as[(String, Double)].collect().toMap
    val c = DifferentialPrivacy.dpCount(events, Seq("event_type"), 1.0, 43L)
      .as[(String, Double)].collect().toMap
    assert(a == b)
    assert(a != c)
    // noise at eps=1, sensitivity=1 is almost surely < 20
    val clicks = events.filter($"event_type" === "click").count().toDouble
    assert(math.abs(a("click") - clicks) < 20)
  }

  test("dpSum clips values before summing") {
    val got = DifferentialPrivacy.dpSum(events, Seq("event_type"), "value",
      0.0, 100.0, 1000.0, 42L).as[(String, Double)].collect().toMap
    // view true sum = 3 + min(500,100) = 103; huge eps -> tiny noise
    assert(math.abs(got("view") - 103.0) < 1.0)
  }

  test("PrivacyBudget enforces sequential composition") {
    val b = new PrivacyBudget(1.0)
    b.charge(0.4); b.charge(0.6)
    assert(b.remaining < 1e-9)
    intercept[IllegalArgumentException](b.charge(0.1))
    intercept[IllegalArgumentException](new PrivacyBudget(1.0).charge(-1.0))
  }
}
