package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MondrianSpec extends SparkSpec {
  import spark.implicits._

  test("1-D line of 8 points at k=2 cuts into four pairs") {
    val df = (1 to 8).map(_.toDouble).toDF("x")
    val pids = Mondrian.assignPartitions(df, Seq("x"), 2)
      .select("x", "pid").as[(Double, Long)].collect().toMap
    graft.QueryCleanup.drain()
    // median cuts: [1-8] -> [1-4|5-8] -> [1,2|3,4|5,6|7,8]
    val groups = pids.groupBy(_._2).values.map(_.keySet.toSeq.sorted).toSet
    assert(groups == Set(Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(5.0, 6.0), Seq(7.0, 8.0)),
      groups.toString)
  }

  test("a zero-width dimension can never be cut") {
    val df = Seq.fill(10)(7.0).toDF("x")
    val out = Mondrian.assignPartitions(df, Seq("x"), 2)
    assert(out.select("pid").distinct().count() == 1)
    graft.QueryCleanup.drain()
  }

  test("cut admissibility decided on exact side counts under heavy ties") {
    // 9 copies of 1.0 and one 2.0: median is 1.0, left side (<=) holds 9,
    // right holds 1 < k, and no other cut point exists -> no split.
    val df = (Seq.fill(9)(1.0) ++ Seq(2.0)).toDF("x")
    val out = Mondrian.assignPartitions(df, Seq("x"), 3)
    assert(out.select("pid").distinct().count() == 1)
    graft.QueryCleanup.drain()
  }

  test("widest normalized dimension wins; QI order breaks ties") {
    // y spans its full global range in both halves of x, so after the
    // root cut on the tied widths (both 1.0, x first in QI order) the
    // children still prefer y? No: children retain full y width (1.0)
    // but halved x width -> second-level cuts go to y.
    val rows = for (x <- 0 until 4; y <- 0 until 4) yield (x.toDouble, y.toDouble)
    val df = rows.toDF("x", "y")
    val out = Mondrian.assignPartitions(df, Seq("x", "y"), 4)
      .groupBy("pid").agg(count(lit(1)).as("n"),
        min("x").as("mnx"), max("x").as("mxx"),
        min("y").as("mny"), max("y").as("mxy"))
      .collect()
    graft.QueryCleanup.drain()
    assert(out.length == 4 && out.forall(_.getAs[Long]("n") == 4L), out.mkString(";"))
    // root cut on x (tie -> first QI), second level on y (now the widest):
    // quadrants, each 2x4 points -> every partition is an x-half crossed
    // with a y-half
    out.foreach { r =>
      assert(r.getAs[Double]("mxx") - r.getAs[Double]("mnx") == 1.0, r.toString)
      assert(r.getAs[Double]("mxy") - r.getAs[Double]("mny") == 1.0, r.toString)
    }
  }

  test("driver bookkeeping is O(1): no row-valued collect during partitioning") {
    // The cut plan must stay DataFrame-resident: the only permitted
    // driver-bound actions are the single-row global-range `head` probe
    // and per-level `count`s. A `collect` action would mean per-partition
    // state (O(n/k) rows at the final levels) landed on the driver.
    import java.util.concurrent.ConcurrentLinkedQueue
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val actions = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        actions.add(funcName)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        actions.add(s"FAIL:$funcName")
    }
    spark.listenerManager.register(listener)
    try {
      val df = (1 to 200).map(i => ((i * 37 % 101).toDouble, (i * 53 % 17).toDouble))
        .toDF("a", "b")
      val out = Mondrian.assignPartitions(df, Seq("a", "b"), 5)
      out.count()
      graft.QueryCleanup.drain()
      // Listener bus is async: wait for the action log to settle.
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = actions.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val seen = actions.toArray(Array.empty[String]).toSeq
      assert(seen.nonEmpty && seen.contains("count"), seen.toString)
      assert(!seen.exists(_.startsWith("FAIL")), seen.toString)
      assert(!seen.contains("collect") && !seen.contains("collectAsList"),
        s"row-valued collect on the driver during Mondrian: $seen")
    } finally spark.listenerManager.unregister(listener)
  }

  test("per-level stats estimates stay constant-width (no BigInt blowup)") {
    // Dataset.localCheckpoint snapshots the origin plan's size estimate
    // into the new leaf, and Catalyst multiplies sizeInBytes through
    // joins; `cur` feeds each level's join chain several times, so
    // without the stats reset the snapshot's bit length grows ~4x per
    // level and deep levels drown the driver in BigInteger.multiply
    // (measured 20.6 s/level at level 13 of the 10x stress). The reset
    // keeps the final plan's estimate at default width: ~63 bits, vs
    // ~63*4^levels without it.
    val df = (1 to 256).map(i => ((i * 37 % 251).toDouble, (i * 53 % 89).toDouble))
      .toDF("a", "b")
    val out = Mondrian.assignPartitions(df, Seq("a", "b"), 2)
    val bits = out.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
    out.count()
    graft.QueryCleanup.drain()
    assert(bits < 256, s"stats sizeInBytes is $bits bits — checkpoint stats compounding again")
  }

  test("anonymize: k certificate, row preservation, in-range values") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 101).toDouble, (i * 53 % 17).toDouble))
      .toDF("id", "a", "b")
    val out = Mondrian.anonymize(df, Seq("a", "b"), 10)
    val rows = out.select("id", "a", "b", "a_range", "b_range", "group_size")
      .as[(Long, Double, Double, String, String, Long)].collect()
    graft.QueryCleanup.drain()
    assert(rows.length == 100)
    assert(rows.map(_._6).min >= 10L)
    rows.foreach { case (_, a, b, ar, br, _) =>
      val Array(alo, ahi) = ar.split("-").map(_.toDouble)
      val Array(blo, bhi) = br.split("-").map(_.toDouble)
      assert(a >= alo && a <= ahi && b >= blo && b <= bhi, s"$a in $ar, $b in $br")
    }
    // more than one partition: the cut tree really ran
    assert(rows.map(_._4).distinct.length > 1)
  }
}
