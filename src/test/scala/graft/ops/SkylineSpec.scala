package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2d keeps exactly the non-dominated points") {
    val pts = Seq(
      (1L, 1.0, 9L),  // front: best y
      (2L, 5.0, 5L),  // front
      (3L, 9.0, 1L),  // front: best x
      (4L, 4.0, 4L),  // dominated by (5,5)
      (5L, 5.0, 4L),  // dominated by (5,5): same x, lower y
      (6L, 1.0, 8L),  // dominated by (1,9): same x, lower y
      (7L, 0.5, 9L)   // dominated by (1,9): lower x, same y
    ).toDF("id", "x", "y")
    val got = Skyline.skyline2d(pts, "x", "y", bucketWidth = 2.0)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("ties on both dims are all kept; nulls are excluded") {
    val pts = Seq(
      (1L, Some(3.0), Some(3L)),
      (2L, Some(3.0), Some(3L)),   // exact duplicate of the front point
      (3L, None, Some(9L)),        // null x: excluded, cannot dominate
      (4L, Some(9.0), None)        // null y: excluded
    ).toDF("id", "x", "y")
    val got = Skyline.skyline2d(pts, "x", "y", bucketWidth = 1.0)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("agrees with the quadratic NOT-EXISTS definition on random data, any bucket width") {
    val n = 300
    val pts = (1 to n).map { i =>
      // deterministic pseudo-random spread
      val x = (i * 37 % 101).toDouble
      val y = (i * 53 % 97).toLong
      (i.toLong, x, y)
    }.toDF("id", "x", "y")
    val brute = pts.as("t").join(pts.as("o"),
        ($"o.x" >= $"t.x") && ($"o.y" >= $"t.y") &&
          (($"o.x" > $"t.x") || ($"o.y" > $"t.y")), "left_anti")
      .select("id").as[Long].collect().toSet
    for (width <- Seq(0.5, 7.0, 1000.0)) {
      val got = Skyline.skyline2d(pts, "x", "y", width)
        .select("id").as[Long].collect().toSet
      assert(got == brute, s"bucketWidth $width diverged from brute force")
    }
  }

  test("result is partitioning-independent") {
    val pts = (1 to 200).map(i =>
      (i.toLong, (i * 31 % 83).toDouble, (i * 41 % 89).toLong))
      .toDF("id", "x", "y")
    val a = Skyline.skyline2d(pts, "x", "y", 10.0)
      .select("id").as[Long].collect().toSet
    val b = Skyline.skyline2d(pts.repartition(13), "x", "y", 10.0)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }
}
