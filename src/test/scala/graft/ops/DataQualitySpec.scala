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
}
