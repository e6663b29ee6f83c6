package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the single-partition row_number, any partitioning") {
    val df = (1 to 500).map { i =>
      (i.toLong, (i * 37 % 211).toDouble) // duplicate values: id breaks ties
    }.toDF("id", "v")
    val expect = df.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"v", $"id")))
      .select($"id", $"rnk".cast("long")).as[(Long, Long)].collect().toMap
    for (parts <- Seq(1, 7)) {
      val got = Ranking.globalRowNumber(df.repartition(parts),
          Seq("v", "id"), bucketExpr = floor($"v" / 50), outCol = "rnk")
        .select($"id", $"rnk".cast("long")).as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("globalRowNumber drops null-keyed rows and validates inputs") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0))).toDF("id", "v")
    val got = Ranking.globalRowNumber(df, Seq("v", "id"), floor($"v"), "rnk")
      .select($"id", $"rnk".cast("long")).as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 1L -> 2L))
    intercept[IllegalArgumentException] {
      Ranking.globalRowNumber(df, Nil, lit(0), "rnk")
    }
  }

  test("globalPrefixSum equals the single-window running total") {
    // v = i*37 mod 997 over i=1..500 is injective (37 coprime to 997)
    val df = (1 to 500).map(i => ((i * 37 % 997).toDouble, (i % 7 + 1).toLong))
      .toDF("v", "c")
    val got = Ranking.globalPrefixSum(df.repartition(7), Seq("v"),
        floor(col("v") / 100), "c", "cum")
      .select("v", "cum").as[(Double, Long)].collect().toMap
    val rows = df.as[(Double, Long)].collect().sortBy(_._1)
    var acc = 0L
    rows.foreach { case (v, cnt) =>
      acc += cnt
      assert(got(v) == acc, s"$v: ${got(v)} vs $acc")
    }
    assert(got.size == 500)
  }
}
