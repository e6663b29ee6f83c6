package graft.ops

import org.apache.spark.sql.functions._

class FeaturesSpec extends graft.SparkSpec {
  import spark.implicits._

  test("oofTargetEncode: matches a plain-Scala replay of the leave-fold-out algebra") {
    val data = (1 to 200).map(i => (i.toLong, s"cat${i % 3}", i % 5 == 0))
    val df = data.toDF("k", "cat", "y")
    val k = 4
    val m = 10.0
    val got = Features.oofTargetEncode(df, "k", "cat", col("y"), k, m)
      .select("k", "cat", "fold", "te")
      .as[(Long, String, Long, Double)].collect()
    assert(got.length == 200 && got.map(_._1).distinct.length == 200)
    // replay: fold from the op's own output (assignment is the portable
    // hash), the smoothed-mean algebra recomputed independently
    val folds = got.map(r => r._1 -> r._3).toMap
    val rows = data.map { case (id, cat, y) =>
      (cat, folds(id), if (y) 1L else 0L) }
    val cells = rows.groupBy(r => (r._1, r._2))
      .map { case (kk, v) => kk -> ((v.size.toLong, v.map(_._3).sum)) }
    def catTot(c: String) = cells.filter(_._1._1 == c).values
    def foldTot(f: Long) = cells.filter(_._1._2 == f).values
    val gN = rows.size.toLong
    val gS = rows.map(_._3).sum
    def expected(c: String, f: Long): Double = {
      val (n, s) = cells((c, f))
      val tn = catTot(c).map(_._1).sum; val ts = catTot(c).map(_._2).sum
      val fn = foldTot(f).map(_._1).sum; val fs = foldTot(f).map(_._2).sum
      val prior = (gS - fs).toDouble / (gN - fn).toDouble
      BigDecimal(((ts - s).toDouble + m * prior) / ((tn - n).toDouble + m))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { case (_, c, f, te) =>
      assert(te == expected(c, f), s"cat=$c fold=$f: $te != ${expected(c, f)}")
    }
    // leakage check: perturbing ONLY fold f's labels must not move fold
    // f's own encodes for a category confined to f... (cheap proxy: the
    // encode differs across folds whenever fold label rates differ)
    val byFold = got.groupBy(r => (r._2, r._3)).view.mapValues(_.head._4)
    assert(byFold.values.toSeq.distinct.size > 1)
  }

  test("oofTargetEncode: NULL categories form a real level and every row survives") {
    val df = (1 to 120).map { i =>
      (i.toLong, if (i % 4 == 0) null else s"cat${i % 2}", i % 3 == 0)
    }.toDF("k", "cat", "y")
    val got = Features.oofTargetEncode(df, "k", "cat", col("y"), k = 4, smoothing = 5.0)
      .select("k", "cat", "te").collect()
    // no input row vanishes (the old equi-join dropped null-cat rows)
    assert(got.length == 120, s"rows ${got.length} != 120")
    val nullRows = got.filter(_.isNullAt(1))
    assert(nullRows.length == 30 && nullRows.forall(!_.isNullAt(2)),
      "null-category rows must carry a (non-null) encode")
  }
}
