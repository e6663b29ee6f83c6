package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    RecordLinkage.Field("name", col("name_a") === col("name_b"), 0.9, 0.01),
    RecordLinkage.Field("city", col("city_a") === col("city_b"), 0.8, 0.2))

  test("weights are the Fellegi-Sunter log-likelihood ratios") {
    val f = RecordLinkage.Field("x", lit(true), 0.9, 0.01)
    assert(math.abs(f.agreeWeight - math.log(90.0) / math.log(2.0)) < 1e-12)
    assert(math.abs(f.disagreeWeight - math.log(0.1 / 0.99) / math.log(2.0)) < 1e-12)
    assert(f.agreeWeight > 0 && f.disagreeWeight < 0)
  }

  test("m <= u is rejected (anti-discriminating field)") {
    intercept[IllegalArgumentException](RecordLinkage.Field("x", lit(true), 0.2, 0.5))
    intercept[IllegalArgumentException](RecordLinkage.Field("x", lit(true), 1.0, 0.5))
  }

  test("blocked scoring sums per-field evidence; blocking bounds the pairs") {
    val a = Seq((1L, "ann", "rome", "b1"), (2L, "bob", "oslo", "b2"))
      .toDF("id_a", "name_a", "city_a", "blk")
    val b = Seq((11L, "ann", "rome", "b1"), (12L, "ann", "kiev", "b1"),
      (13L, "bob", "oslo", "b9")).toDF("id_b", "name_b", "city_b", "blk")
    val scored = RecordLinkage.scoreBlocked(a, b, Seq("blk"), fields)
      .select("id_a", "id_b", "fs_score").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // only block b1 pairs exist: (1,11) both agree, (1,12) name only;
    // 13 is in an unmatched block despite agreeing on every field
    assert(scored.keySet == Set((1L, 11L), (1L, 12L)))
    val full = fields.map(_.agreeWeight).sum
    val partial = fields(0).agreeWeight + fields(1).disagreeWeight
    assert(math.abs(scored((1L, 11L)) - full) < 1e-6)
    assert(math.abs(scored((1L, 12L)) - partial) < 1e-6)
  }

  test("classify applies the three-band rule inclusively at the bounds") {
    val df = Seq((1L, 5.0), (2L, 2.0), (3L, -1.0), (4L, 2.5))
      .toDF("id", "fs_score")
    val got = RecordLinkage.classify(df, upper = 2.5, lower = 2.0)
      .select("id", "decision").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "link", 2L -> "review", 3L -> "non_link", 4L -> "link"))
  }

  test("resolveEntities closes links transitively; singletons keep their id") {
    // A(1)-B(11) and B(11)-C(21) link inside one block; D(2) never links.
    val a = Seq((1L, "x", 0), (2L, "z", 1)).toDF("id_a", "k_a", "blk")
    val b = Seq((11L, "x", 0), (21L, "x", 0), (31L, "q", 1)).toDF("id_b", "k_b", "blk")
    val fields = Seq(RecordLinkage.Field("k", col("k_a") === col("k_b"),
      m = 0.9, u = 0.01))
    val out = RecordLinkage.resolveEntities(a, b, Seq("blk"), fields,
        "id_a", "id_b", upper = 1.0)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    // 1, 11, 21 collapse to min id 1 (A-11 and A-21 link directly here;
    // the transitive case is 11-21 via their common match with 1)
    assert(out(1L) == 1L && out(11L) == 1L && out(21L) == 1L, out.toString)
    // never-linked records are their own entity
    assert(out(2L) == 2L && out(31L) == 31L)
    assert(out.size == 5)
  }

  test("scoreBlockedCapped: cold blocks exact; hot block bounded to (nA+nB)*w pairs; adjacent matches kept") {
    // hot block "h": 40 x 40 = 1600 full pairs; cold block "c": 2 x 2.
    // Names collate matches adjacently: a-side n007x pairs b-side n007y.
    val a = ((0 until 40).map(i => (i.toLong, f"n$i%03dx", "h")) ++
      Seq((100L, "ann", "c"), (101L, "zed", "c")))
      .toDF("id_a", "name_a", "blk")
    val b = ((0 until 40).map(i => (1000L + i, f"n$i%03dy", "h")) ++
      Seq((1100L, "ann", "c"), (1101L, "foo", "c")))
      .toDF("id_b", "name_b", "blk")
    val f = Seq(RecordLinkage.Field("n17",
      substring(col("name_a"), 1, 4) === substring(col("name_b"), 1, 4),
      m = 0.9, u = 0.01))
    val w = 3
    val capped = RecordLinkage.scoreBlockedCapped(a, b, Seq("blk"), f,
      "id_a", "id_b", col("name_a"), col("name_b"), maxBlockPairs = 100L, w = w)
    // cold block keeps the exact full product (2 x 2 = 4 pairs)
    assert(capped.filter(col("blk") === "c").count() == 4L)
    // hot block pair surface is bounded by (nA+nB)*w, far below 1600
    val hotPairs = capped.filter(col("blk") === "h").count()
    assert(hotPairs <= (40L + 40L) * w && hotPairs < 1600L, hotPairs.toString)
    // every true match is sort-adjacent (x/y suffix), so all 40 survive
    val links = capped.filter(col("blk") === "h" && col("fs_score") > 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(links == (0 until 40).map(i => (i.toLong, 1000L + i)).toSet)
    // below the cap the output is IDENTICAL to the unbounded path
    val unbounded = RecordLinkage.scoreBlocked(a, b, Seq("blk"), f)
    val loose = RecordLinkage.scoreBlockedCapped(a, b, Seq("blk"), f,
      "id_a", "id_b", col("name_a"), col("name_b"), maxBlockPairs = 1000000L, w = w)
      .select(unbounded.columns.map(col).toSeq: _*)
    assert(loose.exceptAll(unbounded).count() == 0 &&
      unbounded.exceptAll(loose).count() == 0)
  }

  test("resolveEntities with the cap: hot-block entities still resolve through adjacent links") {
    val a = (0 until 30).map(i => (i.toLong, f"n$i%03dx", 0)).toDF("id_a", "k_a", "blk")
    val b = (0 until 30).map(i => (1000L + i, f"n$i%03dy", 0)).toDF("id_b", "k_b", "blk")
    val f = Seq(RecordLinkage.Field("k",
      substring(col("k_a"), 1, 4) === substring(col("k_b"), 1, 4),
      m = 0.9, u = 0.01))
    val out = RecordLinkage.resolveEntities(a, b, Seq("blk"), f,
        "id_a", "id_b", upper = 1.0, maxBlockPairs = 100L,
        snKeys = Some((col("k_a"), col("k_b"))), snWindow = 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    // every pair i <-> 1000+i collapses to entity i
    assert((0 until 30).forall(i => out(i.toLong) == i && out(1000L + i) == i),
      out.toString)
  }

  test("resolveEntities transitivity across blocks (A-B, B-C, no A-C block)") {
    // a1 matches b1 in block 0; a2 matches b1 in block 0 as well -> the
    // two a-records join through the shared b even though they never
    // co-occur in a pair.
    val a = Seq((1L, "x", 0), (2L, "x", 0)).toDF("id_a", "k_a", "blk")
    val b = Seq((11L, "x", 0)).toDF("id_b", "k_b", "blk")
    val fields = Seq(RecordLinkage.Field("k", col("k_a") === col("k_b"),
      m = 0.9, u = 0.01))
    val out = RecordLinkage.resolveEntities(a, b, Seq("blk"), fields,
        "id_a", "id_b", upper = 1.0)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(out == Map(1L -> 1L, 2L -> 1L, 11L -> 1L), out.toString)
  }
}
