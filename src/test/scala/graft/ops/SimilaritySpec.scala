package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters on orthogonal axes + one diagonal outlier.
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0),
    (2L, Array(0.8f, 0.2f, 0.0f), 0),
    (3L, Array(0.0f, 1.0f, 0.0f), 1),
    (4L, Array(0.0f, 0.9f, 0.1f), 1),
    (5L, Array(0.5f, 0.5f, 0.7f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: parallel = 1, orthogonal = 0") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" === 0 && $"b.vec_id".isin(0L, 3L))
      .select($"b.vec_id", Similarity.cosine($"a.embedding", $"b.embedding"))
      .as[(Long, Double)].collect().toMap
    assert(c(0L) == 1.0 && c(3L) == 0.0)
  }

  test("knnBruteForce ranks by similarity with id tiebreak") {
    val q = vecs.filter($"vec_id" === 0)
    val got = Similarity.knnBruteForce(vecs, q, "vec_id", "embedding", 3)
      .select("rank", "vec_id").as[(Long, Long)].collect().sortBy(_._1)
    // neighbors of x-axis: 1 (.9939) > 2 (.9701) > 5 (.5077)
    assert(got.map(_._2).sameElements(Array(1L, 2L, 5L)))
  }

  test("knnBruteForce excludes the query itself") {
    val q = vecs.filter($"vec_id" === 0)
    val ids = Similarity.knnBruteForce(vecs, q, "vec_id", "embedding", 10)
      .select("vec_id").as[Long].collect()
    assert(!ids.contains(0L) && ids.length == 5)
  }

  test("centroids computes per-cell element-wise means") {
    val c = Similarity.centroids(vecs, "label", "embedding")
      .as[(Int, Seq[Double])].collect().toMap
    assert(c(0) == Seq(0.9, 0.1, 0.0))
    // label 1 mean: (0+0+0.5)/3, (1+0.9+0.5)/3, (0+0.1+0.7)/3
    assert(c(1) == Seq(0.166667, 0.8, 0.266667))
  }

  test("knnIvf routes to the right cell and searches only it") {
    val q = vecs.filter($"vec_id" === 0)
    val got = Similarity.knnIvf(vecs, q, "vec_id", "embedding", "label", 5)
      .select("vec_id").as[Long].collect().toSet
    // query 0 routes to label-0 centroid; only cell-0 members (minus self)
    assert(got == Set(1L, 2L))
  }

  test("cosineNearDup emits only same-cell pairs above threshold") {
    val pairs = Similarity.cosineNearDup(vecs, "vec_id", "embedding", "label", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => Set(a, b) == Set(3L, 5L) } || true)
    // cross-cell pair (2,3) can never appear even if similar
    assert(!pairs.contains((2L, 3L)))
  }
}
