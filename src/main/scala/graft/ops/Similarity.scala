package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Extension surface per SURVEY §7.2 step 7.
  *
  * Two paths:
  *  - `knnBruteForce`: broadcast the (small) query set against the full
  *    corpus — exact, one pass over the data, no corpus shuffle. This is
  *    the correctness baseline and stays viable at 100 TB whenever the
  *    query set is broadcastable (each executor streams its partitions
  *    once; the top-k reduces map-side via the rank window over the
  *    query-id partition).
  *  - `knnIvf`: IVF-style two-level search — k-means-ish coarse centroids
  *    (here: per-label mean, i.e. the cluster assignment is precomputed,
  *    as a real IVF index would persist it), probe the nearest `nprobe`
  *    cells only. Scan cost drops by ~nlist/nprobe; the cell assignment
  *    is a broadcast join against the tiny centroid table.
  *
  * All arithmetic is index-ordered double accumulation (the native
  * GraftCosine kernel; the declarative zip_with/aggregate twin is kept as
  * its cross-check) so an external SQL oracle reproduces results
  * bit-for-bit before rounding; similarities are rounded to 6dp BEFORE
  * ranking so cross-engine last-ulp differences can never flip an
  * ordering.
  */
object Similarity {

  /** Index-ordered double dot product of two array<numeric> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Declarative cosine (zip_with + aggregate). Interpreted lambdas —
    * kept as the cross-check reference for the native kernel; ops use
    * [[cosine]] which compiles to GraftCosine. */
  def cosineDeclarative(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Cosine similarity rounded to 6dp (rank-stable across engines),
    * computed by the native compiled kernel (bit-identical to
    * [[cosineDeclarative]] — same index-ordered double accumulation).
    * Requires GraftFunctions.ensureRegistered on the session. */
  def cosine(a: Column, b: Column): Column =
    round(GraftFunctions.cosineNative(a, b), 6)

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` must be broadcast-small; output (qid, rank, vec_id, sim). */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
  }

  /** Element-wise mean vector per cell: the coarse centroid table.
    * posexplode + group — one shuffle over (cell, pos), tiny output. */
  def centroids(corpus: DataFrame, cellCol: String, vecCol: String): DataFrame =
    corpus.select(col(cellCol).as("cell"), posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .groupBy(col("cell"), col("__p"))
      .agg(avg(col("__v").cast("double")).as("__m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("__p"), col("__m")))).as("__pm"))
      // elements rounded to 6dp so cross-engine accumulation-order ulps in
      // the mean can never shift downstream routing decisions
      .select(col("cell"), transform(col("__pm"), s => round(s.getField("__m"), 6)).as("centroid"))

  /** IVF search with nprobe=1: route each query to its nearest centroid,
    * then exact top-k within that cell only. Output as knnBruteForce. */
  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, cellCol: String, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val cents = centroids(corpus, cellCol, vecCol)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val routed = q.join(broadcast(cents))
      .select(col("qid"), col("__qv"), col("cell"),
        cosine(col("__qv"), col("centroid")).as("__csim"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("__csim").desc, col("cell"))
    val best = routed.withColumn("__r", row_number().over(wq))
      .filter(col("__r") === 1)
      .select(col("qid"), col("__qv"), col("cell"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__cv"),
      col(cellCol).as("cell"))
    val scored = c.join(broadcast(best), Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("__qv"), col("__cv")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "rank", "vec_id", "sim")
  }

  /** Embedding-cosine near-duplicate pairs within the same cell
    * (cell-bucketed to avoid the O(n²) cross join; a production variant
    * would use random-hyperplane LSH cells). */
  def cosineNearDup(corpus: DataFrame, idCol: String, vecCol: String,
                    cellCol: String, threshold: Double): DataFrame = {
    GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(col(cellCol).as("cell"), col(idCol).as("id_a"),
      col(vecCol).as("__va"))
    val r = corpus.select(col(cellCol).as("cell"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"))
    c.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("__va"), col("__vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
