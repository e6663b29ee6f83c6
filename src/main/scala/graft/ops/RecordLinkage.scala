package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter, "A
  * Theory for Record Linkage", JASA 1969) — the statistical layer on top
  * of the blocking/similarity machinery the dedup suite already has
  * (sorted neighborhood q142, Jaro-Winkler dictionary join, deletion
  * neighborhoods). Each comparison field f has match/unmatch agreement
  * probabilities (m_f, u_f): the probability the field agrees given the
  * pair IS / IS NOT the same entity. A pair's composite score is the
  * log-likelihood ratio
  *
  *   score = Σ_f  agree_f ? log2(m_f / u_f) : log2((1−m_f) / (1−u_f))
  *
  * — positive evidence for discriminating fields that agree, negative
  * for ones that don't. Pairs above an upper threshold are links, below
  * a lower one non-links, between the two clerical-review candidates
  * (the classic three-band decision rule).
  *
  * Scale shape: candidate pairs come from a BLOCKED equi-join (shuffle
  * on the block key, never all-pairs); agreement tests and the weight
  * sum are per-row codegen'd expressions, so cost is O(candidate
  * surface) = Σ_blocks |A_b|·|B_b|. Skewed blocks are ordinary join skew
  * — AQE split or [[Skew.saltedJoin]] apply unchanged. The weights are
  * driver-side constants (log2 evaluated once in Scala), which also
  * makes a SQL oracle bit-exact: the literals are inlined, not
  * recomputed by a different libm.
  */
object RecordLinkage {

  /** One comparison field: a boolean agreement expression over the
    * blocked-join row (reference a-side/b-side columns by their — must
    * be distinct — names) and its (m, u) probabilities. */
  final case class Field(name: String, agree: Column, m: Double, u: Double) {
    require(m > 0 && m < 1, s"field $name: m=$m out of (0,1)")
    require(u > 0 && u < 1, s"field $name: u=$u out of (0,1)")
    require(m > u, s"field $name: m=$m must exceed u=$u (else the field " +
      "is anti-discriminating and the weights flip sign)")
    /** log2 agreement weight (positive). */
    def agreeWeight: Double = math.log(m / u) / math.log(2.0)
    /** log2 disagreement weight (negative). */
    def disagreeWeight: Double = math.log((1.0 - m) / (1.0 - u)) / math.log(2.0)
  }

  /** Score every blocked candidate pair: inner-join `a` and `b` on the
    * equal-named `blockCols`, append `fs_score` (6 dp). Callers rename
    * payload columns to distinct names upstream and threshold the
    * result ([[classify]] for the three-band rule). */
  def scoreBlocked(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                   fields: Seq[Field]): DataFrame = {
    require(blockCols.nonEmpty, "blocked linkage needs at least one block column")
    require(fields.nonEmpty, "need at least one comparison field")
    val score = fields.map(f =>
        when(f.agree, lit(f.agreeWeight)).otherwise(lit(f.disagreeWeight)))
      .reduce(_ + _)
    a.join(b, blockCols).withColumn("fs_score", round(score, 6))
  }

  /** Three-band decision rule: `link` at or above `upper`, `non_link`
    * below `lower`, `review` between. */
  def classify(scored: DataFrame, upper: Double, lower: Double): DataFrame = {
    require(upper >= lower, s"upper=$upper must be >= lower=$lower")
    scored.withColumn("decision",
      when(col("fs_score") >= upper, lit("link"))
        .when(col("fs_score") < lower, lit("non_link"))
        .otherwise(lit("review")))
  }

  /** End-to-end entity resolution: blocked FS scoring → link pairs →
    * connected components → one canonical `entity_id` per RECORD. Link
    * transitivity is what scoring alone cannot give (A links B, B links
    * C ⇒ one entity even if A-C never met in a block); the closure runs
    * on the diameter-independent large-star/small-star loop
    * ([[Dedup.dedupClustersStar]] — the 100 TB-correct construction),
    * and the canonical id is the component minimum. Records in no link
    * are their own entity, so the output covers the full id universe.
    *
    * Scale shape: the blocked join is q164's candidate surface; the
    * closure exchanges 8-byte id pairs; the final assignment is one
    * left join of the id universe against the component labels. */
  def resolveEntities(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                      fields: Seq[Field], idA: String, idB: String,
                      upper: Double): DataFrame = {
    val links = scoreBlocked(a, b, blockCols, fields)
      .filter(col("fs_score") >= upper)
      .select(col(idA), col(idB))
    val (labels, release) = Dedup.dedupClustersStarReleasable(links, idA, idB)
    graft.QueryCleanup.register(release)
    val ids = a.select(col(idA).as("id"))
      .unionByName(b.select(col(idB).as("id")))
      .distinct()
    ids.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("entity_id"))
  }
}
