package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t-closeness: per-equivalence-class Earth Mover's Distance of the
  * sensitive-attribute distribution against the dataset-wide distribution,
  * then suppression of groups with EMD > t.
  *
  * Reference: t-closeness.py:42-121 (driver-side loop over groups) and the
  * standalone violation counter at t-closeness.py:187-208. We implement the
  * *intended* semantics (group vs. global distribution — the violation
  * counter's version); the reference's main loop accidentally compares each
  * group against itself (SURVEY §3) which we do not replicate.
  *
  * Two formulations:
  *  - [[groupEmd]]: pure DataFrame ops — counts per (group, position),
  *    densified against the global position set, window cumsum, closed-form
  *    1-D EMD. Everything stays in Catalyst/codegen; the densify join
  *    broadcasts the position dimension (|sensitive domain| rows, tiny).
  *  - [[graft.functions.EmdAggregator]]: a typed Aggregator doing the same in
  *    a single shuffle with map-side partial aggregation; preferred when the
  *    group count is huge and the extra window pass matters.
  *
  * The sensitive column must be numeric "positions" (an ordinal encoding for
  * categorical attributes — the reference uses sorted-unique index positions,
  * t-closeness.py:62-67); use [[ordinal]] to produce it.
  */
object TCloseness {

  /** Alphabetical ordinal encoding of a categorical column, matching the
    * reference's sorted-unique `label_to_pos` (t-closeness.py:62-63).
    * Broadcast-joins a tiny dictionary; no global window at scale.
    */
  /** Widest sensitive-attribute domain [[ordinal]] will dictionary-encode.
    * The dictionary is collected to the driver and broadcast, so the bound
    * is what stands between a mistaken high-cardinality column and a
    * driver OOM. 10k ordinal positions broadcast as ~a few hundred KB —
    * far past any real sensitive attribute (the reference's domain is 2). */
  val MaxOrdinalDomain = 10000

  def ordinal(df: DataFrame, c: String, outCol: String): DataFrame = {
    // Sensitive-attribute domains are tiny by assumption (the reference's
    // is 2 values): collect the sorted domain and broadcast a dictionary.
    // A dense_rank over a global window would funnel through one task.
    // Ordering happens on the column's NATIVE type (sorting the casted
    // string would ordinal-sort numerics lexicographically: 10 < 2);
    // the join key is the string rendering, matching Spark's own cast.
    val spark = df.sparkSession
    import spark.implicits._
    // LIMIT-capped collect (the groupEmdAgg idiom): orderBy+limit plans as
    // TakeOrdered, so the driver never holds more than MaxOrdinalDomain+1
    // values even when the column is mistakenly high-cardinality — fail
    // fast instead of OOM
    val values = df.select(col(c)).distinct().orderBy(col(c))
      .limit(MaxOrdinalDomain + 1)
      .select(col(c).cast("string")).as[String].collect()
    require(values.length <= MaxOrdinalDomain,
      s"TCloseness.ordinal: column '$c' has > $MaxOrdinalDomain distinct " +
        "values — not an ordinal sensitive attribute. Bin it first " +
        "(Generalization.binEquiWidth / binEdges) and ordinal-encode the bins.")
    val dict = values.zipWithIndex.map { case (v, i) => (v, i.toLong) }.toSeq
      .toDF("__ord_k", outCol)
    df.join(broadcast(dict), col(c).cast("string") === col("__ord_k"))
      .drop("__ord_k")
  }

  /** One row per group: QI columns + `emd` (double). `posCol` is the numeric
    * sensitive-position column.
    */
  def groupEmd(df: DataFrame, qis: Seq[String], posCol: String): DataFrame =
    emdFromCells(
      df.groupBy(qis.map(col) :+ col(posCol): _*).agg(count(lit(1)).as("__cnt")),
      qis, posCol)

  /** [[groupEmd]] with the REFERENCE distribution taken from a separate
    * table: each group's sensitive distribution is compared against
    * `referenceDf`'s, not `df`'s own. This is what a post-suppression
    * self-check needs — suppression shifts the surviving table's global
    * distribution, so rechecking filtered output against itself can
    * report spurious boundary violations that the filter (correctly,
    * against its own fixed basis) admitted. */
  def groupEmdAgainst(df: DataFrame, referenceDf: DataFrame, qis: Seq[String],
                      posCol: String): DataFrame = {
    val cells = df.groupBy(qis.map(col) :+ col(posCol): _*).agg(count(lit(1)).as("__cnt"))
    val refCounts = referenceDf.groupBy(col(posCol)).agg(count(lit(1)).as("__gcnt"))
    // Runtime guard (EAGER — one small Spark action at construction time):
    // a position in df but absent from the reference would be silently
    // dropped by the densify join, renormalizing the group distribution
    // and understating EMD. Requires df's positions ⊆ reference's —
    // guaranteed when df ⊆ referenceDf (the post-suppression self-check).
    val orphans = cells.select(col(posCol)).distinct()
      .join(broadcast(refCounts.select(col(posCol))), Seq(posCol), "left_anti")
      .take(5)
    require(orphans.isEmpty,
      s"groupEmdAgainst: sensitive positions ${orphans.map(_.get(0)).mkString(", ")} " +
        s"occur in df but not in referenceDf — the reference distribution must " +
        s"cover every position in df (is df a subset of the reference table?)")
    emdFromCells(cells, qis, posCol, Some(refCounts))
  }

  /** t-closeness for CATEGORICAL sensitive attributes: per-group TOTAL
    * VARIATION distance (the t-closeness paper's "equal distance" ground
    * metric for nominal attributes, where EMD degenerates to
    * TV = ½ Σ_v |p_v − q_v|) against the dataset-wide distribution. No
    * ordinal encoding required — values never need an order.
    *
    * Scale: identical topology to [[groupEmd]] minus the cumsum windows —
    * one cell aggregation over the raw table, then the global
    * distribution, densify, and the absolute-difference sum all run over
    * the |groups|×|domain| cell table with the tiny domain broadcast.
    */
  def groupTv(df: DataFrame, qis: Seq[String], sensitiveCol: String): DataFrame = {
    val qiCols = qis.map(col)
    val cell = df.groupBy(qiCols :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__cnt"))
    val globCnt = cell.groupBy(col(sensitiveCol)).agg(sum("__cnt").as("__gcnt"))
    val glob = globCnt.crossJoin(broadcast(globCnt.agg(sum("__gcnt").as("__tot"))))
      .withColumn("__q", col("__gcnt") / col("__tot"))
      .select(col(sensitiveCol), col("__q"))
    val groups = cell.select(qiCols: _*).distinct()
    // densify with <=> keys: groupBy emits NULL-keyed cells (null QI
    // values and null sensitive values are real groups), and a plain
    // `=` join would zero their counts while __q still carries the null
    // mass — per-group p would no longer sum to 1.
    val dense = NullSafe.join(groups.crossJoin(broadcast(glob)), cell,
        qis :+ sensitiveCol, "left")
      .na.fill(0L, Seq("__cnt"))
    val wg = Window.partitionBy(qiCols: _*)
    dense
      .withColumn("__p", col("__cnt") / sum("__cnt").over(wg))
      .groupBy(qiCols: _*)
      .agg((sum(abs(col("__p") - col("__q"))) / 2).as("tv"))
  }

  /** EMD from a pre-aggregated (qis..., pos, __cnt) cell table. The ONLY
    * pass over the raw data is the cell aggregation the caller performed;
    * the global distribution, densification, cumsums, and the closed form
    * all run over the |groups|×|domain| cell table. `globalPosCounts`
    * (posCol, __gcnt) overrides the reference distribution; by default it
    * derives from the cells themselves. */
  private[ops] def emdFromCells(cell: DataFrame, qis: Seq[String], posCol: String,
                                globalPosCounts: Option[DataFrame] = None): DataFrame = {
    val qiCols = qis.map(col)
    // global distribution derived from the cells (no raw-table rescan);
    // total via scalar-agg cross join, not an empty-partition window
    val globCnt = globalPosCounts.getOrElse(
      cell.groupBy(col(posCol)).agg(sum("__cnt").as("__gcnt")))
    val glob = globCnt.crossJoin(broadcast(globCnt.agg(sum("__gcnt").as("__tot"))))
      .withColumn("__q", col("__gcnt") / col("__tot"))
      .select(col(posCol), col("__q"))
    // densify: every group gets a row for every global position. <=>
    // keys — null QI values are real groups out of the cell aggregation,
    // and a plain `=` join would zero their counts (emd would come out
    // null from a 0/0 normalization instead of the group's true value).
    val groups = cell.select(qiCols: _*).distinct()
    val dense = NullSafe.join(groups.crossJoin(broadcast(glob)), cell,
        qis :+ posCol, "left")
      .na.fill(0L, Seq("__cnt"))
    val wg = Window.partitionBy(qiCols: _*)
    val wc = wg.orderBy(col(posCol))
    dense
      .withColumn("__p", col("__cnt") / sum("__cnt").over(wg))
      .withColumn("__cp", sum("__p").over(wc))
      .withColumn("__cq", sum("__q").over(wc))
      .withColumn("__nxt", lead(col(posCol), 1).over(wc))
      .filter(col("__nxt").isNotNull)
      .groupBy(qiCols: _*)
      .agg(sum(abs(col("__cp") - col("__cq")) * (col("__nxt") - col(posCol))).as("emd"))
  }

  /** [[groupEmd]] via the typed [[graft.functions.EmdAggregator]]: ONE
    * shuffle for all groups (map-side partial maps of position->count),
    * EMD computed in finish() against the driver-collected global
    * distribution. Preferred over the window formulation when group count
    * is huge. Bit-identical output (same sequential sum order over sorted
    * positions — q55's oracle is the proof).
    *
    * Domain guard: the aggregator holds a position->count map PER GROUP
    * and collects the global distribution to the driver, so it is only
    * the right topology for small ordinal domains. The domain is probed
    * with a LIMIT-capped aggregation (the probe itself never collects an
    * unbounded set); above [[graft.functions.EmdAggregator.MaxDomain]]
    * positions the call routes to the windowed closed form ([[groupEmd]]
    * — same output contract, executor-resident state, no bound). */
  def groupEmdAgg(df: DataFrame, qis: Seq[String], posCol: String): DataFrame = {
    val maxDomain = graft.functions.EmdAggregator.MaxDomain
    val rows = df.groupBy(col(posCol)).agg(count(lit(1)).as("__c"))
      .limit(maxDomain + 1).collect()
    if (rows.length > maxDomain) return groupEmd(df, qis, posCol)
    val total = rows.map(_.getLong(1)).sum.toDouble
    val global = rows.map(r => Row2Pos(r.get(0)) -> r.getLong(1) / total).toMap
    val emdFn = graft.functions.EmdAggregator.emd(global)
    df.groupBy(qis.map(col): _*)
      .agg(emdFn(col(posCol).cast("double")).as("emd"))
  }

  /** Numeric position extraction for the collected global domain. */
  private def Row2Pos(v: Any): Double = v match {
    case d: Double => d
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case other => other.toString.toDouble
  }

  /** k-anonymity + t-closeness suppression: rows whose group both has >= k
    * members and sits within EMD <= t of the global distribution.
    * Returns the surviving rows with original columns.
    */
  def filter(df: DataFrame, qis: Seq[String], posCol: String, k: Int, t: Double): DataFrame = {
    // One shuffle over the raw data (the cell aggregation); k-filtering,
    // the global distribution, and the EMD all derive from the small cell
    // table, so the raw table is scanned exactly twice (cells + the final
    // semi-join probe). The naive formulation — suppress() then
    // groupEmd() then a semi-join — recomputes the window suppression
    // three times.
    val cell = df.groupBy(qis.map(col) :+ col(posCol): _*).agg(count(lit(1)).as("__cnt"))
    val keep = cell.groupBy(qis.map(col): _*).agg(sum("__cnt").as("__grp"))
      .filter(col("__grp") >= k).select(qis.map(col): _*)
    val kanonCell = NullSafe.semi(cell, keep, qis)
    val passing = emdFromCells(kanonCell, qis, posCol)
      .filter(col("emd") <= t).select(qis.map(col): _*)
    // passing is bounded by the group count — data-dependent, so no
    // forced broadcast (AQE picks one when it fits). <=> keys so rows in
    // a NULL-QI group survive when their group passes.
    NullSafe.semi(df, passing, qis)
  }

  /** Count of groups violating t (the reference's double-check pattern,
    * t-closeness.py:187-208 — note its per-group t_closeness_check
    * degenerates to comparing each group with itself, so it always prints
    * 0; this is the intended check). `reference` fixes the global
    * distribution basis — pass the table the filter measured against
    * (the k-anonymized input) for a structurally-zero recheck; default is
    * df's own distribution. `reference` must contain every sensitive
    * position occurring in df (true whenever df ⊆ reference).
    */
  def violationCount(df: DataFrame, qis: Seq[String], posCol: String, t: Double,
                     reference: Option[DataFrame] = None): Long = {
    val emds = reference match {
      case Some(ref) => groupEmdAgainst(df, ref, qis, posCol)
      case None => groupEmd(df, qis, posCol)
    }
    emds.filter(col("emd") > t).count()
  }
}
