package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Mondrian multidimensional k-anonymity (LeFevre, DeWitt & Ramakrishnan,
  * "Mondrian Multidimensional K-Anonymity", ICDE 2006): greedy recursive
  * median cuts of the numeric QI space — at each step the partition's
  * widest (globally normalized) dimension is cut at its median, provided
  * BOTH sides keep at least k rows; a partition with no allowable cut is
  * final. The classic alternative to the reference's KMeans route to the
  * same end state (clustering-anon.py:39-54 clusters then min-max
  * generalizes; Mondrian's cuts are deterministic, parameter-free beyond
  * k, and carry the LeFevre utility guarantee that every final partition
  * has < 2k rows on some dimension's worth of slack).
  *
  * Distributed shape, per cut level (there are O(log(n/k)) levels, each
  * halving the largest partitions):
  *   1. stats pass — one groupBy(pid) computing count + per-dim
  *      min/max/median; the collected result is one row PER PARTITION
  *      (≤ n/k rows total, NOT data-sized — the same bounded-collect
  *      contract as the CC convergence probes).
  *   2. side-count pass — candidate medians broadcast back as a ≤
  *      partitions-sized table; one groupBy(pid) counts rows ≤ median
  *      per dim, so cut admissibility (both sides ≥ k) is decided on
  *      EXACT counts, never assumed from the median's position (ties at
  *      the median make the ≤ side fat; this pass is what catches that).
  *   3. reassign — broadcast-join the chosen (pid → dim, median) plan and
  *      renumber pid -> 2·pid+1 / 2·pid+2 in one codegen'd projection.
  * Exact `percentile` keeps the oracle-grade determinism contract of the
  * rest of the library; at extreme per-partition cardinality swap in
  * `approx_percentile` (the cut stays admissible because step 2 verifies
  * sides on exact counts regardless of how the pivot was picked).
  *
  * Levels are capped at 40 both as the pid-overflow guard (pids live in
  * the binary-heap numbering, bounded by 2^(levels+1)) and as a runaway
  * stop: 2^40 partitions exceeds any real n/k.
  */
object Mondrian {

  private final case class Dim(name: String, width: Double, median: Double)

  /** Assign a Mondrian partition id (`pid`) to every row. Rows are never
    * dropped or modified; `pid` values are the binary-heap numbering of
    * the final cut tree (stable across runs — the whole algorithm is
    * deterministic: exact medians, widest-dim-first with the QI list
    * order as the tiebreak). */
  def assignPartitions(df: DataFrame, qiCols: Seq[String], k: Int,
                       maxLevels: Int = 40): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(qiCols.nonEmpty, "need at least one QI column")
    require(maxLevels >= 1 && maxLevels <= 40, s"maxLevels=$maxLevels out of [1,40]")
    val spark = df.sparkSession

    // Global per-dim ranges normalize cut-dimension choice (LeFevre §4's
    // relative width); a zero-range dim can never be cut.
    val gRow = df.agg(
      qiCols.map(c => struct(min(col(c).cast("double")),
        max(col(c).cast("double"))).as(c)).head,
      qiCols.tail.map(c => struct(min(col(c).cast("double")),
        max(col(c).cast("double"))).as(c)): _*).head()
    val gRange: Map[String, Double] = qiCols.map { c =>
      val s = gRow.getAs[Row](c)
      c -> math.max(s.getDouble(1) - s.getDouble(0), 0.0)
    }.toMap

    var cur = df.withColumn("pid", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var level = 0
    var open = true
    while (open && level < maxLevels) {
      // (1) stats: count + min/max/median per dim, one row per partition.
      val aggs = count(lit(1)).as("__n") +: qiCols.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"),
        expr(s"percentile(CAST(`$c` AS DOUBLE), 0.5)").as(s"__md_$c")))
      val stats = cur.groupBy(col("pid")).agg(aggs.head, aggs.tail: _*).collect()

      // Partitions big enough to cut, with their dims widest-first.
      val cand: Map[Long, Seq[Dim]] = stats.iterator.filter(_.getAs[Long]("__n") >= 2L * k)
        .flatMap { r =>
          val dims = qiCols.map { c =>
            val w = r.getAs[Double](s"__mx_$c") - r.getAs[Double](s"__mn_$c")
            Dim(c, if (gRange(c) > 0) w / gRange(c) else 0.0, r.getAs[Double](s"__md_$c"))
          }.filter(_.width > 0)
          if (dims.isEmpty) None
          else Some(r.getAs[Long]("pid") ->
            dims.sortBy(d => (-d.width, qiCols.indexOf(d.name))))
        }.toMap

      if (cand.isEmpty) open = false
      else {
        // (2) exact side counts for every candidate (pid, dim) median.
        val medSchema = StructType(StructField("pid", LongType, nullable = false) +:
          qiCols.map(c => StructField(s"__med_$c", DoubleType, nullable = true)))
        val medRows = cand.toSeq.map { case (pid, dims) =>
          val byName = dims.map(d => d.name -> d.median).toMap
          Row.fromSeq(pid +: qiCols.map(c => byName.get(c).map(Double.box).orNull))
        }
        val medDf = spark.createDataFrame(
          spark.sparkContext.parallelize(medRows, 1), medSchema)
        val sideAggs = count(lit(1)).as("__n") +: qiCols.map(c =>
          sum(when(col(c).cast("double") <= col(s"__med_$c"), 1L).otherwise(0L))
            .as(s"__le_$c"))
        val sides = cur.join(broadcast(medDf), Seq("pid"))
          .groupBy(col("pid")).agg(sideAggs.head, sideAggs.tail: _*)
          .collect().map(r => r.getAs[Long]("pid") -> r).toMap

        // Choose the widest dim whose cut leaves >= k rows on BOTH sides.
        val splits = cand.toSeq.flatMap { case (pid, dims) =>
          val side = sides(pid)
          val n = side.getAs[Long]("__n")
          dims.collectFirst {
            case d if side.getAs[Long](s"__le_${d.name}") >= k &&
              n - side.getAs[Long](s"__le_${d.name}") >= k =>
              Row(pid, d.name, d.median)
          }
        }
        if (splits.isEmpty) open = false
        else {
          // (3) reassign: broadcast the cut plan, renumber in one pass.
          val splitSchema = StructType(Seq(
            StructField("pid", LongType, nullable = false),
            StructField("__sdim", StringType, nullable = false),
            StructField("__smed", DoubleType, nullable = false)))
          val splitDf = spark.createDataFrame(
            spark.sparkContext.parallelize(splits, 1), splitSchema)
          val isLeft = qiCols.foldLeft(lit(false)) { (acc, c) =>
            when(col("__sdim") === c, col(c).cast("double") <= col("__smed"))
              .otherwise(acc)
          }
          val next = cur.join(broadcast(splitDf), Seq("pid"), "left")
            .withColumn("pid",
              when(col("__sdim").isNull, col("pid"))
                .when(isLeft, col("pid") * 2 + 1)
                .otherwise(col("pid") * 2 + 2))
            .drop("__sdim", "__smed")
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count() // materialize before releasing the parent
          cur.unpersist()
          cur = next
          level += 1
        }
      }
    }
    graft.QueryCleanup.register(() => cur.unpersist())
    cur
  }

  /** Full Mondrian anonymization: partition, then replace each QI value
    * with its partition's "min-max" range string (the reference's
    * generalization render, clustering-anon.py:51) and attach the
    * partition size — the k-anonymity certificate — as `group_size`. */
  def anonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    val withPid = assignPartitions(df, qiCols, k)
    val w = Window.partitionBy(col("pid"))
    val generalized = qiCols.foldLeft(withPid) { (d, c) =>
      d.withColumn(s"${c}_range",
        concat_ws("-", min(col(c)).over(w).cast("string"),
          max(col(c)).over(w).cast("string")))
    }
    generalized.withColumn("group_size", count(lit(1)).over(w))
  }
}
