package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two column keys so
  * that sorting by the single interleaved value keeps rows close in BOTH
  * dimensions — the multi-column data-layout trick table formats expose
  * as `ZORDER BY`. [[Compaction.compact]]'s range clustering makes
  * parquet min/max footer stats selective for ONE column; at 100 TB a
  * table is usually filtered by two (tenant + time, customer + order
  * range), and a single-column sort leaves the second column's per-file
  * ranges as wide as the table. Writing in z-value order bounds BOTH
  * per-file ranges, so either predicate skips files.
  *
  * The interleave is plain bit arithmetic (shift/and/or), unrolled at
  * plan-build time into a codegen'd expression — and replayable by an
  * external SQL engine bit-for-bit, which is how q120's oracle checks it.
  */
object ZOrder {

  /** Morton-interleave two non-negative int columns, `bits` bits each
    * (result uses 2·bits bits): bit i of `x` lands at position 2i, bit i
    * of `y` at 2i+1. Callers bucket raw values into [0, 2^bits) first
    * (modulo or range binning) — the z-curve needs bounded keys. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of (0, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Equal-width bucket of a non-negative column into [0, 2^bits) given
    * its max value — the RANGE binning [[zValue]] callers should prefer
    * over pmod when the two dimensions' domains differ: pmod keeps a
    * small domain's HIGH bits permanently zero, so the interleave is
    * dominated by the wide column and the z-curve degrades to a
    * single-column sort for the narrow one (measured: the suppkey
    * dimension got ZERO file-skipping under pmod bucketing at sf0.1;
    * see PERFORMANCE.md "z-order file skipping"). Range binning spends
    * all `bits` of both dimensions regardless of domain width. */
  def rangeBucket(c: Column, minVal: Long, maxVal: Long, bits: Int): Column = {
    require(maxVal >= minVal, s"maxVal=$maxVal must be >= minVal=$minVal")
    require(bits >= 1 && bits <= 31, s"bits=$bits out of (0, 31]")
    // clamp BOTH ends: a value outside the probed range (or any
    // negative offset) must never reach zValue — a negative bucket
    // would interleave sign-extended garbage silently
    greatest(lit(0L),
      least(floor((c - minVal).cast("double") * (1L << bits).toDouble
          / (maxVal - minVal + 1.0)),
        lit((1L << bits) - 1L))).cast("long")
  }

  /** Rewrite a parquet directory z-ordered on two bucketed keys:
    * ceil(inputBytes / targetBytes) files, each covering a tight square
    * of the (xCol, yCol) plane instead of a stripe of one column.
    * EAGER, like [[Compaction.compact]]. Returns the file count.
    *
    * Buckets by RANGE against the columns' observed max (one 1-row
    * probe) so both dimensions spend all their bits — see
    * [[rangeBucket]] for why pmod is wrong when domains differ. */
  def compactZOrder(spark: SparkSession, inDir: String, outDir: String,
                    xCol: String, yCol: String, bits: Int,
                    targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val df = spark.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1L, (bytes.toLong + targetBytes - 1) / targetBytes).toInt
    val mx = df.agg(min(col(xCol).cast("long")), max(col(xCol).cast("long")),
      min(col(yCol).cast("long")), max(col(yCol).cast("long"))).head
    if (mx.isNullAt(0) || mx.isNullAt(2)) {
      // empty (or all-null-key) input: nothing to cluster — write the
      // empty frame so the output directory is still readable
      df.write.mode("overwrite").parquet(outDir)
      return n
    }
    val z = zValue(
      rangeBucket(col(xCol).cast("long"), mx.getLong(0), mx.getLong(1), bits),
      rangeBucket(col(yCol).cast("long"), mx.getLong(2), mx.getLong(3), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    n
  }
}
