// Z-order file-skipping evidence (round 11): measure parquet bytes READ
// for selective single-column range predicates under three physical
// layouts of sf0.1 lineitem -- natural (writer order), range-sorted on
// l_partkey only, and z-ordered on (l_partkey, l_suppkey). Row-group
// min/max pruning is the mechanism; the z-curve is the only layout whose
// per-file ranges are tight in BOTH columns, which is the entire 100 TB
// argument for ZOrder.compactZOrder (a 100 TB table is filtered by two
// dimensions, and a single-column sort leaves the second column's
// per-file ranges as wide as the table). Results -> PERFORMANCE.md.
//
// compactZOrder range-buckets both keys against their observed
// min/max (monotone in the raw values), so raw-value range predicates
// align with the curve and BOTH dimensions spend all their bits even
// with mismatched domains (partkey ~20k vs suppkey ~1k here).
//
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false -i tools/zorder_skip.scala
import graft.BenchMetricsListener
import graft.sources.ZOrder
import org.apache.spark.sql.functions._

val src = "/root/testdata/sf0.1/lineitem.parquet"
val base = spark.read.parquet(src)
val (pMax, sMax) = {
  val r = base.agg(max("l_partkey"), max("l_suppkey")).head
  (r.getLong(0), r.getLong(1))
}
// rangeBucket normalizes any domain into the 15-bit space; no cap needed

val tag = System.nanoTime()
val dirNat = s"/tmp/graft_zskip_natural_$tag"
val dirSort = s"/tmp/graft_zskip_sorted_$tag"
val dirZ = s"/tmp/graft_zskip_zorder_$tag"
val target = 512L * 1024 // ~0.5 MB plan-stat chunks => ~24 files at sf0.1

// natural: writer order, same file count as the others for fairness
val nFiles = ZOrder.compactZOrder(spark, src, dirZ, "l_partkey", "l_suppkey",
  bits = 15, targetBytes = target)
base.repartition(nFiles).write.mode("overwrite").parquet(dirNat)
base.repartitionByRange(nFiles, col("l_partkey"))
  .sortWithinPartitions("l_partkey")
  .write.mode("overwrite").parquet(dirSort)
println(s"ZSKIP layouts written: $nFiles files each")

val listener = new BenchMetricsListener
spark.sparkContext.addSparkListener(listener)

def bytesRead(f: => Unit): Long = {
  val before = listener.totals._3
  f
  graft.SparkInternals.flushListenerBus(spark.sparkContext)
  listener.totals._3 - before
}

// 0.5%-ish selective range on each dimension; sum forces a real read
def qPart(dir: String): Unit = {
  spark.read.parquet(dir)
    .filter(col("l_partkey").between(1000, 1099))
    .agg(sum("l_extendedprice")).head
}
def qSupp(dir: String): Unit = {
  spark.read.parquet(dir)
    .filter(col("l_suppkey").between(100, 104))
    .agg(sum("l_extendedprice")).head
}

// The natural layout is the baseline: identical query, identical reader
// configuration, zero skipping (a pushdown-disabled "full scan" is NOT
// comparable -- pushed filters change the reader's IO pattern, page
// seeks vs whole-chunk streaming, so only same-query rows compare).
for ((name, dir) <- Seq(("natural", dirNat), ("sorted_partkey", dirSort),
    ("zorder", dirZ))) {
  val bp = bytesRead(qPart(dir))
  val bs = bytesRead(qSupp(dir))
  println(f"ZSKIP $name%15s partkey_range ${bp / 1e6}%8.2f MB  " +
    f"suppkey_range ${bs / 1e6}%8.2f MB")
}

// correctness cross-check: all three layouts agree on both query results
val rows = Seq(dirNat, dirSort, dirZ).map { d =>
  (spark.read.parquet(d).filter(col("l_partkey").between(1000, 1099))
    .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)).head.get(0),
    spark.read.parquet(d).filter(col("l_suppkey").between(100, 104))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)).head.get(0))
}
println(s"ZSKIP results_equal ${rows.distinct.size == 1} (${rows.head})")
sys.exit(0)
