// Append-only-commit cost evidence (round 11): simulate K daily ingests of
// a B-row batch into a growing SnapshotStore corpus and compare total
// commit cost of the old full-rewrite path (`commit(current U batch)` --
// O(corpus) per ingest) against `commitAppend` (O(batch) per ingest) plus
// one terminal `compact`. The rewrite total is quadratic in K*B; the
// append total is linear -- the gap is the whole argument for the manifest
// layout at 100 TB. Results recorded in PERFORMANCE.md.
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false -i tools/append_bench.scala
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

val docs = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
  .select(monotonically_increasing_id().as("doc_id"), col("l_orderkey"),
    concat_ws("|", col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate").cast("string"), col("l_extendedprice")).as("text"))
  .cache()
val total = docs.count()
val K = 20
val B = (total / K).toInt
println(s"corpus=$total rows, $K ingests of ~$B rows")

def batch(i: Int) = docs.filter(pmod(col("l_orderkey"), lit(K)) === i)

def timed(f: => Unit): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}

// path A: full-rewrite commits (the pre-round-11 layout)
val dirA = s"/tmp/graft_appendbench_rewrite_${System.nanoTime()}"
val tA = timed {
  (0 until K).foreach { i =>
    val cur =
      if (SnapshotStore.committedVersion(spark, dirA).isEmpty) batch(i)
      else SnapshotStore.read(spark, dirA).unionByName(batch(i))
    SnapshotStore.commit(cur, dirA, s"ingest-$i")
  }
}
println(f"APPENDBENCH rewrite_total $tA%.2f s")

// path B: append-only commits + one terminal compaction
val dirB = s"/tmp/graft_appendbench_append_${System.nanoTime()}"
val tB = timed {
  (0 until K).foreach(i => SnapshotStore.commitAppend(batch(i), dirB, s"ingest-$i"))
}
val tC = timed { SnapshotStore.compact(spark, dirB) }
println(f"APPENDBENCH append_total $tB%.2f s (+ compact $tC%.2f s)")

// write amplification: total bytes ever written under each layout --
// the metric that scales (seconds at sf0.1 are fixed-overhead-bound;
// bytes grow with the data). Rewrite writes Sum_k (k*B) rows' worth of
// files across versions; append writes the corpus once plus manifests.
def bytesUnder(dir: String): Long = {
  val f = new java.io.File(dir)
  if (!f.exists) 0L
  else if (f.isFile) f.length
  else f.listFiles.map(c => bytesUnder(c.getPath)).sum
}
val bA = bytesUnder(dirA)
val bB = bytesUnder(dirB)
println(f"APPENDBENCH rewrite_bytes ${bA / 1e6}%.1f MB  append_bytes ${bB / 1e6}%.1f MB  amplification ${bA.toDouble / bB}%.2fx (K=$K; rewrite grows ~K/2-fold with K, append stays ~2x corpus incl. terminal compact)")

// same logical content either way (order-free fingerprint identity)
val fpA = graft.ops.DataQuality.fingerprint(
  SnapshotStore.read(spark, dirA), Seq("doc_id", "text")).collect()(0)
val fpB = graft.ops.DataQuality.fingerprint(
  SnapshotStore.read(spark, dirB), Seq("doc_id", "text")).collect()(0)
println(s"APPENDBENCH fingerprints_equal ${fpA == fpB}")
System.exit(0)
