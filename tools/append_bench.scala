// Append-only-commit cost evidence (round 11): simulate K daily ingests of
// a B-row batch into a growing SnapshotStore corpus and compare total
// commit cost of the old full-rewrite path (`commit(current ∪ batch)` —
// O(corpus) per ingest) against `commitAppend` (O(batch) per ingest) plus
// one terminal `compact`. The rewrite total is quadratic in K·B; the
// append total is linear — the gap is the whole argument for the manifest
// layout at 100 TB. Results recorded in PERFORMANCE.md.
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false -i tools/append_bench.scala
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  .select("doc_id", "text", "lang", "source").cache()
val total = docs.count()
val K = 20
val B = (total / K).toInt
println(s"corpus=$total rows, $K ingests of ~$B rows")

def batch(i: Int) = docs.filter(pmod(col("doc_id"), lit(K)) === i)

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

// same logical content either way (order-free fingerprint identity)
val fpA = graft.ops.DataQuality.fingerprint(
  SnapshotStore.read(spark, dirA), Seq("doc_id", "text")).collect()(0)
val fpB = graft.ops.DataQuality.fingerprint(
  SnapshotStore.read(spark, dirB), Seq("doc_id", "text")).collect()(0)
println(s"APPENDBENCH fingerprints_equal ${fpA == fpB}")
System.exit(0)
