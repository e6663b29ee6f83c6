package graft.streaming

import graft.SparkSpec
import graft.pipelines.NearDupIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

// Top-level for encoder derivation (same rationale as Doc in StreamDedupSpec).
case class NdDoc(doc_id: Long, text: String)

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val ShingleN = 2
  private val Threshold = 0.5

  private val corpus = Seq(
    NdDoc(1L, "the quick brown fox jumps over the lazy dog tonight and then it ran far away home"),
    NdDoc(2L, "pack my box with five dozen liquor jugs right now"))

  // near-dup of doc 1 (last word changed), plus fresh docs
  private val wave1 = Seq(
    NdDoc(21L, "the quick brown fox jumps over the lazy dog tonight and then it ran far away barn"),
    NdDoc(22L, "how vexingly quick daft zebras jump in the fog"))
  // near-dup of wave-1's ACCEPTED doc 22, plus a fresh doc
  private val wave2 = Seq(
    NdDoc(31L, "how vexingly quick daft zebras jump in the fog bank"),
    NdDoc(32L, "sphinx of black quartz judge my vow this evening ok"))

  test("stream probe+absorb equals the sequential batch ingest across a micro-batch split") {
    implicit val sq = spark.sqlContext
    val base = s"/tmp/graft_streamnd_${System.nanoTime()}"
    val idxStream = s"$base/idx_stream"
    val idxBatch = s"$base/idx_batch"
    val outDir = s"$base/out"

    // both paths start from the same seeded corpus index
    NearDupIndex.update(spark, idxStream, corpus.toDF(), "doc_id", "text", ShingleN, "seed")
    NearDupIndex.update(spark, idxBatch, corpus.toDF(), "doc_id", "text", ShingleN, "seed")

    // STREAM path: two micro-batches through foreachBatch
    val mem = MemoryStream[NdDoc]
    val q = StreamNearDup.start(mem.toDF(), idxStream, outDir,
      s"$base/ckpt", "doc_id", "text", ShingleN, Threshold)
    try {
      mem.addData(wave1: _*)
      q.processAllAvailable()
      mem.addData(wave2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(outDir)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet

    // BATCH twin: the exact query+update sequence per wave
    def ingest(wave: Seq[NdDoc]): Set[(Long, Long, Double)] = {
      val batch = wave.toDF()
      val matches = NearDupIndex.query(spark, idxBatch, batch, "doc_id", "text",
          ShingleN, Threshold)
        .join(batch.select(col("doc_id").as("id_a")), Seq("id_a"), "left_anti")
      val got = matches.select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val kept = batch.join(
        matches.select(col("id_b").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      NearDupIndex.update(spark, idxBatch, kept, "doc_id", "text", ShingleN, "wave")
      got
    }
    val batched = ingest(wave1) ++ ingest(wave2)

    assert(streamed == batched, s"stream=$streamed batch=$batched")
    // the probe caught the seeded-corpus dup in wave 1 AND the
    // cross-micro-batch dup in wave 2 (31 matches 22, absorbed by batch 1)
    assert(streamed.map(p => (p._1, p._2)) == Set((1L, 21L), (22L, 31L)), streamed.toString)
    // indexes converge to the same membership: corpus + accepted docs
    val streamIds = NearDupIndex.read(spark, idxStream).select("id").as[Long].collect().toSet
    val batchIds = NearDupIndex.read(spark, idxBatch).select("id").as[Long].collect().toSet
    assert(streamIds == batchIds && streamIds == Set(1L, 2L, 22L, 32L), streamIds.toString)
  }

  test("empty index: first micro-batch seeds, emits nothing, second probes it") {
    implicit val sq = spark.sqlContext
    val base = s"/tmp/graft_streamnd_empty_${System.nanoTime()}"
    val mem = MemoryStream[NdDoc]
    val q = StreamNearDup.start(mem.toDF(), s"$base/idx", s"$base/out",
      s"$base/ckpt", "doc_id", "text", ShingleN, Threshold)
    try {
      mem.addData(corpus: _*)
      q.processAllAvailable()
      mem.addData(wave1.head) // near-dup of doc 1, now indexed
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.read.parquet(s"$base/out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 21L)), pairs.toString)
  }
}
