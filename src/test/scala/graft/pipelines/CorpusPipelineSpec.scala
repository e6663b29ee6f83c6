package graft.pipelines

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("corpus pipeline stages shrink monotonically and compose correctly") {
    val d = graft.Tables.documents(spark, sfDir)
    val train = d.filter($"doc_id" % 50 =!= 0)
    val bench = d.filter($"doc_id" % 50 === 0)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val res = CorpusPipeline.run(train, bench, collectCounts = true)
    val c = res.counts.get

    // monotone: each stage can only remove documents
    assert(c.input >= c.quality && c.quality >= c.exactDedup &&
      c.exactDedup >= c.nearDedup && c.nearDedup >= c.decontaminated,
      c.toString)
    assert(c.decontaminated > 0, "pipeline must not empty the corpus")

    val out = res.corpus
    // output rows = decontaminated survivors; packing/splitting drop none
    assert(out.count() == c.decontaminated)
    // every survivor carries a split label and a non-negative bin
    assert(out.filter(!$"split".isin("train", "val", "test")).count() == 0)
    assert(out.filter($"bin" < 0).count() == 0)

    // no exact duplicates survive (on the normalized text the pipeline used)
    val survivorsTexts = train
      .join(out.select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("text", graft.ops.TextAnalysis.normalizeText($"text"))
    assert(Dedup.exact(survivorsTexts, "doc_id", "text").count() == out.count())

    // no survivor shares an 8-gram with the (normalized) benchmark set
    val contaminated = Dedup.contaminatedIds(
      survivorsTexts,
      bench.withColumn("text", graft.ops.TextAnalysis.normalizeText($"text")),
      "doc_id", "text", n = 8)
    assert(contaminated.join(out.select("doc_id"), Seq("doc_id"), "left_semi")
      .count() == 0)

    res.unpersist()
    // the result owns every cache the pipeline created: unpersist() must
    // leave no new persisted RDDs behind (diffed, not global — the test
    // session is shared across suites)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"pipeline leaked cached RDD ids: $leaked")
  }

  test("packOnBpe bins on real BPE counts, same survivors and plan shape") {
    val d = graft.Tables.documents(spark, sfDir).filter($"doc_id" < 200)
    val bench = d.filter($"doc_id" % 50 === 0)
    val train = d.filter($"doc_id" % 50 =!= 0)
    val ws = CorpusPipeline.run(train, bench)
    val bpe = CorpusPipeline.run(train, bench, packOnBpe = true)
    val wsOut = ws.corpus.select($"doc_id", $"n_tokens").cache()
    val bpeOut = bpe.corpus.select($"doc_id", $"n_tokens", $"text").cache()
    try {
      // identical survivor sets — the counter only affects packing
      assert(wsOut.select("doc_id").except(bpeOut.select("doc_id")).isEmpty)
      assert(bpeOut.select("doc_id").except(wsOut.select("doc_id")).isEmpty)
      // n_tokens IS the kernel's BPE count of the pipeline-normalized text
      graft.functions.GraftFunctions.ensureRegistered(spark)
      val mismatch = bpeOut.filter($"n_tokens" =!=
        graft.functions.GraftFunctions.bpeCountNative($"text"))
      assert(mismatch.isEmpty, mismatch.take(3).mkString(","))
      // BPE splits words into subwords: counts can only grow
      val joined = bpeOut.select($"doc_id", $"n_tokens".as("nb"))
        .join(wsOut.select($"doc_id", $"n_tokens".as("nw")), "doc_id")
      assert(joined.filter($"nb" < $"nw").isEmpty)
    } finally {
      wsOut.unpersist(); bpeOut.unpersist()
      ws.unpersist(); bpe.unpersist()
    }
  }
}
