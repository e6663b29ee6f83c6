package graft.pipelines

import graft.ops.{Dedup, Packing, Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full training-corpus preparation pipeline, composed from the
  * engine's operators in the order a production run executes them:
  *
  *  1. normalize   — unicode NFC + cleanup (so dedup sees one byte form)
  *  2. quality     — C4/Gopher rule filter (cheap per-row predicates first)
  *  3. exact dedup — min-id survivor per 128-bit content hash
  *  4. near dedup  — MinHash+LSH pairs → connected components → keep the
  *                   cluster-canonical (min-id) doc
  *  5. decontam    — drop docs sharing an n-gram with the benchmark set
  *  6. split       — deterministic hash train/val/test labels
  *  7. pack        — ~budget-token bins per source shard
  *
  * Stage order is cost-ordered: per-row predicates run before the
  * shuffling dedup stages, near-dup runs on the exact-deduped survivor
  * set, and decontamination's broadcast semi-join runs on the already-
  * shrunk corpus. Every stage is the exact operator its own oracle query
  * verifies (q87, q72, q34, q36/q76, q77, q74, q75) — the pipeline adds
  * composition, not new semantics.
  *
  * Returns the packed corpus plus per-stage surviving-row counts (the
  * run report a pipeline owner actually monitors). Counting forces each
  * cached stage once; the per-stage DataFrames are cached only while
  * counted, and the returned corpus is left cached for the caller.
  */
final case class CorpusStageCounts(input: Long, normalized: Long,
                                   quality: Long, exactDedup: Long,
                                   nearDedup: Long, decontaminated: Long)

final case class CorpusResult(corpus: DataFrame, counts: CorpusStageCounts)

object CorpusPipeline {

  def run(docs: DataFrame, bench: DataFrame, idCol: String = "doc_id",
          textCol: String = "text", shardCol: String = "source",
          minTokens: Int = 5, shingleN: Int = 2, nearDupThreshold: Double = 0.8,
          decontamN: Int = 8, tokenBudget: Int = 512,
          splitWeights: Seq[(String, Double)] =
            Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): CorpusResult = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val inputN = docs.count()

    // 1-2: per-row stages, no shuffle
    val normalized = docs.withColumn(textCol, TextAnalysis.normalizeText(col(textCol)))
    val quality = TextAnalysis.corpusFilter(normalized, textCol,
      minTokens = minTokens, maxTokens = 100000,
      minMeanTokLen = 1.0, maxMeanTokLen = 20.0,
      maxPunctRatio = 0.5, minStopwordRatio = 0.0).cache()
    val qualityN = quality.count()

    // 3: exact dedup (content-hash argmin), keep full rows via semi-join
    val exact = quality.join(
      Dedup.exact(quality, idCol, textCol), Seq(idCol), "left_semi").cache()
    val exactN = exact.count()

    // 4: near-dup canonicalization — LSH pairs, CC labels, keep min-id
    val pairs = Dedup.minhashLsh(exact, idCol, textCol, shingleN, nearDupThreshold)
    val clusters = Dedup.dedupClusters(pairs)
    val losers = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    val near = exact.join(losers, Seq(idCol), "left_anti").cache()
    val nearN = near.count()
    exact.unpersist()

    // 5: benchmark decontamination — bench normalized the same way so
    // n-gram collision happens in the same canonical text space
    val benchNorm = bench.withColumn(textCol, TextAnalysis.normalizeText(col(textCol)))
    val clean = Dedup.decontaminate(near, benchNorm, idCol, textCol, decontamN).cache()
    val cleanN = clean.count()
    near.unpersist()
    quality.unpersist()

    // 6-7: split labels + sequence packing
    val split = Sampling.hashSplit(clean, idCol, splitWeights)
    val packed = Packing.packSequences(
      split.withColumn("__nt", TextAnalysis.tokenCount(col(textCol)).cast("long")),
      idCol, "__nt", shardCol, tokenBudget)
      .withColumnRenamed("__nt", "n_tokens")

    CorpusResult(packed.cache(),
      CorpusStageCounts(inputN, inputN, qualityN, exactN, nearN, cleanN))
  }
}
