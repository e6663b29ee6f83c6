package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge TRAINING (Sennrich et al. 2016)
  * — the learning half of the tokenizer whose apply side is the
  * [[graft.functions.BpeImpl]] kernel. Each round finds the corpus-wide
  * most frequent adjacent symbol pair and merges it everywhere; the
  * ranked pair list IS the merges table a production deployment drops
  * into `graft/bpe_merges.txt`, making the tokenizer end-to-end
  * self-hosted.
  *
  * Topology per round (the q124 heavy-hitter shape):
  *  - state lives as ONE row per DISTINCT word — (word, cnt, syms) —
  *    so all cost scales with VOCABULARY, not corpus size: the corpus
  *    is scanned once to build word counts and never again;
  *  - adjacent-pair counts are an explode + map-side-combined sum over
  *    the vocab table (one small shuffle per round);
  *  - the argmax pair (count desc, then "left right" string asc — the
  *    deterministic, SQL-replayable tie-break) is ONE collected row;
  *  - the merge applies as a per-row array fold (greedy left-to-right,
  *    exactly the kernel's j+=2 pass), a pure projection.
  *
  * Determinism: counts are exact integers and the tie-break is total,
  * so the learned table replays bit-for-bit in any engine — the oracle
  * unrolls the same rounds in SQL. Driver state: one (l, r, n) row per
  * round, never data-sized.
  */
object BpeTrain {

  /** One learned merge: rank (0 = first/best), the pair, and the pair's
    * occurrence count at the round it was chosen. */
  final case class Merge(rank: Int, left: String, right: String, n: Long)

  /** Whitespace-split lowercased word counts — the corpus's only scan. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right single-pair merge over a symbol array — the
    * kernel's one-pass walk as a fold: a just-merged symbol can never be
    * the LEFT of another merge in the same pass (l+r != l always), so
    * the fold's last-element check is exact. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `numMerges` ranked merges from the corpus. Stops early
    * when no adjacent pair occurs at least `minCount` times. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges=$numMerges must be >= 1")
    var state = wordCounts(docs, textCol)
      .withColumn("syms",
        transform(sequence(lit(1), length(col("word"))),
          i => substring(col("word"), i, lit(1))))
      .localCheckpoint(true)
    graft.QueryCleanup.register(() => state.unpersist())
    val out = Seq.newBuilder[Merge]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val best = state
        .select(col("cnt"), explode(when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("l"),
                element_at(col("syms"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, concat(col("l"), lit(" "), col("r")).asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getAs[Long]("n") < minCount) done = true
      else {
        val l: String = best(0).getAs[String]("l")
        val r: String = best(0).getAs[String]("r")
        val n: Long = best(0).getAs[Long]("n")
        out += Merge(k, l, r, n)
        val prev = state
        state = state.withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true)
        prev.unpersist()
        graft.QueryCleanup.register(() => state.unpersist())
        k += 1
      }
    }
    out.result()
  }

  /** [[train]] as a DataFrame — (rank, left, right, n), rank-ordered —
    * the `queries()` surface. */
  def trainDf(docs: DataFrame, textCol: String, numMerges: Int,
              minCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, numMerges, minCount)
      .map(m => (m.rank.toLong, m.left, m.right, m.n))
      .toDF("rank", "left", "right", "n")
  }

  /** Apply a LEARNED table to one word — [[graft.functions.BpeImpl]]'s
    * merge loop parameterized by the table (the train→apply round-trip
    * the spec pins). */
  def tokenizeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = merges.zipWithIndex.map { case ((l, r), i) => (l, r) -> i }.toMap
    var syms = word.map(String.valueOf(_)).toVector
    var cont = true
    while (cont && syms.length > 1) {
      val best = syms.zip(syms.tail).flatMap(p => ranks.get(p)).minOption
      best match {
        case None => cont = false
        case Some(rank) =>
          val (bl, br) = merges(rank)
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == bl && syms(j + 1) == br) {
              out += bl + br; j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
      }
    }
    syms
  }
}
