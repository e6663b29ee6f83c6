package graft.ops

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the classic merges on a hand-checkable fixture") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 (the
    // Sennrich paper's worked example, sans end-of-word marker)
    val docs = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
      .toDF("text")
    val merges = BpeTrain.train(docs, "text", numMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (w,e)=8(newest)+... —
    // (e,s) and (s,t) tie at 9; "e s" < "s t" so (e,s) wins; then (es,t)=9
    assert(merges(0).left == "e" && merges(0).right == "s" && merges(0).n == 9)
    assert(merges(1).left == "es" && merges(1).right == "t" && merges(1).n == 9)
    // remaining rounds keep exact integer counts
    assert(merges.map(_.rank) == Seq(0, 1, 2, 3))
    assert(merges.forall(_.n >= 2))
  }

  test("train -> apply round-trip: learned table tokenizes the corpus it was trained on") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val merges = BpeTrain.train(docs, "text", numMerges = 6)
    val table = merges.map(m => (m.left, m.right))
    // after 6 merges the frequent words should compress well below
    // character count, and tokenization must be deterministic
    val t1 = BpeTrain.tokenizeWord("newest", table)
    assert(t1 == BpeTrain.tokenizeWord("newest", table))
    assert(t1.length < "newest".length, t1.toString)
    assert(t1.mkString == "newest", "symbols must concatenate back to the word")
    // unseen characters never merge
    assert(BpeTrain.tokenizeWord("zq9", table) == Seq("z", "q", "9"))
  }

  test("the fold merge pass equals the kernel's left-to-right walk on adjacent runs") {
    // 'aaa': greedy left-to-right of pair (a,a) must give [aa, a], and
    // 'aaaa' -> [aa, aa] — the overlap semantics q89's oracle pins
    val docs = Seq("aaa aaa aaa").toDF("text")
    val merges = BpeTrain.train(docs, "text", numMerges = 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    assert(merges.head.n == 6, s"overlapping occurrences count: ${merges.head}")
    assert(BpeTrain.tokenizeWord("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(BpeTrain.tokenizeWord("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
  }

  test("batched training replays the sequential merge order bit-for-bit") {
    // fixtures chosen to exercise both safeBatch exclusion reasons:
    // symbol conflicts ((e,s) vs (s,t)), count ties at the batch
    // boundary, chains where a merge CREATES the next winner ("xab":
    // merging (a,b) makes (x,ab) the new top pair), and disjoint
    // families that genuinely batch
    val fixtures = Seq(
      (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "),
      Seq.fill(7)("xab").mkString(" "), // new-pair chain: (a,b) then (x,ab)
      (Seq.fill(9)("xab") ++ Seq.fill(5)("cd")).mkString(" "), // chain + disjoint
      (Seq.fill(6)("ab") ++ Seq.fill(6)("cd") ++ Seq.fill(6)("ef")).mkString(" "), // 3-way tie
      (Seq.fill(8)("ab") ++ Seq.fill(6)("cd") ++ Seq.fill(4)("ef") ++
        Seq.fill(3)("abcd")).mkString(" "), // strict ladder, genuine batch
      "aaa aaa bbb ccc abc abc abc") // self-pairs + overlaps
    fixtures.zipWithIndex.foreach { case (text, i) =>
      val docs = Seq(text).toDF("text")
      val seqMerges = BpeTrain.train(docs, "text", numMerges = 6,
        minCount = 2L, checkpointEvery = 1, batchWindow = 1)
      val batMerges = BpeTrain.train(docs, "text", numMerges = 6)
      assert(batMerges == seqMerges,
        s"fixture $i: batched $batMerges != sequential $seqMerges")
    }
  }

  test("safeBatch: conflict stop, concat collision, tie trim, singleton floor") {
    // disjoint strict ladder: all three batch
    assert(BpeTrain.safeBatch(
      Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L)), 3L).size == 3)
    // symbol conflict at #2 stops the prefix there
    assert(BpeTrain.safeBatch(
      Seq(("a", "b", 9L), ("b", "c", 8L), ("e", "f", 5L)), 3L) ==
      Seq(("a", "b", 9L)))
    // a member whose symbol equals an earlier CONCAT conflicts
    assert(BpeTrain.safeBatch(
      Seq(("a", "b", 9L), ("ab", "c", 7L)), 3L) == Seq(("a", "b", 9L)))
    // in-batch ties are fine (sorted order IS the sequential tie-break);
    // only a tie with an EXCLUDED pair trims
    assert(BpeTrain.safeBatch(
      Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 7L)), 3L)
      == Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 7L)))
    // tie with the NEXT-beyond-window count trims down to the gap
    assert(BpeTrain.safeBatch(
      Seq(("a", "b", 9L), ("c", "d", 7L)), 7L) == Seq(("a", "b", 9L)))
    // argmax alone survives even when it ties the boundary
    assert(BpeTrain.safeBatch(Seq(("a", "b", 9L)), 9L) == Seq(("a", "b", 9L)))
    // nothing excluded anywhere (nextN = -1): whole disjoint set batches
    assert(BpeTrain.safeBatch(
      Seq(("a", "b", 9L), ("c", "d", 9L)), -1L).size == 2)
  }

  test("trainDf is rank-ordered with exact counts and stops early below minCount") {
    val docs = Seq("ab ab cd").toDF("text")
    // (a,b)=2 qualifies at minCount=2; (c,d)=1 does not -> exactly one row
    val df = BpeTrain.trainDf(docs, "text", numMerges = 5)
    val rows = df.as[(Long, String, String, Long)].collect().toSeq
    assert(rows == Seq((0L, "a", "b", 2L)), rows.toString)
  }
}
