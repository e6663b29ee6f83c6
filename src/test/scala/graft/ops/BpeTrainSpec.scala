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

  test("trainDf is rank-ordered with exact counts and stops early below minCount") {
    val docs = Seq("ab ab cd").toDF("text")
    // (a,b)=2 qualifies at minCount=2; (c,d)=1 does not -> exactly one row
    val df = BpeTrain.trainDf(docs, "text", numMerges = 5)
    val rows = df.as[(Long, String, String, Long)].collect().toSeq
    assert(rows == Seq((0L, "a", "b", 2L)), rows.toString)
  }
}
