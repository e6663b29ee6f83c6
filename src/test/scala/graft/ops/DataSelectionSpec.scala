package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-13 data-selection operators: Kneser–Ney LM
  * scoring, DSIR importance weights, boilerplate-line removal, per-domain
  * token quotas, and snake sharding. Each test checks the Spark result
  * against an independent plain-Scala reference computation (same
  * micro-nat / HALF_UP rounding protocol), not against the operator's own
  * arithmetic.
  */
class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  // Spark's round() goes through BigDecimal.valueOf (the double's
  // SHORTEST decimal representation), not the exact binary expansion —
  // the reference must round the same way or it disagrees by 1e-6 on
  // representation-boundary values.
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def microNat(x: Double): Long =
    java.math.BigDecimal.valueOf(math.log(x) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Plain-Scala interpolated KN (D = 3/4) mean log-prob per doc. */
  private def knReference(docs: Seq[(Long, String)]): Map[Long, Double] = {
    val docBg: Seq[((Long, String), Long)] = docs.flatMap { case (id, t) =>
      val tk = t.trim.toLowerCase.split("\\s+").toSeq
      if (tk.size < 2) Nil
      else tk.sliding(2).map(p => (id, p.mkString(" "))).toSeq
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSeq
    val c = docBg.groupBy(_._1._2).map { case (g, v) => (g, v.map(_._2).sum) }
    def w1(g: String) = g.split(" ")(0)
    def w2(g: String) = g.split(" ")(1)
    val ctx = c.toSeq.groupBy(x => w1(x._1)).map { case (w, v) => (w, v.map(_._2).sum) }
    val n1f = c.toSeq.groupBy(x => w1(x._1)).map { case (w, v) => (w, v.size.toLong) }
    val cont = c.toSeq.groupBy(x => w2(x._1)).map { case (w, v) => (w, v.size.toLong) }
    val t = c.size.toLong
    val lpu = c.map { case (g, cc) =>
      val num = (4 * cc - 3) * t + 3 * n1f(w1(g)) * cont(w2(g))
      val den = 4L * ctx(w1(g)) * t
      g -> microNat(num.toDouble / den)
    }
    docBg.groupBy(_._1._1).map { case (id, v) =>
      val s = v.map(x => x._2 * lpu(x._1._2)).sum
      val n = v.map(_._2).sum
      id -> round6(s.toDouble / n / 1e6)
    }
  }

  test("kneserNeyLogProb matches the plain-Scala reference") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the hat"),
      (3L, "a dog sat on a log"),
      (4L, "the dog ate the cat"))
    val got = TextAnalysis
      .kneserNeyLogProb(docs.toDF("doc_id", "text"), "doc_id")
      .as[(Long, Double)].collect().toMap
    val want = knReference(docs)
    assert(got == want)
    assert(got.values.forall(_ < 0.0)) // smoothed probs < 1 on this corpus
  }

  test("kneserNeyLogProb: a self-repeating doc scores exactly 0") {
    // "a a a" alone: one bigram type, c=ctx=2, n1f=cont=T=1 -> p = 1.
    val got = TextAnalysis
      .kneserNeyLogProb(Seq((7L, "a a a")).toDF("doc_id", "text"), "doc_id")
      .as[(Long, Double)].collect().toMap
    assert(got == Map(7L -> 0.0))
    // docs with < 2 tokens are unscored, not crashed
    val short = TextAnalysis.kneserNeyLogProb(
      Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text"), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(short == Set(3L))
  }

  test("importanceScores matches the plain-Scala reference and ranks target-like docs high") {
    val docs = Seq(
      (1L, true, "alpha alpha beta"),
      (2L, true, "alpha gamma gamma"),
      (3L, false, "delta delta epsilon"),
      (4L, false, "alpha alpha alpha"), // raw doc that looks like target
      (5L, false, "delta epsilon zeta"))
    val got = TextAnalysis.importanceScores(
        docs.toDF("doc_id", "tgt", "text"), "doc_id", col("tgt"))
      .as[(Long, Double)].collect().toMap

    // reference: add-one-smoothed unigram likelihood ratio, micro-nats
    val toks = docs.flatMap { case (id, tgt, t) =>
      t.split(" ").map(w => (id, tgt, w)) }
    val cr = toks.groupBy(_._3).map { case (w, v) => (w, v.size.toLong) }
    val ct = toks.filter(_._2).groupBy(_._3)
      .map { case (w, v) => (w, v.size.toLong) }.withDefaultValue(0L)
    val (tr, tt, nv) = (toks.size.toLong, toks.count(_._2).toLong, cr.size.toLong)
    val lpu = cr.keys.map { w =>
      val d = (math.log((ct(w) + 1).toDouble / (tt + nv))
        - math.log((cr(w) + 1).toDouble / (tr + nv))) * 1e6
      w -> java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }.toMap
    val want = toks.groupBy(_._1).map { case (id, v) =>
      id -> round6(v.map(x => lpu(x._3)).sum / 1e6) }
    assert(got == want)
    // the target-vocabulary doc outranks the off-target docs
    assert(got(4L) > got(3L) && got(4L) > got(5L))
  }

  test("stripBoilerplate drops every copy of frequent lines, keeps order, counts drops") {
    val footer = "subscribe to our newsletter"
    val docs = (1L to 5L).map { i =>
      (i, s"body line $i\n$footer\ntail $i")
    } :+ (6L, s"$footer\n$footer") // doc that is ALL boilerplate
    val got = TextAnalysis.stripBoilerplate(
        docs.toDF("doc_id", "text"), "doc_id", minDocFreq = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (1L to 5L).foreach { i =>
      assert(got(i) == ((s"body line $i\ntail $i", 1L)))
    }
    assert(got(6L) == (("", 2L))) // both copies dropped, empty doc remains
  }

  test("domainTokenQuota keeps exactly the in-budget hash-order prefix per domain") {
    val rows = (1L to 40L).map { i =>
      (i, if (i % 2 == 0) "even" else "odd", 10L + (i % 7))
    }
    val df = rows.toDF("doc_id", "dom", "n_tokens").repartition(5)
    val got = Sampling.domainTokenQuota(df, "doc_id", "dom", "n_tokens",
        budget = 60L, salt = "s13")
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap

    // reference: portable 60-bit md5 prefix hash of "s13|id"
    def phash(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s13|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = rows.groupBy(_._2).values.flatMap { dom =>
      val ordered = dom.sortBy(r => (phash(r._1), r._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).takeWhile(_._2 <= 60L).map { case (r, c) => r._1 -> c }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty && want.values.max <= 60L)
  }

  test("oovRate scores occurrences outside the deterministic top-k vocab") {
    // counts: x=4, y=3, z=2, q=1 -> top-2 vocab {x, y}
    val docs = Seq(
      (1L, "x x y z"),   // 1 of 4 occurrences OOV
      (2L, "x y z q"),   // 2 of 4
      (3L, "x x y y"))   // 0 of 4
    val got = TextAnalysis.oovRate(docs.toDF("doc_id", "text"), "doc_id", 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((4L, 0.25)), 2L -> ((4L, 0.5)), 3L -> ((4L, 0.0))))
    // tie at the cut breaks token-ascending: with k=3, z (2) beats q (1);
    // under a z/q tie ('x x y z' -> z=2... make one: add a q doc)
    val tied = Seq((1L, "x x y y z q"))
    val r = TextAnalysis.oovRate(tied.toDF("doc_id", "text"), "doc_id", 3)
      .as[(Long, Long, Double)].collect().head
    // counts x=2,y=2,z=1,q=1: top-3 = x,y,q (token-asc tie) -> z is OOV
    assert(r == ((1L, 6L, round6(1.0 / 6))))
  }

  test("dupNgramShare reports repeated-gram mass; short docs unscored") {
    val docs = Seq(
      (1L, "a b a b a"),   // bigrams: ab,ba,ab,ba -> all repeated -> 1.0
      (2L, "a b c d"),     // all distinct -> 0.0
      (3L, "a b a c"),     // ab,ba,ac -> none repeated -> 0.0
      (4L, "solo"))        // < 2 tokens -> unscored
    val got = TextAnalysis.dupNgramShare(docs.toDF("doc_id", "text"), "doc_id", 2)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0))
    // trigrams on doc 1: aba,bab,aba -> 2 of 3 occurrences repeated
    val tri = TextAnalysis.dupNgramShare(docs.toDF("doc_id", "text"), "doc_id", 3)
      .as[(Long, Double)].collect().toMap
    assert(tri(1L) == round6(2.0 / 3))
  }

  test("templateDedup groups digit-run variants, drops singleton classes") {
    val docs = Seq(
      (1L, "order 123 shipped to bay 7"),
      (2L, "order 99 shipped to bay 12"),  // same template as 1
      (3L, "order 123 returned"),           // singleton
      (4L, "no digits here"),
      (5L, "no digits here"))               // exact dup of 4 groups too
    val got = Dedup.templateDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((1L, 2L)), 2L -> ((1L, 2L)),
      4L -> ((4L, 2L)), 5L -> ((4L, 2L))))
  }

  test("vocabCoverage: types needed for mass targets, frequency-desc order") {
    // occurrences: a=5, b=3, c=1, d=1 (total 10)
    val docs = Seq((1L, "a a a b b"), (2L, "a a b c d")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, Seq(0.5, 0.8, 1.0))
      .as[(Double, Long)].collect().toMap
    // cum: a->5, b->8, c->9, d->10
    // p=0.5: 5 >= 5 -> 1 type; p=0.8: 8 >= 8 -> 2; p=1.0: all 4
    assert(got == Map(0.5 -> 1L, 0.8 -> 2L, 1.0 -> 4L), got.toString)
  }

  test("snakeShards balances token totals and matches the hand snake") {
    val rows = (1L to 32L).map(i => (i, 100L - i)) // distinct token counts
    val got = Sampling.snakeShards(rows.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", nShards = 4)
      .select("doc_id", "rank", "shard").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // rank = (tokens desc, id asc) position; snake = alternate direction
    val want = rows.sortBy(r => (-r._2, r._1)).zipWithIndex.map {
      case ((id, _), r) =>
        val pos = r % 4
        id -> ((r.toLong, if ((r / 4) % 2 == 0) pos.toLong else (3 - pos).toLong))
    }.toMap
    assert(got == want)
    // 32 docs with counts 68..99 snake-dealt over 4 shards: totals within 4
    val totals = rows.map { case (id, n) => (got(id)._2, n) }
      .groupBy(_._1).values.map(_.map(_._2).sum)
    assert(totals.max - totals.min <= 4)
  }
}
