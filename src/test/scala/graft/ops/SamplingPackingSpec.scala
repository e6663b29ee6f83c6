package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 2000L).map(i => (i, if (i % 4 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("hashSample is deterministic, partition-independent, and proportional") {
    val a = Sampling.hashSample(keys, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(keys.repartition(13), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b, "membership must not depend on partitioning")
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.04, s"kept ${a.size}/2000")
    // a larger fraction with the same salt is a superset (bucket < cut)
    val c = Sampling.hashSample(keys, "id", 0.5).select("id").as[Long].collect().toSet
    assert(a.subsetOf(c))
  }

  test("stratifiedHashSample applies per-stratum fractions with default") {
    val got = Sampling.stratifiedHashSample(keys, "id", "lang",
      fractions = Map("en" -> 0.8), defaultFraction = 0.1)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("en") / 500.0 - 0.8) < 0.08, got.toString)
    assert(math.abs(got("de") / 1500.0 - 0.1) < 0.05, got.toString)
  }

  test("hashSplit labels every row with stable proportions") {
    val split = Sampling.hashSplit(keys, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 2000L)
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.04, counts.toString)
    // deterministic under repartitioning
    val again = Sampling.hashSplit(keys.repartition(7), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    val first = split.select("id", "split").as[(Long, String)].collect().toMap
    assert(first == again)
  }

  test("hashSplit rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(keys, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("temperatureSample at alpha=1 degenerates to plain hash sampling") {
    // q_l = p_l at alpha 1, so every stratum's rate is targetFraction and
    // membership reduces to hashSample under the same salt.
    val t = Sampling.temperatureSample(keys, "id", "lang", alpha = 1.0,
      targetFraction = 0.3).select("id").as[Long].collect().toSet
    val h = Sampling.hashSample(keys, "id", 0.3, salt = "graft-temp")
      .select("id").as[Long].collect().toSet
    assert(t == h)
  }

  test("temperatureSample up-weights the rare stratum and caps rates at 1") {
    // 1500 de / 500 en. alpha=.5: q_de = sqrt(3)/(sqrt(3)+1) ≈ .634.
    // f=.4 → rate_de = .4*2000*.634/1500 ≈ .338, rate_en = .4*2000*.366/500
    // ≈ .586 — the rare stratum keeps a ~1.7x higher fraction.
    val skewed = (1L to 2000L).map(i => (i, if (i <= 1500) "de" else "en"))
      .toDF("id", "lang")
    val kept = Sampling.temperatureSample(skewed, "id", "lang", alpha = 0.5,
      targetFraction = 0.4)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val rDe = byLang("de") / 1500.0
    val rEn = byLang("en") / 500.0
    assert(rEn > rDe, s"rare stratum rate $rEn must exceed dominant $rDe")
    assert(math.abs(rDe - 0.338) < 0.05 && math.abs(rEn - 0.586) < 0.08)
    // f=.9 pushes the rare stratum's raw rate past 1 → capped: ALL en kept
    val capped = Sampling.temperatureSample(skewed, "id", "lang", alpha = 0.5,
      targetFraction = 0.9)
    assert(capped.filter($"lang" === "en").count() == 500L)
  }

  test("temperatureSample is deterministic and partition-independent") {
    val a = Sampling.temperatureSample(keys, "id", "lang", 0.5, 0.5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(keys.repartition(17), "id", "lang", 0.5, 0.5)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("weightedSample draws k without replacement, weight-proportionally, deterministically") {
    val weighted = keys.withColumn("w",
      when(col("id") <= 100, 1000.0).otherwise(1.0)) // 100 heavy keys
    val got = Sampling.weightedSample(weighted, "id", "w", k = 120)
      .select("id").as[Long].collect().toSet
    assert(got.size == 120)
    // heavy keys are ~1000x likelier: with 100 heavy among 2000 and
    // k=120, essentially all heavy keys must be drawn
    assert((1L to 100L).count(got) >= 95, s"only ${(1L to 100L).count(got)} heavy keys drawn")
    // deterministic and partition-independent
    val again = Sampling.weightedSample(weighted.repartition(11), "id", "w", k = 120)
      .select("id").as[Long].collect().toSet
    assert(got == again)
    // plan must be a partial top-k (TakeOrderedAndProject), not a global sort
    val plan = Sampling.weightedSample(weighted, "id", "w", k = 120)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("weightedSample: zero AND negative weights never win") {
    // w < 0 is the trap: u^(1/w) > 1 for u in (0,1), so without the
    // explicit guard negative-weight rows would outrank EVERY positive
    // one. 150 poisoned rows vs k=100: one leak is a test failure.
    val weighted = keys.withColumn("w",
      when(col("id") <= 100, -5.0)
        .when(col("id") <= 150, 0.0)
        .otherwise(1.0))
    val got = Sampling.weightedSample(weighted, "id", "w", k = 100)
      .select("id").as[Long].collect().toSet
    assert(got.size == 100)
    assert(got.forall(_ > 150), s"non-positive-weight ids drawn: ${got.filter(_ <= 150)}")
    val strat = Sampling.weightedSampleStratified(weighted, "id", "w", "lang", k = 50)
      .select("id").as[Long].collect().toSet
    assert(strat.forall(_ > 150), s"non-positive-weight ids drawn: ${strat.filter(_ <= 150)}")
  }

  test("weightedSampleStratified keeps k per stratum and agrees with the global ranking") {
    val weighted = keys.withColumn("w", lit(1.0) + (col("id") % 7))
    val got = Sampling.weightedSampleStratified(weighted, "id", "w", "lang", k = 30)
      .select("lang", "id").as[(String, Long)].collect()
    val perLang = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang == Map("en" -> 30, "de" -> 30), perLang.toString)
    // stratified with one stratum == global top-k over that stratum
    val en = weighted.filter(col("lang") === "en")
    val viaGlobal = Sampling.weightedSample(en, "id", "w", k = 30)
      .select("id").as[Long].collect().toSet
    val viaStrat = Sampling.weightedSampleStratified(en, "id", "w", "lang", k = 30)
      .select("id").as[Long].collect().toSet
    assert(viaGlobal == viaStrat)
  }

  test("packSequences bins by exclusive prefix sum within each shard") {
    val docs = Seq(
      (1L, "s1", 300L), (2L, "s1", 300L), (3L, "s1", 300L),
      (4L, "s2", 600L), (5L, "s2", 100L)
    ).toDF("id", "shard", "nt")
    val got = Packing.packSequences(docs, "id", "nt", "shard", budget = 512)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    // s1: exclusive cumsum 0,300,600 -> bins 0,0,1
    assert(got(1L) == 0L && got(2L) == 0L && got(3L) == 1L)
    // s2: 0,600 -> bins 0,1 (first doc overflows its bin; never split)
    assert(got(4L) == 0L && got(5L) == 1L)
  }

  test("mixtureRebalance hits exact floor quotas and is partitioning-independent") {
    val docs = (0L until 600L).map { i =>
      (i, if (i % 6 < 3) "web" else if (i % 6 < 5) "wiki" else "books")
    }.toDF("id", "dom") // web 300, wiki 200, books 100
    val w = Map("web" -> 500, "wiki" -> 300, "books" -> 200)
    // size = min(300*1000 div 500, 200*1000 div 300, 100*1000 div 200)
    //      = min(600, 666, 500) = 500 -> quotas web 250, wiki 150, books 100
    val out = Sampling.mixtureRebalance(docs, "dom", "id", w)
    val byDom = out.groupBy("dom").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(byDom == Map("web" -> 250L, "wiki" -> 150L, "books" -> 100L))
    // subset, no duplicates
    assert(out.select("id").distinct().count() == 500)
    assert(out.join(docs, Seq("id", "dom"), "left_anti").count() == 0)
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.mixtureRebalance(docs.repartition(11), "dom", "id", w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("mixtureRebalance: a missing weighted domain caps the corpus at empty") {
    val docs = Seq((1L, "web"), (2L, "web")).toDF("id", "dom")
    val out = Sampling.mixtureRebalance(docs, "dom", "id",
      Map("web" -> 500, "wiki" -> 500))
    assert(out.count() == 0)
  }

  test("mixtureRebalance validates weights") {
    val docs = Seq((1L, "web")).toDF("id", "dom")
    intercept[IllegalArgumentException] {
      Sampling.mixtureRebalance(docs, "dom", "id", Map("web" -> 999))
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureRebalance(docs, "dom", "id", Map("web" -> 1001, "wiki" -> -1))
    }
  }

  test("shardAssign is a deterministic, partition-independent permutation") {
    val docs = (1L to 500L).toDF("id")
    val a = Sampling.shardAssign(docs, "id", 8)
      .select("shard", "pos", "id").as[(Long, Long, Long)].collect().toSet
    val b = Sampling.shardAssign(docs.repartition(11), "id", 8)
      .select("shard", "pos", "id").as[(Long, Long, Long)].collect().toSet
    assert(a == b)
    // every row exactly once; shards in range; per-shard positions gap-free
    assert(a.size == 500 && a.map(_._3).size == 500)
    assert(a.forall { case (s, _, _) => s >= 0 && s < 8 })
    a.groupBy(_._1).foreach { case (_, rows) =>
      val ps = rows.map(_._2)
      assert(ps == (1L to ps.size).toSet)
    }
    intercept[IllegalArgumentException] { Sampling.shardAssign(docs, "id", 0) }
  }

  test("shuffleOrder is an exact permutation with consistent shard/offset") {
    val df = (1L to 300L).toDF("id")
    val out = Sampling.shuffleOrder(df, "id", shardSize = 32L)
      .select("id", "global_pos", "shard", "offset")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 300)
    assert(out.map(_._2).sorted.toSeq == (1L to 300L))
    out.foreach { case (_, g, s, o) =>
      assert(s == (g - 1) / 32 && o == (g - 1) % 32, s"($g, $s, $o)")
    }
    // deterministic under repartitioning
    val again = Sampling.shuffleOrder(df.repartition(7), "id", shardSize = 32L)
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(out.forall { case (id, g, _, _) => again(id) == g })
    // a different salt draws a different permutation
    val other = Sampling.shuffleOrder(df, "id", 32L, salt = "epoch-2")
      .select("id", "global_pos").as[(Long, Long)].collect().toMap
    assert(out.exists { case (id, g, _, _) => other(id) != g })
  }

  test("negativeSample: never emits a positive, deterministic, bounded per anchor") {
    val universe = (1L to 100L).toDF("item")
    // anchor 7 has observed items 1..30; anchor 8 has none
    val pos = (1L to 30L).map(i => (7L, i)).toDF("a", "item")
      .unionAll(Seq((8L, 999L)).toDF("a", "item")) // 999 outside universe
    val r = Sampling.negativeSample(pos, "a", "item", universe, "item", k = 5)
      .as[(Long, Long)].collect()
    val byAnchor = r.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byAnchor.keySet == Set(7L, 8L))
    assert(byAnchor(7L).forall(i => i > 30L && i <= 100L), byAnchor(7L).toString)
    assert(byAnchor.values.forall(s => s.nonEmpty && s.size <= 5))
    // pure function of keys: identical under repartitioning
    val again = Sampling.negativeSample(pos.repartition(5), "a", "item",
      universe.repartition(3), "item", k = 5).as[(Long, Long)].collect()
    assert(r.sorted.toSeq == again.sorted.toSeq)
  }

  test("kFoldAssign: folds in range, deterministic, partition-independent") {
    val df = (1L to 200L).toDF("id")
    val f1 = Sampling.kFoldAssign(df, "id", k = 5)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    assert(f1.values.forall(f => f >= 0 && f < 5))
    assert(f1.values.toSet.size == 5) // every fold hit at n = 200
    val f2 = Sampling.kFoldAssign(df.repartition(7), "id", k = 5)
      .select("id", "fold").as[(Long, Long)].collect().toMap
    assert(f1 == f2)
    intercept[IllegalArgumentException] {
      Sampling.kFoldAssign(df, "id", k = 1)
    }
  }

  test("packingStats: hand bins — fill, underfull share, waste") {
    import spark.implicits._
    // budget 10, tokens [6,6,6] in one shard -> bins [0,0,1]:
    // bin0 holds 12 (overflow, waste 0), bin1 holds 6 (underfull, waste 4)
    val df = Seq((1L, 6L, "s"), (2L, 6L, "s"), (3L, 6L, "s"))
      .toDF("id", "nt", "shard")
    val packed = Packing.packSequences(df, "id", "nt", "shard", budget = 10)
    val r = Packing.packingStats(packed, "shard", "nt", budget = 10)
      .select("shard", "n_bins", "n_docs", "mean_fill", "underfull_share",
        "waste_share")
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(r == (("s", 2L, 3L, 0.9, 0.5, 0.2)), r.toString)
  }

  test("neymanAllocation: largest-remainder seats, stratum cap, zero-sd stratum") {
    // C and D identical (n=2, sd=sqrt(50)): budget 3 -> quotas 1+1, the
    // leftover seat goes to C (remainder tie, stratum-asc)
    val cd = Seq(("C", 0.0), ("C", 10.0), ("D", 0.0), ("D", 10.0))
      .toDF("h", "v")
    val got = Sampling.neymanAllocation(cd, "h", "v", budget = 3)
      .orderBy("h").select("h", "n_rows", "sd", "n_alloc")
      .as[(String, Long, Double, Long)].collect()
    assert(got.toSeq == Seq(("C", 2L, 7.071068, 2L), ("D", 2L, 7.071068, 1L)),
      got.mkString(", "))
    // a zero-variance stratum gets nothing; the variable one is capped
    // at its own size even when the budget exceeds it
    val ab = Seq(("A", 0.0), ("A", 10.0), ("B", 5.0), ("B", 5.0), ("B", 5.0))
      .toDF("h", "v")
    val got2 = Sampling.neymanAllocation(ab, "h", "v", budget = 5)
      .orderBy("h").select("h", "n_alloc").as[(String, Long)].collect()
    assert(got2.toSeq == Seq(("A", 2L), ("B", 0L)), got2.mkString(", "))
    // a single-row stratum stays IN the report (sd null, n_alloc 0)
    // instead of silently vanishing; an all-degenerate table (every
    // stratum n=1 or sd=0) reports zero allocations, not an empty frame
    val withSingleton = Seq(("A", 0.0), ("A", 10.0), ("S", 7.0)).toDF("h", "v")
    val got3 = Sampling.neymanAllocation(withSingleton, "h", "v", budget = 2)
      .orderBy("h").select("h", "n_rows", "sd", "n_alloc").collect()
    assert(got3.length == 2 &&
      got3(1).getString(0) == "S" && got3(1).getLong(1) == 1L &&
      got3(1).isNullAt(2) && got3(1).getLong(3) == 0L, got3.mkString(", "))
    val degenerate = Seq(("A", 5.0), ("A", 5.0), ("S", 7.0)).toDF("h", "v")
    val got4 = Sampling.neymanAllocation(degenerate, "h", "v", budget = 2)
      .orderBy("h").select("h", "n_alloc").as[(String, Long)].collect()
    assert(got4.toSeq == Seq(("A", 0L), ("S", 0L)), got4.mkString(", "))
  }

  test("mixtureAllocation: hand-computed water-filling, caps bind scarce domains") {
    // targets 0.5/0.3/0.2; avail 10/100/100; budget = 60% of 210 = 126.
    // A is scarce (capped at 10); B gets (3e5*116)//5e5 = 69,
    // C gets (2e5*116)//5e5 = 46; total 125 <= 126 (floor loss).
    val avail = Seq(("A", 10L), ("B", 100L), ("C", 100L)).toDF("domain", "avail")
    val targets = Seq(("A", 500000L), ("B", 300000L), ("C", 200000L))
      .toDF("domain", "t_micro")
    val r = Sampling.mixtureAllocation(avail, "domain", "avail",
        targets, "t_micro", budgetMicroOfTotal = 600000L)
      .as[(String, Long, Long, Boolean, Long)].collect().toSet
    assert(r == Set(("A", 10L, 500000L, true, 10L),
      ("B", 100L, 300000L, false, 69L),
      ("C", 100L, 200000L, false, 46L)), r.toString)
  }

  test("mixtureAllocation: full budget caps everything at availability") {
    val avail = Seq(("A", 10L), ("B", 100L)).toDF("domain", "avail")
    val targets = Seq(("A", 500000L), ("B", 500000L)).toDF("domain", "t_micro")
    val r = Sampling.mixtureAllocation(avail, "domain", "avail",
        targets, "t_micro", budgetMicroOfTotal = 1000000L)
      .as[(String, Long, Long, Boolean, Long)].collect().toSet
    assert(r.forall(x => x._4 && x._5 == x._2), r.toString)
  }

  test("mixtureAllocation: duplicate target rows dedup instead of fanning out") {
    val avail = Seq(("A", 10L), ("B", 100L), ("C", 100L)).toDF("domain", "avail")
    val dupTargets = Seq(("A", 500000L), ("A", 500000L), ("B", 300000L),
      ("C", 200000L)).toDF("domain", "t_micro")
    val r = Sampling.mixtureAllocation(avail, "domain", "avail",
        dupTargets, "t_micro", budgetMicroOfTotal = 600000L)
      .as[(String, Long, Long, Boolean, Long)].collect().toSet
    // identical to the single-row-per-domain hand-computed case above
    assert(r == Set(("A", 10L, 500000L, true, 10L),
      ("B", 100L, 300000L, false, 69L),
      ("C", 100L, 200000L, false, 46L)), r.toString)
  }

  test("mixtureWeightUpdate: hand-computed linearized MW step") {
    // A carries full excess (1e6), eta 0.5 -> factor 1.5e6: m = (150, 100),
    // shares = (600000, 400000) with zero remainders
    val w = Seq(("A", 100L), ("B", 100L)).toDF("domain", "w")
    val x = Seq(("A", 1000000L), ("B", 0L)).toDF("domain", "x")
    val r = Sampling.mixtureWeightUpdate(w, "domain", "w", x, "x",
        etaMicro = 500000L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r == Set(("A", 100L, 1000000L, 600000L),
      ("B", 100L, 0L, 400000L)), r.toString)
  }

  test("mixtureWeightUpdate: largest-remainder makes shares sum to exactly 1e6") {
    // three equal domains, zero excess: 333333 each + 1 leftover unit
    // to the first domain by the (rem desc, domain asc) tiebreak
    val w = Seq(("A", 7L), ("B", 7L), ("C", 7L)).toDF("domain", "w")
    val x = Seq.empty[(String, Long)].toDF("domain", "x")
    val r = Sampling.mixtureWeightUpdate(w, "domain", "w", x, "x",
        etaMicro = 500000L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(r == Set(("A", 7L, 0L, 333334L), ("B", 7L, 0L, 333333L),
      ("C", 7L, 0L, 333333L)), r.toString)
    assert(r.toSeq.map(_._4).sum == 1000000L)
  }

  test("mixtureWeightUpdate: contract violations raise") {
    val w = Seq(("A", 10L), ("B", 10L)).toDF("domain", "w")
    val badX = Seq(("A", 2000000L)).toDF("domain", "x")
    val e1 = intercept[Exception] {
      Sampling.mixtureWeightUpdate(w, "domain", "w", badX, "x", 500000L).collect()
    }
    assert(e1.getMessage.contains("excess_micro > 1e6"), e1.getMessage)
    val badW = Seq(("A", 2000000000000L), ("B", 10L)).toDF("domain", "w")
    val okX = Seq(("A", 0L)).toDF("domain", "x")
    val e2 = intercept[Exception] {
      Sampling.mixtureWeightUpdate(badW, "domain", "w", okX, "x", 500000L).collect()
    }
    assert(e2.getMessage.contains("weight > 1e12"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Sampling.mixtureWeightUpdate(w, "domain", "w", okX, "x", -1L)
    }
    assert(e3.getMessage.contains("etaMicro"), e3.getMessage)
  }

  test("mixtureAllocation: contract violations raise instead of corrupting") {
    val avail = Seq(("A", 10L), ("B", 100L)).toDF("domain", "avail")
    // per-domain target > 1e6 would make (1e6 - cumT) negative and
    // silently flip the cross-multiplied cap test
    val badT = Seq(("A", 2000000L), ("B", 300000L)).toDF("domain", "t_micro")
    val e1 = intercept[Exception] {
      Sampling.mixtureAllocation(avail, "domain", "avail",
        badT, "t_micro", budgetMicroOfTotal = 500000L).collect()
    }
    assert(e1.getMessage.contains("target_micro > 1e6"), e1.getMessage)
    // total target > 1e6
    val badTot = Seq(("A", 600000L), ("B", 600000L)).toDF("domain", "t_micro")
    val e2 = intercept[Exception] {
      Sampling.mixtureAllocation(avail, "domain", "avail",
        badTot, "t_micro", budgetMicroOfTotal = 500000L).collect()
    }
    assert(e2.getMessage.contains("sum of target_micro"), e2.getMessage)
    // availability past 1e12 overflows the (__a * 1e6) scarcity quotient
    val badA = Seq(("A", 2000000000000L), ("B", 100L)).toDF("domain", "avail")
    val ok = Seq(("A", 500000L), ("B", 500000L)).toDF("domain", "t_micro")
    val e3 = intercept[Exception] {
      Sampling.mixtureAllocation(badA, "domain", "avail",
        ok, "t_micro", budgetMicroOfTotal = 500000L).collect()
    }
    assert(e3.getMessage.contains("availability > 1e12"), e3.getMessage)
  }

  test("epochAllocation: hand-computed multi-epoch accounting") {
    val avail = Seq(("A", 100L), ("B", 900L)).toDF("domain", "avail")
    val targets = Seq(("A", 500000L), ("B", 500000L)).toDF("domain", "t_micro")
    // budget = 2x total avail = 2000; want = 1000 each; cap = 4 epochs
    val got = Sampling.epochAllocation(avail, "domain", "avail",
        targets, "t_micro", budgetMicroOfAvail = 2000000L,
        maxEpochsMicro = 4000000L)
      .orderBy("domain").collect()
    val a = got(0); val b = got(1)
    // A: cap = 400 binds; 4.0 epochs exactly; 300 repeated, 600 short
    assert(a.getAs[Long]("want_tokens") == 1000L, a.toString)
    assert(a.getAs[Long]("served_tokens") == 400L, a.toString)
    assert(a.getAs[Long]("epochs_micro") == 4000000L, a.toString)
    assert(a.getAs[Long]("repeated_tokens") == 300L, a.toString)
    assert(a.getAs[Long]("shortfall_tokens") == 600L, a.toString)
    // B: want = 1000 < cap = 3600; 1000*1e6 div 900 epochs; 100 repeated
    assert(b.getAs[Long]("served_tokens") == 1000L, b.toString)
    assert(b.getAs[Long]("epochs_micro") == 1111111L, b.toString)
    assert(b.getAs[Long]("repeated_tokens") == 100L, b.toString)
    assert(b.getAs[Long]("shortfall_tokens") == 0L, b.toString)
  }

  test("epochAllocation: contract violations raise; duplicate targets dedup") {
    val avail = Seq(("A", 100L), ("B", 900L)).toDF("domain", "avail")
    val ok = Seq(("A", 500000L), ("B", 500000L)).toDF("domain", "t_micro")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.epochAllocation(avail, "domain", "avail", ok, "t_micro",
        budgetMicroOfAvail = 9000000L, maxEpochsMicro = 4000000L)
    }
    assert(e1.getMessage.contains("budgetMicroOfAvail"), e1.getMessage)
    val badT = Seq(("A", 2000000L), ("B", 300000L)).toDF("domain", "t_micro")
    val e2 = intercept[Exception] {
      Sampling.epochAllocation(avail, "domain", "avail", badT, "t_micro",
        budgetMicroOfAvail = 1000000L, maxEpochsMicro = 4000000L).collect()
    }
    assert(e2.getMessage.contains("target_micro > 1e6"), e2.getMessage)
    val badTot = Seq(("A", 600000L), ("B", 600000L)).toDF("domain", "t_micro")
    val e3 = intercept[Exception] {
      Sampling.epochAllocation(avail, "domain", "avail", badTot, "t_micro",
        budgetMicroOfAvail = 1000000L, maxEpochsMicro = 4000000L).collect()
    }
    assert(e3.getMessage.contains("sum of target_micro"), e3.getMessage)
    // a duplicated target row must not fan out the domain join
    val dup = Seq(("A", 500000L), ("A", 400000L), ("B", 500000L))
      .toDF("domain", "t_micro")
    val got = Sampling.epochAllocation(avail, "domain", "avail", dup,
        "t_micro", budgetMicroOfAvail = 2000000L, maxEpochsMicro = 4000000L)
      .orderBy("domain").collect()
    assert(got.length == 2, got.mkString(";"))
    assert(got(0).getAs[Long]("served_tokens") == 400L, got(0).toString)
  }
}
