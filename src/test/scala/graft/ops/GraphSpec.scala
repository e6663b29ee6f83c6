package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1→2, 1→3, 2→3, 3→1: node 3 is the hub (two in-edges), node 2 only
  // receives half of 1's rank, node 1 recycles 3's.
  private lazy val asym = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")

  test("pageRank matches the hand-computed fixed-point iteration") {
    // outdeg: 1→2, 2→1, 3→1; r0 = 1e6 each.
    // iter1: in(1)=1e6, in(2)=5e5, in(3)=5e5+1e6
    //   r1 = (1000000, 575000, 1425000)
    // iter2: in(1)=1425000, in(2)=500000, in(3)=500000+575000
    //   r2(1)=150000+850*1425000 div 1000 = 1361250
    //   r2(2)=150000+425000              = 575000
    //   r2(3)=150000+850*1075000 div 1000 = 1063750
    val r = Graph.pageRankFixedPoint(asym, "src", "dst", iterations = 2)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("personalizedPageRank: hand-computed seed-restricted fixed point") {
    // seeds = {1}: r0 = (1e6, 0, 0); teleport only at node 1.
    // iter1: in(1)=0, in(2)=5e5, in(3)=5e5 -> r1 = (150000, 425000, 425000)
    // iter2: in(1)=425000, in(2)=75000, in(3)=75000+425000
    //   r2(1)=150000+850*425000 div 1000 = 511250
    //   r2(2)=850*75000 div 1000         = 63750
    //   r2(3)=850*500000 div 1000        = 425000
    val seeds = Seq(1L).toDF("node")
    val r = Graph.personalizedPageRank(asym, "src", "dst", seeds, "node",
        iterations = 2)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == Map(1L -> 511250L, 2L -> 63750L, 3L -> 425000L), r.toString)
  }

  test("personalizedPageRank: nodes unreachable from the seeds score 0") {
    val e = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst") // two components
    val r = Graph.personalizedPageRank(e, "src", "dst",
        Seq(1L).toDF("node"), "node", iterations = 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r(3L) == 0L && r(4L) == 0L && r(1L) > 0L && r(2L) > 0L, r.toString)
  }

  test("a node with no in-edges converges to the bare teleport term") {
    val e = Seq((7L, 8L)).toDF("src", "dst") // 8 is dangling, 7 unreferenced
    val r = Graph.pageRankFixedPoint(e, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r(7L) == 150000L, "teleport-only node")
    // 8 receives 7's full rank: 150000 + 850*150000 div 1000 after convergence
    assert(r(8L) == 150000L + 850L * 150000L / 1000L)
  }

  test("pageRank is partitioning-independent (integer sums commute exactly)") {
    val edges = (0L until 400L).map(i => (i % 57, (i * 31) % 57)).toDF("src", "dst")
    val a = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val b = Graph.pageRankFixedPoint(edges.repartition(13), "src", "dst", iterations = 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(a == b)
  }

  test("triangleCounts matches hand-computed counts on K4 plus a pendant") {
    // K4 on {1,2,3,4}: 4 triangles, each corner on 3; pendant 4-5 adds none.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = Graph.triangleCounts(e, "src", "dst").as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts canonicalizes duplicates, reversals, and self-loops") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
      .toDF("src", "dst")
    val r = Graph.triangleCounts(e, "src", "dst").as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ~1/3 of all pairs on 25 nodes — dense enough that triangles are
  // guaranteed (a linear-map generator like (i, 17i mod n) is a
  // permutation graph and has NONE; that vacuous version of this test
  // passed on empty == empty until the nonEmpty guard caught it)
  private lazy val densePairs = for {
    a <- 0L until 25L; b <- (a + 1) until 25L
    if (a * 31 + b * 17) % 3 == 0
  } yield (a, b)

  test("triangleCounts matches brute-force triple enumeration") {
    val pairs = densePairs
    val adj = pairs.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = adj.toSeq.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val expected = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      Seq(x, y, z) <- nodes.combinations(3)
      if adj((x, y)) && adj((x, z)) && adj((y, z))
    } { expected(x) += 1; expected(y) += 1; expected(z) += 1 }
    val r = Graph.triangleCounts(pairs.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == expected.toMap && r.nonEmpty)
  }

  test("triangleCounts is partitioning-independent") {
    val edges = densePairs.toDF("src", "dst")
    val a = Graph.triangleCounts(edges, "src", "dst").as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val b = Graph.triangleCounts(edges.repartition(11), "src", "dst")
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(a == b && a.nonEmpty)
  }

  test("clusteringCoefficient: exact ppb on K4 plus a pendant, degree-1 excluded") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = Graph.clusteringCoefficient(e, "src", "dst")
      .select("node", "degree", "n_triangles", "coeff_ppb")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    graft.QueryCleanup.drain()
    // nodes 1-3: degree 3 within K4, 3 triangles -> 2*3/(3*2) = 1.0
    for (n <- 1L to 3L) assert(r(n) == ((3L, 3L, 1000000000L)), s"node $n")
    // node 4: degree 4 (pendant edge), still 3 triangles -> 6e9 div 12
    assert(r(4L) == ((4L, 3L, 500000000L)))
    // node 5: degree 1, no possible wedge -> excluded, not reported 0/0
    assert(!r.contains(5L))
  }

  test("symmetrized graph conserves total mass to within div truncation") {
    val pairs = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)).toDF("a", "b")
    val e = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val r = Graph.pageRankFixedPoint(e, "src", "dst", iterations = 4)
      .as[(Long, Long)].collect()
    graft.QueryCleanup.drain()
    val mass = r.map(_._2).sum
    val n = r.length
    // each iteration can truncate at most 1 micro-unit per (edge, node) div
    assert(mass <= n * 1000000L && mass > n * 1000000L - 4 * 1000 * n)
  }

  test("bfsHops: shortest hop wins, maxHops truncates, direction respected") {
    // path 1->2->3->4->5 plus shortcut 1->4
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graph.bfsHops(e, "src", "dst", seeds, "node", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    // 4 via the shortcut at hop 1, NOT hop 3; 5 at hop 2; 3 at hop 2
    assert(r == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L), r.toString)
    // directed: seeding at 5 reaches nothing
    val r5 = Graph.bfsHops(e, "src", "dst", Seq(5L).toDF("node"), "node")
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r5 == Map(5L -> 0L), r5.toString)
    // multi-source: min over seeds
    val rm = Graph.bfsHops(e, "src", "dst", Seq(1L, 3L).toDF("node"), "node",
      maxHops = 1).as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(rm == Map(1L -> 0L, 3L -> 0L, 2L -> 1L, 4L -> 1L), rm.toString)
    intercept[IllegalArgumentException](
      Graph.bfsHops(e, "src", "dst", seeds, "node", maxHops = 33))
  }

  test("assortativity: star graph is exactly -1; regular graph is null") {
    // K_{1,3}: hub degree 3, leaves 1 -> maximally disassortative
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val r = Graph.assortativity(star, "a", "b")
      .as[(Long, Long, Option[Double])].head()
    graft.QueryCleanup.drain()
    assert(r == ((4L, 3L, Some(-1.0))), r.toString)
    // C4 cycle: every degree 2, zero variance -> undefined, null not NaN
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val c = Graph.assortativity(cyc, "a", "b")
      .as[(Long, Long, Option[Double])].head()
    graft.QueryCleanup.drain()
    assert(c == ((4L, 4L, None)), c.toString)
    // duplicate + reversed edge rows collapse to one undirected edge
    val dup = Seq((0L, 1L), (1L, 0L), (0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("a", "b")
    val d = Graph.assortativity(dup, "a", "b")
      .as[(Long, Long, Option[Double])].head()
    graft.QueryCleanup.drain()
    assert(d == ((4L, 3L, Some(-1.0))), d.toString)
  }

  test("kCore: path peels layer by layer, ring survives, clique keeps k-1 degrees") {
    // 10-node path (peels over 5 rounds) + 5-ring + K4 on 100..103
    val path = (1L until 10L).map(i => (i, i + 1))
    val ring = (1 to 5).map(i => (20L + i, 20L + (i % 5) + 1))
    val k4 = (for { i <- 100L to 103L; j <- (i + 1) to 103L } yield (i, j))
    val edges = (path ++ ring ++ k4).toDF("a", "b")
    val core2 = Graph.kCore(edges, "a", "b", k = 2, maxRounds = 8)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    // path gone entirely; ring nodes at degree 2; K4 at degree 3
    assert(core2.keySet == ((21L to 25L) ++ (100L to 103L)).toSet, core2.toString)
    assert((21L to 25L).forall(core2(_) == 2L) && (100L to 103L).forall(core2(_) == 3L))
    // 3-core: only the K4 survives
    val core3 = Graph.kCore(edges, "a", "b", k = 3, maxRounds = 8)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(core3.keySet == (100L to 103L).toSet && core3.values.forall(_ == 3L))
    // insufficient maxRounds fails loudly instead of returning a non-fixpoint
    val err = intercept[Exception] {
      Graph.kCore(path.toDF("a", "b"), "a", "b", k = 2, maxRounds = 2).count()
    }
    graft.QueryCleanup.drain()
    assert(err.getMessage.contains("no fixpoint"), err.getMessage)
    // duplicate/reversed/self edges canonicalize away
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L))
      .toDF("a", "b")
    val m = Graph.kCore(messy, "a", "b", k = 2, maxRounds = 4)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(m == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), m.toString)
  }

  test("labelPropagation: triangle+pendant converge to min label; 2-cycle oscillates deterministically") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4-1, disconnected pair {10,11}
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (10L, 11L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = graft.ops.Graph.labelPropagation(edges, "src", "dst", rounds = 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    // hand-traced synchronous rounds (min-label ties):
    // r1: 1->2 2->1 3->1 4->1 10->11 11->10
    // r2: 1->1 2->1 3->1 4->2 10->10 11->11
    // r3: 1->1 2->1 3->1 4->1 10->11 11->10 (pair oscillates, by design)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 11L, 11L -> 10L), got.toString)
  }

  test("labelPropagation and kCore are partition-independent") {
    import spark.implicits._
    val und = (1L to 40L).flatMap(i => Seq((i, i % 20 + 100L), (i % 7 + 200L, i)))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val lp1 = graft.ops.Graph.labelPropagation(edges, "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val lp2 = graft.ops.Graph.labelPropagation(edges.repartition(7), "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(lp1 == lp2)
    val kc1 = graft.ops.Graph.kCore(edges, "src", "dst", 2, 12)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val kc2 = graft.ops.Graph.kCore(edges.repartition(7), "src", "dst", 2, 12)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(kc1 == kc2 && kc1.nonEmpty)
  }

  test("degreeCapEdges: caps out-degree, keeps low-degree nodes untouched") {
    // node 1 has 5 out-edges, node 2 has 1
    val e = (Seq((2L, 1L)) ++ (2L to 6L).map(d => (1L, d))).toDF("src", "dst")
    val capped = Graph.degreeCapEdges(e, "src", "dst", cap = 3)
      .as[(Long, Long)].collect().toSeq
    assert(capped.count(_._1 == 1L) == 3, capped.toString)
    assert(capped.contains((2L, 1L)), "below-cap node lost an edge")
    // deterministic: a second run keeps the identical edge set
    val again = Graph.degreeCapEdges(e, "src", "dst", cap = 3)
      .as[(Long, Long)].collect().toSeq
    assert(capped.toSet == again.toSet)
    // kept set is hash-selected, not prefix-by-dst: widening the cap only
    // ADDS edges (rank stability of the hash order)
    val wider = Graph.degreeCapEdges(e, "src", "dst", cap = 4)
      .as[(Long, Long)].collect().toSet
    assert(capped.toSet.subsetOf(wider))
  }

  test("pageRankDegreeCapped: cap >= max outdeg is exactly pageRank") {
    val full = Graph.pageRankFixedPoint(asym, "src", "dst", iterations = 2)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val capped = Graph.pageRankDegreeCapped(asym, "src", "dst", cap = 10,
        iterations = 2)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(capped == full)
  }

  test("personalizedPageRankWeighted: equal weights reduce to the unweighted form") {
    val seeds = Seq(1L, 3L).toDF("node")
    val wseeds = Seq((1L, 7L), (3L, 7L)).toDF("node", "w")
    val u = Graph.personalizedPageRank(asym, "src", "dst", seeds, "node",
        iterations = 2).as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val w = Graph.personalizedPageRankWeighted(asym, "src", "dst", wseeds,
        "node", "w", iterations = 2).as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(u == w, s"unweighted=$u weighted=$w")
  }

  test("personalizedPageRankWeighted: hand-computed 2:1 teleport split") {
    // seeds {1: w=2, 2: w=1}, wmax=2 -> r0 = (1e6, 5e5, 0),
    // teleports (150000, 75000, 0). outdeg: 1->2, 2->1, 3->1.
    // iter1: in(1)=0 (3 has rank 0), in(2)=5e5, in(3)=5e5+5e5
    //   r1(1)=150000; r1(2)=75000+425000=500000; r1(3)=0+850000=850000
    val wseeds = Seq((1L, 2L), (2L, 1L)).toDF("node", "w")
    val r = Graph.personalizedPageRankWeighted(asym, "src", "dst", wseeds,
        "node", "w", iterations = 1).as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == Map(1L -> 150000L, 2L -> 500000L, 3L -> 850000L), r.toString)
  }

  test("pageRankEdgeWeighted: unit weights reduce to pageRankFixedPoint") {
    val weighted = asym.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val u = Graph.pageRankFixedPoint(asym, "src", "dst", iterations = 2)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    val w = Graph.pageRankEdgeWeighted(weighted, "src", "dst", "w",
        iterations = 2).as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(u == w, s"unweighted=$u weighted=$w")
  }

  test("pageRankEdgeWeighted: hand-computed proportional split + multi-edge merge") {
    // 1->2 carries 3x the weight of 1->3 (split as two parallel 1->2
    // edges w=2 and w=1 to exercise the merge); wout(1)=4.
    // iter1: contrib 1->2 = (1e6*3)div4 = 750000, 1->3 = 250000,
    //        2->3 = 1e6, 3->1 = 1e6
    //   r1(1)=150000+850000=1000000
    //   r1(2)=150000+(850*750000)div1000=787500
    //   r1(3)=150000+(850*1250000)div1000=1212500
    val e = Seq((1L, 2L, 2L), (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 1L, 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRankEdgeWeighted(e, "src", "dst", "w", iterations = 1)
      .as[(Long, Long)].collect().toMap
    graft.QueryCleanup.drain()
    assert(r == Map(1L -> 1000000L, 2L -> 787500L, 3L -> 1212500L), r.toString)
  }

  test("neighborhoodFeatures: hand-computed symmetrized path graph 1-2-3-4") {
    // deg: (1,1)(2,2)(3,2)(4,1); nbr-deg sums: 2,3,3,2;
    // exactly-2-hop counts: each end sees one node, middles see one.
    // Input is DIRECTED by contract — pass both directions.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.neighborhoodFeatures(e, "src", "dst")
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.QueryCleanup.drain()
    assert(r == Set((1L, 1L, 2L, 1L), (2L, 2L, 3L, 1L),
      (3L, 2L, 3L, 1L), (4L, 1L, 2L, 1L)), r.toString)
  }

  test("neighborhoodFeatures: triangle has no exactly-2-hop nodes; directed path drops sinks") {
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val r = Graph.neighborhoodFeatures(e, "src", "dst")
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.QueryCleanup.drain()
    assert(r == Set((1L, 2L, 4L, 0L), (2L, 2L, 4L, 0L), (3L, 2L, 4L, 0L)),
      r.toString)
    // directed 1->2->3: node 3 is a sink (no out-degree) and 2's only
    // neighbor (3) has no out-edges, so only node 1 survives the
    // feature join: deg 1, nbr-deg sum 1, exactly-2-hop {3}
    val d = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val rd = Graph.neighborhoodFeatures(d, "src", "dst")
      .as[(Long, Long, Long, Long)].collect().toSet
    graft.QueryCleanup.drain()
    assert(rd == Set((1L, 1L, 1L, 1L)), rd.toString)
  }

  test("rankFidelityAudit: identical inputs give zero displacement, full overlap") {
    val r = Graph.pageRankFixedPoint(asym, "src", "dst", iterations = 2)
    val a = Graph.rankFidelityAudit(r, r, "node", "rank", k = 2).collect().head
    graft.QueryCleanup.drain()
    assert(a.getLong(0) == 3L && a.getLong(1) == 2L && a.getLong(2) == 0L
      && a.getDouble(3) == 0.0, a.toString)
  }

  test("hitsScores: hand-computed 2-iteration L-inf-normalized run") {
    // 1->3, 2->3, 2->4: node 2 is the better hub (links both
    // authorities), node 3 the better authority (linked by both hubs)
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val r = Graph.hitsScores(e, "src", "dst", iterations = 2)
      .as[(Long, Long, Long)].collect().toSet
    graft.QueryCleanup.drain()
    assert(r == Set((1L, 625000L, 0L), (2L, 1000000L, 0L),
      (3L, 0L, 1000000L), (4L, 0L, 600000L)), r.toString)
  }

  test("salsaScores: hand-computed 2-iteration degree-split run") {
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val r = Graph.salsaScores(e, "src", "dst", iterations = 2)
      .as[(Long, Long, Long)].collect().toSet
    graft.QueryCleanup.drain()
    assert(r == Set((1L, 687500L, 0L), (2L, 1312500L, 0L),
      (3L, 0L, 1375000L), (4L, 0L, 625000L)), r.toString)
  }

  test("rankFidelityAudit: hand-computed swap of two ranks") {
    // exact order: 1,2,3 ; approx order: 2,1,3 -> footrule |1-2|+|2-1| = 2
    val exact = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("node", "rank")
    val approx = Seq((1L, 20L), (2L, 30L), (3L, 10L)).toDF("node", "rank")
    val a = Graph.rankFidelityAudit(exact, approx, "node", "rank", k = 1)
      .collect().head
    assert(a.getLong(0) == 3L && a.getLong(1) == 0L && a.getLong(2) == 2L,
      a.toString)
    assert(a.getDouble(3) == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, a.toString)
  }

  test("pageRankConvergence: rows agree with successive fixed-point runs") {
    import org.apache.spark.sql.functions._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val curve = Graph.pageRankConvergence(edges, "src", "dst", iterations = 3)
      .collect()
    assert(curve.length == 3, curve.mkString(";"))
    assert(curve.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), curve.mkString(";"))
    // the iter-2 row must equal the diff of two explicit fixed-point runs
    val r1 = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 1)
      .withColumnRenamed("rank", "r1")
    val r2 = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 2)
      .withColumnRenamed("rank", "r2")
    val d = r1.join(r2, "node")
      .agg(sum(abs(col("r2") - col("r1"))).as("l1"),
        max(abs(col("r2") - col("r1"))).as("mx"),
        sum(when(col("r2") =!= col("r1"), 1L).otherwise(0L)).as("mv"))
      .collect().head
    assert(curve(1).getLong(1) == d.getLong(0), s"${curve(1)} vs $d")
    assert(curve(1).getLong(2) == d.getLong(1), s"${curve(1)} vs $d")
    assert(curve(1).getLong(3) == d.getLong(2), s"${curve(1)} vs $d")
    // iteration 1 must move mass on any non-degenerate graph
    assert(curve(0).getLong(1) > 0L, curve(0).toString)
  }
}
