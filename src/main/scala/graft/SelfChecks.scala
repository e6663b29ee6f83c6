package graft

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Machine-checked invariants for the queries that have NO SQL oracle
  * (ML nondeterminism, zlib, the BPE merge loop): the harness-level
  * twin of the unit-spec assertions, run by [[Verify]] at the SAME
  * data scale as the oracle gate and emitted as `self_checks.json`
  * beside the parquet dumps. A rows-only entry stops meaning "nothing
  * checked" — every no-oracle query gets a pass/fail verdict computed
  * from properties that must hold for ANY correct implementation
  * (exact-equality against a verified baseline where one exists,
  * invariant bands where the output is legitimately engine-specific).
  *
  * Each check returns (pass, detail); failures never throw — Verify
  * reports them like oracle failures, one bad check cannot strand the
  * rest of the dump.
  */
object SelfChecks {

  final case class Result(pass: Boolean, detail: String)

  private def fmt(b: Boolean) = if (b) "pass" else "FAIL"

  /** Per-query checks, keyed by the `SparkEntry.queries` name. Each
    * receives (spark, sfDir) and recomputes what it needs — outputs are
    * deterministic per engine (fixed seeds/hashes), so recomputation
    * checks the same artifact the dump wrote. */
  val checks: Map[String, (SparkSession, String) => Result] = Map(

    // Gate-environment canary: the collected rows' canonical md5 must
    // equal the pinned literal — an in-JVM witness that the produced
    // frame is the one the oracle replays. If the DRIVER's gate row for
    // q000 is red while this passes, the dump/compare path is proven
    // guilty for that run (and other red rows are quarantined).
    "q000_canary" -> ((s, dir) => {
      val rows = SparkEntry.queries("q000_canary")(s, dir)
        .orderBy("id").collect()
      val canon = rows.map(r => s"${r.getLong(0)}|${r.getString(1)}|${r.getDouble(2)}")
        .mkString("\n")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val want = "2d65ca40a7b4c914ec4444d6291e8bbe"
      Result(rows.length == 10 && md5 == want,
        s"canary rows ${rows.length}==10, md5 $md5 ${if (md5 == want) "==" else "!="} $want")
    }),

    // KMeans generalization (E2): every input row survives, clusters
    // respect the requested k as an upper bound, and each cluster
    // carries exactly ONE generalized range (the defining property of
    // per-cluster min-max generalization).
    "q45_cluster_generalize" -> ((s, dir) => {
      val out = SparkEntry.queries("q45_cluster_generalize")(s, dir)
      val inRows = Tables.customer(s, dir).count()
      val outRows = out.count()
      val nClusters = out.select("cluster").distinct().count()
      val maxRangesPerCluster = out.groupBy("cluster")
        .agg(countDistinct("c_acctbal").as("r"))
        .agg(max("r")).head().getLong(0)
      val pass = outRows == inRows && nClusters <= 10 && nClusters >= 1 &&
        maxRangesPerCluster == 1L
      Result(pass, s"rows $outRows/$inRows, clusters $nClusters<=10, " +
        s"ranges/cluster max $maxRangesPerCluster==1")
    }),

    // Same invariants, both generalized columns.
    "q69_multicol_generalize" -> ((s, dir) => {
      val out = SparkEntry.queries("q69_multicol_generalize")(s, dir)
      val inRows = Tables.customer(s, dir).count()
      val outRows = out.count()
      val nClusters = out.select("cluster").distinct().count()
      val maxRanges = out.groupBy("cluster")
        .agg(countDistinct("c_acctbal").as("ra"),
          countDistinct("mktsegment_range").as("rb"))
        .agg(greatest(max("ra"), max("rb"))).head().getLong(0)
      val pass = outRows == inRows && nClusters <= 10 && nClusters >= 1 &&
        maxRanges == 1L
      Result(pass, s"rows $outRows/$inRows, clusters $nClusters<=10, " +
        s"ranges/cluster max $maxRanges==1")
    }),

    // RF on a label derived from one of its own features must separate
    // it nearly perfectly; split accounting must cover the table.
    // Mondrian cuts are deterministic but the tree is iterative — no SQL
    // oracle. Check the properties any correct Mondrian must satisfy at
    // this scale: no row lost, the rendered equivalence classes are
    // EXACTLY k-anonymous (every (range, range) class >= k), the
    // certificate column agrees with a recount, and the cut tree
    // actually cut (>1 class on 1500+ customers at k=25).
    "q138_mondrian" -> ((s, dir) => {
      val out = SparkEntry.queries("q138_mondrian")(s, dir)
      val inRows = Tables.customer(s, dir).count()
      val outRows = out.count()
      val classes = out.groupBy("c_nationkey_range", "c_acctbal_range")
        .agg(count(lit(1)).as("n"), min("group_size").as("gmin"),
          max("group_size").as("gmax"))
      val nClasses = classes.count()
      val minClass = classes.agg(min("n")).head().getLong(0)
      // group_size is per-cut-tree-leaf; identical-range leaves can merge
      // into one class, so class size >= its members' certificates.
      val badCert = classes.filter(col("gmin") < 25 || col("gmax") > col("n"))
        .count()
      val pass = outRows == inRows && minClass >= 25 && nClasses > 1 &&
        badCert == 0
      Result(pass, s"rows $outRows/$inRows, min class $minClass>=25, " +
        s"classes $nClasses>1, cert violations $badCert==0")
    }),

    "q46_rf_utility" -> ((s, dir) => {
      val r = SparkEntry.queries("q46_rf_utility")(s, dir).head()
      val (acc, train, test) =
        (r.getDouble(0), r.getLong(1), r.getLong(2))
      val total = Tables.orders(s, dir).count()
      val pass = acc >= 0.9 && acc <= 1.0 && train + test == total
      Result(pass, f"accuracy $acc%.4f in [0.9,1], split $train+$test==$total")
    }),

    // Coarsening a feature to 3 bins cannot IMPROVE utility beyond
    // noise; original accuracy stays near-perfect; drop is consistent.
    "q68_accuracy_drop" -> ((s, dir) => {
      val r = SparkEntry.queries("q68_accuracy_drop")(s, dir).head()
      val (orig, anon, drop) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      val pass = orig >= 0.9 && orig <= 1.0 && anon > 0.5 && anon <= 1.0 &&
        math.abs(drop - (orig - anon)) < 1e-9 && drop > -0.02
      Result(pass, f"orig $orig%.4f>=0.9, anon $anon%.4f in (0.5,1], " +
        f"drop $drop%.4f consistent and > -0.02")
    }),

    // Trained IVF at nprobe=2 scans 2 of 10 cells (20% of the corpus):
    // recall@5 against the exact brute-force baseline (q38's
    // oracle-verified path) must clear a floor comfortably above the
    // ~0.2 a random 20% scan would give. Measured 0.42-0.45 at
    // sf0.01 — the honest recall of a nprobe=2 scan on this corpus;
    // raising nprobe is the documented recall knob.
    "q67_knn_ivf_trained" -> ((s, dir) => {
      val ivf = SparkEntry.queries("q67_knn_ivf_trained")(s, dir)
        .select("qid", "vec_id")
      val e = Tables.embeddings(s, dir)
      val exact = Similarity.knnBruteForce(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5)
        .select("qid", "vec_id")
      val hits = exact.intersect(ivf).count().toDouble
      val denom = exact.count().toDouble
      val recall = if (denom == 0) 0.0 else hits / denom
      Result(denom > 0 && recall >= 0.3,
        f"recall@5 $recall%.3f >= 0.3 (2x the 20%%-scan chance floor) " +
          f"over ${denom.toLong} exact pairs")
    }),

    // PQ ADC shortlist + exact refine. Two invariants, split by what the
    // algorithm actually guarantees:
    //  (1) REFINEMENT IS EXACT: every emitted l2_dist equals the true
    //      L2 distance of its (qid, vec_id) pair, recomputed from the
    //      float vectors with the refine stage's own rounding — catches
    //      any bug in the rescoring join. Equality, zero tolerance.
    //  (2) SHORTLIST RECALL: the refined top-5 recalls the true L2
    //      top-5 above a floor. Full equality holds only when the
    //      ADC shortlist covers the true neighbors (the toy-scale spec's
    //      separated clusters); on this corpus' near-random 64-dim
    //      embeddings an m=8 byte-code quantizer is genuinely lossy —
    //      measured recall ~0.42 at sf0.01, floor 0.3 (2x the
    //      shortlist/corpus chance rate); `shortlist` is the recall
    //      knob, as in any production ADC+refine system.
    "q114_knn_pq" -> ((s, dir) => {
      val pq = SparkEntry.queries("q114_knn_pq")(s, dir)
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("__qv"))
      // the engine's exact integer-micro L2 (GraftL2Micro8), scaled back
      // once — comparing 6-dp values derived from the SAME protocol, so
      // no knife-edge between a raw-double fold and the micro sum
      val d2 = round(graft.functions.GraftFunctions.l2Micro8Native(
          col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
        .cast("double") / lit(1e8), 9)
      val trueD = e.select(col("vec_id"), col("embedding").as("__cv"))
        .join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"), d2.as("__d2"))
      val wrongDist = pq.join(trueD, Seq("qid", "vec_id"))
        .filter(round(col("l2_dist"), 6) =!= round(col("__d2"), 6))
        .count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("__d2"), col("vec_id"))
      val exact = trueD.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select("qid", "vec_id")
      val hits = exact.intersect(pq.select("qid", "vec_id")).count().toDouble
      val denom = exact.count().toDouble
      val recall = if (denom == 0) 0.0 else hits / denom
      Result(wrongDist == 0 && denom > 0 && recall >= 0.3,
        f"refined distances wrong $wrongDist==0 (refine is exact L2); " +
          f"shortlist recall@5 $recall%.3f >= 0.3")
    }),

    // IVF-PQ composition: the cell-routed ADC scan must (a) keep the
    // refine stage exact L2, and (b) hold q114's flat-PQ recall band
    // (>= 0.3) while scanning only nprobe/nlist of the code table —
    // the claim that cell pruning does not cost the recall the flat
    // scan had. Both recalls are reported so a divergence is visible.
    "q160_knn_ivfpq" -> ((s, dir) => {
      val out = SparkEntry.queries("q160_knn_ivfpq")(s, dir)
      val flat = SparkEntry.queries("q114_knn_pq")(s, dir)
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("__qv"))
      // the engine's exact integer-micro L2 (GraftL2Micro8), scaled back
      // once — comparing 6-dp values derived from the SAME protocol, so
      // no knife-edge between a raw-double fold and the micro sum
      val d2 = round(graft.functions.GraftFunctions.l2Micro8Native(
          col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
        .cast("double") / lit(1e8), 9)
      val trueD = e.select(col("vec_id"), col("embedding").as("__cv"))
        .join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"), d2.as("__d2"))
      val wrongDist = out.join(trueD, Seq("qid", "vec_id"))
        .filter(round(col("l2_dist"), 6) =!= round(col("__d2"), 6))
        .count()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("__d2"), col("vec_id"))
      val exact = trueD.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select("qid", "vec_id")
      val denom = exact.count().toDouble
      val hits = exact.intersect(out.select("qid", "vec_id")).count().toDouble
      val flatHits = exact.intersect(flat.select("qid", "vec_id")).count().toDouble
      val recall = if (denom == 0) 0.0 else hits / denom
      val flatRecall = if (denom == 0) 0.0 else flatHits / denom
      Result(wrongDist == 0 && denom > 0 && recall >= 0.3,
        f"refined distances wrong $wrongDist==0 (refine is exact L2); " +
          f"cell-routed recall@5 $recall%.3f >= 0.3 (flat-PQ band; " +
          f"flat recall $flatRecall%.3f) at nprobe=4/nlist=10")
    }),

    // Storage round-trip: the search over the PERSISTED index (codes +
    // centroids + codebooks reloaded from SnapshotStore) must be
    // ROW-IDENTICAL to q160's in-process path — any drift means the
    // persisted artifact is not the artifact.
    "q167_knn_ivfpq_stored" -> ((s, dir) => {
      val stored = SparkEntry.queries("q167_knn_ivfpq_stored")(s, dir)
        .collect().toSeq
      val inProc = SparkEntry.queries("q160_knn_ivfpq")(s, dir)
        .collect().toSeq
      Result(stored.nonEmpty && stored == inProc,
        s"stored-index search rows ${stored.size} == in-process rows " +
          s"${inProc.size}, row-identical ${stored == inProc}")
    }),

    // Incremental-encode contract: after the query ran (day-0 evens +
    // ingested odds), the STORED code table must be ROW-IDENTICAL to a
    // full re-encode of the whole corpus against the same stored
    // artifacts, the search over either table identical, and replaying
    // the ingest a version bump with zero row changes.
    "q184_ivfpq_incremental" -> ((s, dir) => {
      val out = SparkEntry.queries("q184_ivfpq_incremental")(s, dir)
        .collect().toSeq
      val e = Tables.embeddings(s, dir)
      // the Scratch dir the query invocation above just minted (same
      // scope, not yet drained) — no fixed cross-process path
      val idxDir = graft.queries.VectorEventQueries.lastIndexDir.get("incr")
      val (codes, cents, pq) = Similarity.loadIvfPqIndex(s, idxDir)
      val full = Similarity.encodeWithStoredIndex(e, "vec_id", "embedding",
          cents, pq)
        .select(codes.columns.map(col).toSeq: _*)
      val extra = codes.exceptAll(full).count()
      val missing = full.exceptAll(codes).count()
      val viaFull = Similarity.knnIvfPqRefined(full, e,
          e.filter(col("vec_id") < 8), "vec_id", "embedding", cents, pq,
          5, nprobe = 4, shortlist = 40)
        .orderBy("qid", "rank").collect().toSeq
      val v = Similarity.encodeIntoIvfPqIndex(s, idxDir,
        e.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding"),
        "vec_id", "embedding", meta = "replay")
      val replayDiff = graft.sources.SnapshotStore
        .readVersion(s, s"$idxDir/codes", v).exceptAll(codes).count()
      Result(out.nonEmpty && extra == 0 && missing == 0 &&
          out == viaFull && replayDiff == 0,
        s"codes vs full re-encode: extra $extra==0 missing $missing==0; " +
          s"search row-identical ${out == viaFull}; replay v$v diff " +
          s"$replayDiff==0 rows")
    }),

    // Drift monitor: the per-cell occupancy PSI must cross the 0.25
    // retrain gate after the drifted crawl, while search recall over the
    // grown index holds the q160 band — staleness gets FLAGGED, not
    // silently suffered, and flagging is not a false alarm about
    // correctness.
    "q185_ivfpq_drift" -> ((s, dir) => {
      val out = SparkEntry.queries("q185_ivfpq_drift")(s, dir)
      val psi = out.select("psi_micro").head().getLong(0)
      val e = Tables.embeddings(s, dir)
      // Scratch dir minted by the query invocation above (same scope)
      val idxDir = graft.queries.VectorEventQueries.lastIndexDir.get("drift")
      val (codes, cents, pq) = Similarity.loadIvfPqIndex(s, idxDir)
      val dayZero = graft.sources.SnapshotStore
        .readVersion(s, s"$idxDir/codes", 1L)
      val grown = e.select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
        .unionByName(
          graft.queries.VectorEventQueries.driftedBatch(e, dayZero))
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("__qv"))
      val got = Similarity.knnIvfPqRefined(codes, grown, grown.filter(col("vec_id") < 8),
        "vec_id", "embedding", cents, pq, 5, nprobe = 4, shortlist = 40)
      // the engine's exact integer-micro L2 (GraftL2Micro8), scaled back
      // once — comparing 6-dp values derived from the SAME protocol, so
      // no knife-edge between a raw-double fold and the micro sum
      val d2 = round(graft.functions.GraftFunctions.l2Micro8Native(
          col("__qv").cast("array<double>"), col("__cv").cast("array<double>"))
        .cast("double") / lit(1e8), 9)
      val trueD = grown.select(col("vec_id"), col("embedding").as("__cv"))
        .join(broadcast(q), col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"), d2.as("__d2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("__d2"), col("vec_id"))
      val exact = trueD.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5).select("qid", "vec_id")
      val denom = exact.count().toDouble
      val hits = exact.intersect(got.select("qid", "vec_id")).count().toDouble
      val recall = if (denom == 0) 0.0 else hits / denom
      Result(psi > 250000L && denom > 0 && recall >= 0.3,
        f"drifted-ingest PSI $psi > 250000 (0.25 retrain gate); " +
          f"recall@5 over grown index $recall%.3f >= 0.3")
    }),

    // The 7-stage pipeline can only shrink the corpus: each filter /
    // dedup stage's surviving count is monotone non-increasing, and the
    // emitted corpus matches the final stage.
    "q88_corpus_pipeline" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val res = graft.pipelines.CorpusPipeline.run(
        d.filter(col("doc_id") % 50 =!= 0),
        d.filter(col("doc_id") % 50 === 0),
        collectCounts = true)
      try {
        val c = res.counts.get
        val outRows = res.corpus.count()
        val mono = c.input >= c.normalized && c.normalized >= c.quality &&
          c.quality >= c.exactDedup && c.exactDedup >= c.nearDedup &&
          c.nearDedup >= c.decontaminated
        Result(mono && outRows == c.decontaminated,
          s"stages ${c.input}>=${c.normalized}>=${c.quality}>=" +
            s"${c.exactDedup}>=${c.nearDedup}>=${c.decontaminated}, " +
            s"corpus $outRows==${c.decontaminated}")
      } finally res.unpersist()
    }),

    // Sequence packing on BPE counts: exact replay — bin must equal
    // floor(exclusive-prefix-sum / budget) in (source, doc_id) order
    // (the packing contract: a doc belongs to the bin its FIRST token
    // falls in; only a bin's LAST doc may overflow the budget). Plus:
    // positive token counts and gap-free bin sequences per shard.
    "q89_bpe_pack" -> ((s, dir) => {
      val out = SparkEntry.queries("q89_bpe_pack")(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val mismatches = out.withColumn("__expect",
          floor((sum(col("n_bpe")).over(w) - col("n_bpe")) / lit(2048.0)).cast("long"))
        .filter(col("bin") =!= col("__expect")).count()
      val nonPos = out.filter(col("n_bpe") <= 0).count()
      val gaps = out.groupBy("source")
        .agg((max("bin") + 1 - countDistinct("bin")).as("g"))
        .filter(col("g") =!= 0).count()
      Result(mismatches == 0 && nonPos == 0 && gaps == 0,
        s"bin-vs-prefix-sum mismatches $mismatches==0, non-positive counts " +
          s"$nonPos==0, bin-sequence gaps $gaps==0")
    }),

    // Deflate ratio: positive everywhere, bounded above by the format's
    // worst case — zlib adds ~11 bytes of header/trailer/stored-block
    // overhead, so ratio <= 1 + 16/len (16 = overhead with margin; an
    // incompressible 48-char doc measures 1.125 = 1 + 6/48). And the
    // corpus mean must show real compression (< 0.9).
    "q109_compress_ratio" -> ((s, dir) => {
      val out = SparkEntry.queries("q109_compress_ratio")(s, dir)
      val withLen = out.join(
        Tables.documents(s, dir).select(col("doc_id"), length(col("text")).as("__len")),
        Seq("doc_id"))
      val oob = withLen.filter(col("deflate_ratio") <= 0.0 ||
        col("deflate_ratio") > lit(1.0) + lit(16.0) / col("__len")).count()
      val mean = out.agg(avg("deflate_ratio")).head().getDouble(0)
      Result(oob == 0 && mean < 0.9,
        f"rows beyond the 1+16/len deflate bound $oob==0, " +
          f"mean ratio $mean%.3f < 0.9")
    }))

  /** Run the checks whose names pass `only`; returns (name -> Result)
    * in name order. Failures inside a check become a failed Result. */
  def run(spark: SparkSession, sfDir: String,
          only: Option[Set[String]]): Seq[(String, Result)] =
    checks.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val scope = s"selfcheck:$name"
        val r =
          try QueryCleanup.scoped(scope)(fn(spark, sfDir))
          catch { case e: Throwable =>
            Result(pass = false, s"check threw ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
          finally QueryCleanup.drain(scope)
        System.err.println(s"[selfcheck] ${fmt(r.pass)} $name — ${r.detail}")
        name -> r
      }

  /** Render results as the `self_checks.json` payload. */
  def toJson(results: Seq[(String, Result)]): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    results.map { case (name, r) =>
      s""""${esc(name)}": {"self_check": "${if (r.pass) "pass" else "fail"}", "detail": "${esc(r.detail)}"}"""
    }.mkString("{", ", ", "}")
  }
}
