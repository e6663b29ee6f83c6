package graft.ops

import graft.functions.PortableHash.phash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column (Cormode & Muthukrishnan 2005) with
  * the PORTABLE hash family, so the sketch — and every estimate read from
  * it — is bit-reproducible by an external SQL engine. The point of a CMS
  * at 100 TB is mergeability: per-partition sketches are d·w counters
  * that add cell-wise, so frequency estimation over the whole corpus
  * costs one map-side-combined aggregation into a table of d·w rows —
  * constant size regardless of corpus or vocabulary, where an exact
  * count table is vocabulary-sized. Estimates overestimate only
  * (est >= true; est <= true + εN with prob 1-δ for w = ⌈e/ε⌉, d =
  * ⌈ln 1/δ⌉).
  */
object Sketches {

  /** Row r's bucket for a key: portable hash of "salt|r|key" mod w. */
  private def cmsBucket(key: Column, r: Column, w: Int, salt: String): Column =
    pmod(phash(concat_ws("|", lit(salt), r.cast("string"), key.cast("string"))), lit(w.toLong))

  /** Build the sketch: one (r, bucket, cnt) row per non-empty cell.
    * Weights pre-aggregate per key first (map-side partial), so each
    * distinct key contributes d rows to the cell aggregation, not each
    * occurrence. */
  def cmsBuild(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 1024,
               salt: String = "graft-cms"): DataFrame = {
    val keyCounts = df.groupBy(col(keyCol).as("__key"))
      .agg(count(lit(1)).as("__c"))
    keyCounts
      .select(col("__key"), col("__c"),
        explode(array((0 until d).map(lit): _*)).as("r"))
      .groupBy(col("r"), cmsBucket(col("__key"), col("r"), w, salt).as("bucket"))
      .agg(sum("__c").as("cnt"))
  }

  /** Point estimates for the keys in `keys(keyCol)`: est = min over the d
    * rows of the addressed cell. The sketch side is d·w rows at most —
    * it always broadcasts. */
  def cmsEstimate(keys: DataFrame, sketch: DataFrame, keyCol: String,
                  d: Int = 4, w: Int = 1024,
                  salt: String = "graft-cms"): DataFrame = {
    val addressed = keys
      .withColumn("r", explode(array((0 until d).map(lit): _*)))
      .withColumn("bucket", cmsBucket(col(keyCol), col("r"), w, salt))
    addressed.join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** JOIN-SIZE estimate from two CMS sketches (Alon, Gibbons, Matias &
    * Szegedy's sketch inner product, as systematized for CM sketches by
    * Cormode & Muthukrishnan, J.Alg 2005 §4.2): |A ⋈_k B| = Σ_k
    * fA(k)·fB(k), estimated by the MINIMUM over the d rows of the
    * per-row bucket-count dot products. The estimate never
    * underestimates (every bucket product over-counts by hash
    * collisions only) and replays bit-identically in an external
    * engine. With a = b this is the self-join size / second frequency
    * moment F2 — the skew statistic that decides salting (q54/q91)
    * WITHOUT a per-key scan.
    *
    * Both sketches must share (d, w, salt). Cost: the join touches only
    * the ≤ d·w sketch cells of each side — independent of either
    * table's size; sketches built once serve every pairwise estimate
    * (the planning use: estimate all candidate join sizes from one
    * sketch pass per table). */
  def cmsJoinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.withColumnRenamed("cnt", "__cb"), Seq("r", "bucket"))
      .groupBy(col("r"))
      .agg(sum(col("cnt") * col("__cb")).as("__dp"))
      .agg(min(col("__dp")).as("cms_join_est"))

  /** K-MINIMUM-VALUES distinct-count sketch (Bar-Yossef et al. 2002, the
    * basis of the theta sketch): keep the k smallest distinct normalized
    * hashes of the key; if fewer than k exist the sketch IS the exact
    * distinct set, otherwise E[distinct] = (k-1) / u_(k) with u_(k) the
    * k-th smallest. With the portable hash the sketch — and the estimate
    * — replays bit-identically in an external engine.
    *
    * Scale: distinct-hash reduction (map-side partial) then a k-limit
    * that compiles to TakeOrderedAndProject — per-partition k-heaps, k
    * rows per partition to the driver-side merge; the sketch of a UNION
    * is the min-k of the parts' sketches (see [[kmvMerge]]), so shards
    * sketch independently and merge in O(k). Hash granularity is the
    * 1e-6 `puniform` grid: distinct values colliding on the grid merge,
    * identically on every engine. */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int = 256,
                salt: String = "graft-kmv"): DataFrame =
    df.select(graft.functions.PortableHash.puniform(
        concat_ws("|", lit(salt), col(keyCol).cast("string"))).as("u"))
      .distinct()
      .orderBy(col("u"))
      .limit(k)

  /** Sketch of a union from the parts' sketches: min-k of the combined
    * hash sets. */
  def kmvMerge(sketches: Seq[DataFrame], k: Int = 256): DataFrame =
    sketches.reduce(_.unionByName(_)).distinct().orderBy(col("u")).limit(k)

  /** One-row estimate from a sketch: exact when the sketch holds fewer
    * than k hashes, (k-1)/u_(k) otherwise. */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.agg(count(lit(1)).as("__n"), max(col("u")).as("__uk"))
      .select(
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(round((lit(k) - 1) / col("__uk"), 6)).as("kmv_est"))

  /** Per-group KMV sketch: the k smallest distinct hash-uniforms of
    * `keyCol` WITHIN each group — one approx-distinct state per group in
    * bounded k rows, the grouped twin of [[kmvSketch]] (same hash, same
    * estimator, so the two compose: a group sketch re-merged across
    * groups IS the global sketch of the union).
    *
    * Scale: the distinct's partial aggregation dedupes map-side, then
    * the rank-limit window runs behind one group-keyed exchange with
    * map-side WindowGroupLimit — at most k rows per (partition, group)
    * reach the exchange, so a billion-key group costs the same shuffle
    * as a thousand-key one. Contrast `approx_count_distinct` (HLL):
    * similar state, but its buckets are not replayable by an external
    * SQL engine — this sketch is, bit-for-bit (the q117 pattern).
    */
  def kmvSketchGrouped(df: DataFrame, groupCol: String, keyCol: String,
                       k: Int = 256, salt: String = "graft-kmv"): DataFrame =
    df.select(col(groupCol),
        graft.functions.PortableHash.puniform(
          concat_ws("|", lit(salt), col(keyCol).cast("string"))).as("u"))
      .distinct()
      .withColumn("__rn",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(col("u"))))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** One row (group, kmv_est) per group: exact below k distinct hashes,
    * (k-1)/u_(k) at or above. One group-keyed agg over ≤k-row states. */
  def kmvEstimateGrouped(sketch: DataFrame, groupCol: String,
                         k: Int = 256): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), max(col("u")).as("__uk"))
      .select(col(groupCol),
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(round((lit(k) - 1) / col("__uk"), 6)).as("kmv_est"))

  /** Mergeable quantile sketch: a deterministic bottom-k ROW sample —
    * each row keyed by the portable hash-uniform of its unique `keyCol`,
    * the sketch being the k (u, v) pairs with the smallest u. Bottom-k
    * sampling (Cohen & Kaplan 2007) gives a uniform k-sample without
    * replacement whose membership is a pure function of the hash, so:
    *  - the sketch of a UNION is the bottom-k of the parts' sketches
    *    ([[quantileMerge]] — same O(k) merge law as [[kmvSketch]]);
    *  - shards sketch independently with NO coordination, and the state
    *    is k rows regardless of input size — the mergeable-summary
    *    property exact `percentile()` (q50) lacks, where at lake scale
    *    every value funnels into one aggregation buffer;
    *  - an external SQL engine replays the sketch bit-for-bit (the
    *    estimate-vs-exact oracle pattern established by q117).
    * Estimates are nearest-rank order statistics of the sample: rank
    * error concentrates at O(sqrt(q(1-q)/k)) — ±~3 percentile points at
    * k=256, q=0.5 — independent of data size or distribution.
    *
    * `keyCol` must be row-unique (hashing the VALUE would sample the
    * distinct-value set, not the distribution). Ties on the 1e-6
    * u-grid break by v, making the boundary deterministic per engine;
    * equal (u, v) rows are interchangeable.
    *
    * Scale: one projection + TakeOrderedAndProject (per-partition
    * k-heaps, k rows per partition to the driver-side merge) — zero
    * exchanges, same topology as [[kmvSketch]]. */
  def quantileSketch(df: DataFrame, keyCol: String, valueCol: String,
                     k: Int = 256, salt: String = "graft-qsk"): DataFrame =
    df.select(
        graft.functions.PortableHash.puniform(
          concat_ws("|", lit(salt), col(keyCol).cast("string"))).as("u"),
        col(valueCol).cast("double").as("v"))
      .orderBy(col("u"), col("v"))
      .limit(k)

  /** Sketch of a union from the parts' sketches: bottom-k of the
    * combined (u, v) sets. Exact-identical to sketching the union
    * directly — the merge-law spec pins this as equality, not a band. */
  def quantileMerge(sketches: Seq[DataFrame], k: Int = 256): DataFrame =
    sketches.reduce(_.unionByName(_)).orderBy(col("u"), col("v")).limit(k)

  /** Per-group [[quantileSketch]]: an independent bottom-k sample PER
    * value of `groupCol`, in ONE exchange (group-keyed window ranks the
    * hash-uniforms; rows beyond rank k drop map-side via
    * WindowGroupLimit). Each group's k rows obey the same merge law as
    * the global sketch, so per-shard grouped sketches union + re-limit
    * into corpus-wide per-group sketches — the "quantiles by language /
    * tenant / source" shape at 100 TB, where exact per-group
    * percentile() would buffer every value of every group. */
  def quantileSketchGrouped(df: DataFrame, groupCol: String, keyCol: String,
                            valueCol: String, k: Int = 256,
                            salt: String = "graft-qsk"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("u"), col("v"))
    df.select(col(groupCol),
        graft.functions.PortableHash.puniform(
          concat_ws("|", lit(salt), col(keyCol).cast("string"))).as("u"),
        col(valueCol).cast("double").as("v"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Nearest-rank estimates per group from a grouped sketch: one row
    * (group, q, q_est) per (group, fraction). State per group is ≤k
    * rows; both windows share the one group-keyed exchange. */
  def quantileEstimateGrouped(sketch: DataFrame, groupCol: String,
                              qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions $qs must lie in (0, 1]")
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"), col("u"))
    val ranked = sketch
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    ranked.join(broadcast(qs.toDF("q")),
        col("__rn") === greatest(lit(1), ceil(col("q") * col("__n"))))
      .select(col(groupCol), col("q"), round(col("v"), 6).as("q_est"))
  }

  /** EXACT frequent items above a support threshold (count·supportDen >=
    * N) without a vocabulary-sized shuffle: a Misra–Gries candidate pass
    * (Misra & Gries 1982; the "frequent" summary of Cormode &
    * Hadjieleftheriou 2008) runs per partition in O(capacity) bounded
    * state, then ONE exact counting pass over the candidate set only.
    * Pigeonhole guarantee: an item with global count > N/(capacity+1)
    * survives MG in at least one partition (were it evicted everywhere,
    * each partition would have f_i <= N_i/(capacity+1), summing to
    * f <= N/(capacity+1)); with capacity+1 >= supportDen every item at
    * or above the support threshold is a candidate, so the exact pass —
    * whose semantics an external engine replays as plain GROUP BY ...
    * HAVING — returns exactly the frequent set, independent of
    * partitioning and of the MG pass entirely.
    *
    * Scale: state is `capacity` counters per partition; the candidate
    * set is <= partitions·capacity keys (it broadcasts), so the exact
    * pass shuffles only candidate keys after a map-side semi-join filter
    * — the long tail of a 100 TB vocabulary never reaches an exchange.
    * The MG pass also carries each partition's row total (sentinel null
    * key), so N costs no extra scan: two passes total over the input.
    */
  def heavyHitters(df: DataFrame, keyCol: String,
                   supportDen: Int = 1000, capacity: Int = 1024): DataFrame = {
    require(supportDen >= 2, s"supportDen=$supportDen must be >= 2")
    require(capacity + 1 >= supportDen,
      s"capacity=$capacity too small for support 1/$supportDen: " +
        "the MG superset guarantee needs capacity+1 >= supportDen")
    val spark = df.sparkSession
    import spark.implicits._
    // Null keys are excluded (SQL GROUP BY would keep a null group, but
    // a null MG survivor would collide with the sentinel row below).
    val keys = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("k")).as[String]
    // (key, 0) per MG survivor; (null, partitionRowCount) sentinel per partition.
    val mg = keys.mapPartitions { it =>
      val counts = new scala.collection.mutable.HashMap[String, Long]()
      var total = 0L
      it.foreach { k =>
        total += 1
        counts.get(k) match {
          case Some(c) => counts.update(k, c + 1)
          case None if counts.size < capacity => counts.update(k, 1L)
          case None => // decrement-all; evict zeros (snapshot keys: no
            // structural mutation of the map mid-iteration)
            counts.keysIterator.toArray.foreach { kk =>
              val c = counts(kk)
              if (c == 1L) counts.remove(kk) else counts.update(kk, c - 1)
            }
        }
      }
      counts.keysIterator.map(k => (k, 0L)) ++ Iterator.single((null: String, total))
    }.toDF("k", "__t")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => mg.unpersist())
    val candidates = mg.filter(col("k").isNotNull).select("k").distinct()
    val totals = mg.filter(col("k").isNull).agg(sum("__t").as("__n"))
    keys.toDF("k")
      .join(broadcast(candidates), Seq("k"), "left_semi")
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals))
      .filter(col("cnt") * supportDen >= col("__n"))
      .select(col("k").as(keyCol), col("cnt"))
  }

  /** Nearest-rank quantile estimates from a sketch: one row (q, q_est)
    * per requested fraction, q_est = the sample value at rank
    * max(1, ceil(q·n)) in (v, u) order. The window runs over the ≤k-row
    * sketch — bounded by construction, never by data size. */
  def quantileEstimate(sketch: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions $qs must lie in (0, 1]")
    val spark = sketch.sparkSession
    import spark.implicits._
    val w = Window.orderBy(col("v"), col("u"))
    val ranked = sketch
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy()))
    ranked.join(broadcast(qs.toDF("q")),
        col("__rn") === greatest(lit(1), ceil(col("q") * col("__n"))))
      .select(col("q"), round(col("v"), 6).as("q_est"))
  }

  /** KMV set-INTERSECTION estimate from two [[kmvSketch]]es (Beyer et
    * al., "On synopses for distinct-value estimation under multiset
    * operations", SIGMOD 2007): the bottom-k of the union is an
    * unbiased size-k sample of the union's distinct hashes, so the
    * fraction of it present in BOTH input sketches estimates the
    * Jaccard similarity, and `J_est · D_union_est` estimates the
    * intersection cardinality. This is the sketch algebra that answers
    * "how many users did both X and Y" from two independently-built
    * per-segment sketches — no second scan of the data.
    *
    * Both sketches must share the build salt and a k >= this k.
    * Output: one row (kmv_intersect_est). Every stage operates on
    * <= k-row inputs (semi-joins + tiny aggregates) — cost is O(k),
    * independent of the sketched data. Exact when the union holds
    * fewer than k hashes (the estimator degenerates to counting). */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame,
                           k: Int = 256): DataFrame = {
    val merged = kmvMerge(Seq(a, b), k)
    val nBoth = merged
      .join(a.select(col("u")), Seq("u"), "left_semi")
      .join(b.select(col("u")), Seq("u"), "left_semi")
      .agg(count(lit(1)).as("__nboth"))
    val mStats = merged.agg(count(lit(1)).as("__nm"))
    kmvEstimate(merged, k).crossJoin(nBoth).crossJoin(mStats)
      // two empty sketches merge to nm = 0; the intersection of two
      // empty sets is 0, not 0/0
      .select(when(col("__nm") > 0,
          round(col("kmv_est") * col("__nboth") / col("__nm"), 6))
        .otherwise(0.0).as("kmv_intersect_est"))
  }

  /** All-pairs group overlap from per-group KMV sketches: for every
    * unordered group pair the estimated union size, intersection size
    * and Jaccard — the source×source / shard×shard contamination
    * matrix ("how much vocabulary/content do these two crawls share")
    * at O(|groups|²·k) cost, INDEPENDENT of data size, where the exact
    * answer is a full |data|×|data| semi-join per pair.
    *
    * Estimator: per pair, the bottom-k of the two sketches' union is a
    * valid KMV sketch of the union ([[kmvMerge]]'s law); the fraction
    * of those k hashes present in BOTH original sketches estimates
    * |A∩B|/|A∪B| (Beyer et al. 2007), so intersection = union-est ×
    * that fraction. Exact when the union holds < k hashes.
    *
    * Scale: one data pass for the grouped sketches; everything after
    * operates on |groups|·k rows (pair fan-out join, per-pair bottom-k
    * window, per-pair aggregate). Output: (group_a, group_b,
    * union_est, intersect_est, jaccard_est), ga < gb. */
  def kmvPairwiseOverlap(df: DataFrame, groupCol: String, keyCol: String,
                         k: Int = 256,
                         salt: String = "graft-kmv"): DataFrame = {
    val s = kmvSketchGrouped(df, groupCol, keyCol, k, salt)
      .select(col(groupCol).as("__g"), col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => s.unpersist())
    val gs = s.select(col("__g")).distinct()
    val pr = gs.select(col("__g").as("ga"))
      .join(gs.select(col("__g").as("gb")), col("ga") < col("gb"))
    val fromA = pr.join(s.withColumnRenamed("__g", "ga"), Seq("ga"))
      .select(col("ga"), col("gb"), col("u"),
        lit(1L).as("__ia"), lit(0L).as("__ib"))
    val fromB = pr.join(s.withColumnRenamed("__g", "gb"), Seq("gb"))
      .select(col("ga"), col("gb"), col("u"),
        lit(0L).as("__ia"), lit(1L).as("__ib"))
    val merged = fromA.unionByName(fromB)
      .groupBy(col("ga"), col("gb"), col("u"))
      .agg(max(col("__ia")).as("__ia"), max(col("__ib")).as("__ib"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("ga"), col("gb")).orderBy(col("u"))))
      .filter(col("__rn") <= k)
    val agg = merged.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("__nm"), max(col("u")).as("__uk"),
        sum(col("__ia") * col("__ib")).as("__nboth"))
    val unionEst = when(col("__nm") < k, col("__nm").cast("double"))
      .otherwise((lit(k) - 1) / col("__uk"))
    agg.select(col("ga").as("group_a"), col("gb").as("group_b"),
      round(unionEst, 6).as("union_est"),
      when(col("__nm") > 0,
        round(unionEst * col("__nboth") / col("__nm"), 6))
        .otherwise(0.0).as("intersect_est"),
      when(col("__nm") > 0,
        round(col("__nboth").cast("double") / col("__nm").cast("double"), 6))
        .otherwise(0.0).as("jaccard_est"))
  }

  // ---- HyperLogLog ------------------------------------------------------

  /** HLL bit budget: the portable hash is 60 bits (15 md5 hex chars), so
    * with 2^b buckets the register word has 60-b bits. */
  private def hllWordBits(b: Int) = 60 - b

  /** alpha_m bias constant (Flajolet et al. 2007, Fig. 3). */
  private def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Portable HyperLogLog register table (Flajolet, Fusy, Gandouet &
    * Meunier, AofA 2007): m = 2^b registers; each key's 60-bit portable
    * hash splits into bucket = h mod m and word w = h div m; the
    * register holds the max over keys of rho(w) = position of the
    * highest set bit counted from the word's top = (60-b) - bitlen(w)
    * + 1 (w = 0 → 60-b+1). bitlen is length(bin(w)) — STRING-exact in
    * both Spark and DuckDB, immune to the float-log2 misrounding a
    * power-of-two word would hit, so a SQL oracle replays the registers
    * bit-for-bit (Spark's own approx_count_distinct HLL is not
    * replayable — that is why this exists beside it and KMV).
    *
    * Registers merge by element-wise MAX: the sketch of a union is the
    * max of the sketches, making this the mergeable per-partition /
    * per-day distinct state at any scale. Output (bucket, m_j), ≤ m
    * rows. Scale: one groupBy over m tiny keys; map-side partial max
    * means each input partition contributes ≤ m rows to the exchange. */
  def hllSketch(df: DataFrame, keyCol: String, b: Int = 6,
                salt: String = "graft-hll"): DataFrame = {
    require(b >= 4 && b <= 16, s"b=$b out of [4,16]")
    val m = 1 << b
    val h = graft.functions.PortableHash.phash(
      concat_ws("|", lit(salt), col(keyCol).cast("string")))
    // word via BIT SHIFT, not floor(h/m): double division drops low bits
    // above 2^53 and the hash is 60-bit
    val w = shiftright(h, b)
    val rho = when(w === 0, lit(hllWordBits(b) + 1))
      .otherwise(lit(hllWordBits(b) + 1) - length(bin(w)))
    df.select(pmod(h, lit(m)).as("bucket"), rho.as("__rho"))
      .groupBy(col("bucket")).agg(max(col("__rho")).as("m_j"))
  }

  /** Merge register tables (same b and salt): element-wise max. */
  def hllMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy(col("bucket")).agg(max(col("m_j")).as("m_j"))

  /** One-row estimate from a register table: raw = alpha_m m² /
    * Σ 2^(−M_j) (absent buckets contribute 2⁰ = 1), with the standard
    * small-range linear-counting correction E = m ln(m/V) when
    * raw ≤ 2.5m and V (empty registers) > 0. */
  def hllEstimate(sketch: DataFrame, b: Int = 6): DataFrame = {
    val m = 1 << b
    sketch.agg(
        sum(pow(lit(2.0), -col("m_j"))).as("__s"),
        count(lit(1)).as("__nb"))
      .select(
        (coalesce(col("__s"), lit(0.0)) + (lit(m) - col("__nb"))).as("__den"),
        (lit(m) - col("__nb")).as("__v"))
      .select(
        round(
          when(lit(hllAlpha(m) * m * m) / col("__den") <= lit(2.5 * m) && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(lit(hllAlpha(m) * m * m) / col("__den")), 6)
          .as("hll_est"))
  }

  /** Per-group register table — the grouped twin of [[hllSketch]]
    * (same split, same registers, so group sketches hllMerge into the
    * global one). ≤ m rows per group. */
  def hllSketchGrouped(df: DataFrame, groupCol: String, keyCol: String,
                       b: Int = 6, salt: String = "graft-hll"): DataFrame = {
    require(b >= 4 && b <= 16, s"b=$b out of [4,16]")
    val m = 1 << b
    val h = graft.functions.PortableHash.phash(
      concat_ws("|", lit(salt), col(keyCol).cast("string")))
    val w = shiftright(h, b)
    val rho = when(w === 0, lit(hllWordBits(b) + 1))
      .otherwise(lit(hllWordBits(b) + 1) - length(bin(w)))
    df.select(col(groupCol), pmod(h, lit(m)).as("bucket"), rho.as("__rho"))
      .groupBy(col(groupCol), col("bucket")).agg(max(col("__rho")).as("m_j"))
  }

  /** One row (group, hll_est) per group from a grouped register table. */
  def hllEstimateGrouped(sketch: DataFrame, groupCol: String,
                         b: Int = 6): DataFrame = {
    val m = 1 << b
    sketch.groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("m_j"))).as("__s"),
        count(lit(1)).as("__nb"))
      .select(col(groupCol),
        (col("__s") + (lit(m) - col("__nb"))).as("__den"),
        (lit(m) - col("__nb")).as("__v"))
      .select(col(groupCol),
        round(
          when(lit(hllAlpha(m) * m * m) / col("__den") <= lit(2.5 * m) && col("__v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
            .otherwise(lit(hllAlpha(m) * m * m) / col("__den")), 6)
          .as("hll_est"))
  }

  /** Cumulative distinct-to-date curve: for each group g in its natural
    * order (a day, a snapshot version), the HLL estimate over the UNION
    * of all groups ≤ g — the corpus-growth / cumulative-DAU curve. Pure
    * register algebra: a prefix-union's sketch is the per-bucket running
    * MAX of the group sketches, so after the one grouped-sketch pass
    * over the data the whole curve costs one window over the
    * (#groups × ≤m)-row register table — metadata scale. The naive
    * alternative (one distinct-count per prefix) rescans the data
    * #groups times; this is the argument for mergeable sketch state in
    * an incremental pipeline, made executable. */
  def hllGrowthCurve(df: DataFrame, groupCol: String, keyCol: String,
                     b: Int = 6, salt: String = "graft-hll"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The register table feeds THREE consumers (group list, bucket list,
    // the densify join); left lazy, each reference re-aggregates the
    // DATA — three full input scans (seen in the executed plan). Persist
    // the ≤ #groups×m-row table so the input is scanned exactly once;
    // releasing is the caller's QueryCleanup contract.
    val sk = hllSketchGrouped(df, groupCol, keyCol, b, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => sk.unpersist())
    // densify to groups × seen-buckets so a bucket's register carries
    // forward through groups that did not touch it (window max skips
    // the left join's nulls); a bucket never seen by any prefix stays
    // absent and contributes the estimator's empty-register term
    val grid = sk.select(col(groupCol)).distinct()
      .crossJoin(sk.select(col("bucket")).distinct())
    val w = Window.partitionBy(col("bucket")).orderBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = grid.join(sk, Seq(groupCol, "bucket"), "left")
      .withColumn("m_j", max(col("m_j")).over(w))
      .filter(col("m_j").isNotNull)
    hllEstimateGrouped(cum, groupCol, b)
  }

  /** ROLLING-window distinct curve: for each group g (a day), the HLL
    * estimate over the union of the trailing `width` groups — rolling
    * 7-day actives, trailing-30-day distinct visitors. [[hllGrowthCurve]]
    * with a bounded frame: a window-union's sketch is the per-bucket MAX
    * over the trailing `width` group sketches (an exact register
    * identity, not an extra approximation — the spec pins window-merge ≡
    * direct window sketch bit-for-bit), so after one data pass the whole
    * curve is a bounded window over the (#groups × ≤m)-row register
    * table. The naive exact form rescans `width` days of raw data per
    * output day — width× the IO at lake scale.
    *
    * Frame semantics are ROW-based over each group's ordered register
    * row (one per (group, bucket) after densify): a gap in the group
    * sequence counts as a member group with an empty sketch. */
  def hllSlidingCurve(df: DataFrame, groupCol: String, keyCol: String,
                      width: Int, b: Int = 6,
                      salt: String = "graft-hll"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(width >= 1, s"hllSlidingCurve: width=$width must be >= 1")
    val sk = hllSketchGrouped(df, groupCol, keyCol, b, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => sk.unpersist())
    val grid = sk.select(col(groupCol)).distinct()
      .crossJoin(sk.select(col("bucket")).distinct())
    val w = Window.partitionBy(col("bucket")).orderBy(col(groupCol))
      .rowsBetween(-(width - 1).toLong, 0)
    val win = grid.join(sk, Seq(groupCol, "bucket"), "left")
      .withColumn("m_j", max(col("m_j")).over(w))
      .filter(col("m_j").isNotNull)
    hllEstimateGrouped(win, groupCol, b)
  }

  /** Distinct-count estimates for EVERY prefix level of a dimension
    * hierarchy — SQL `ROLLUP(dims...) ... count(DISTINCT key)` semantics
    * — from ONE pass over the data. Spark's own rollup + count_distinct
    * runs an Expand that replicates every input row once per grouping
    * set (at 100 TB that is `levels×corpus` rows into the exchange, then
    * a distinct per set); here the data is sketched ONCE at the finest
    * grain and coarser levels are pure register algebra — a union's
    * sketch is the element-wise max of the sketches — so each level is
    * an aggregation of the ≤(finest-groups × m)-row register table,
    * metadata scale. Same registers as [[hllSketchGrouped]] (same b,
    * same salt ⇒ same estimates a per-level direct sketch would give,
    * exactly — max is associative), so a SQL oracle replays every level
    * bit-for-bit.
    *
    * Output: dims (cast to string; null = rolled up, SQL-ROLLUP shape),
    * `level` (number of grouped dims), `hll_est`. */
  def hllRollup(df: DataFrame, dims: Seq[String], keyCol: String,
                b: Int = 6, salt: String = "graft-hll"): DataFrame = {
    require(dims.nonEmpty, "need at least one rollup dimension")
    require(b >= 4 && b <= 16, s"b=$b out of [4,16]")
    val m = 1 << b
    val h = phash(concat_ws("|", lit(salt), col(keyCol).cast("string")))
    val w = shiftright(h, b)
    val rho = when(w === 0, lit(hllWordBits(b) + 1))
      .otherwise(lit(hllWordBits(b) + 1) - length(bin(w)))
    // ONE data pass: registers at the finest grain; every level below
    // re-aggregates this table, so persist it (one consumer per level)
    val fine = df
      .select(dims.map(d => col(d).cast("string").as(d)) ++
        Seq(pmod(h, lit(m)).as("bucket"), rho.as("__rho")): _*)
      .groupBy(dims.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).as("m_j"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.QueryCleanup.register(() => fine.unpersist())
    val levels = (dims.length to 0 by -1).map { lvl =>
      val keep = dims.take(lvl)
      val reg = fine.groupBy(keep.map(col) :+ col("bucket"): _*)
        .agg(max(col("m_j")).as("m_j"))
      val est = reg.groupBy(keep.map(col): _*)
        .agg(sum(pow(lit(2.0), -col("m_j"))).as("__s"),
          count(lit(1)).as("__nb"))
        .select(keep.map(col) ++ Seq(
          (col("__s") + (lit(m) - col("__nb"))).as("__den"),
          (lit(m) - col("__nb")).as("__v")): _*)
      est.select(dims.map(d =>
        (if (keep.contains(d)) col(d) else lit(null).cast("string")).as(d)) ++
        Seq(lit(lvl).as("level"),
          round(
            when(lit(hllAlpha(m) * m * m) / col("__den") <= lit(2.5 * m) && col("__v") > 0,
              lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
              .otherwise(lit(hllAlpha(m) * m * m) / col("__den")), 6)
            .as("hll_est")): _*)
    }
    levels.reduce(_.unionByName(_))
  }
}
