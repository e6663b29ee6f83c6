package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for heavy-hitter group keys (SURVEY
  * §7.4 "skewed QI groups at scale").
  *
  * AQE's skew-join splitting handles joins automatically; for AGGREGATES
  * over a skewed key the classic fix is salting: shard each key into
  * `saltBuckets` sub-keys, aggregate the shards (map-side combine now
  * spreads the heavy key over many reducers), then aggregate the shard
  * partials. Semantics are identical to the direct groupBy for any
  * decomposable aggregate; q54 proves it against the plain-SQL oracle.
  *
  * The salt is `pmod(hash(random-ish row attr), buckets)` — here a cheap
  * deterministic spread over an unrelated column so results stay
  * reproducible for the oracle (production would use rand()).
  */
object Skew {

  /** Salted two-stage count/sum per key set. `spreadCol` is any column
    * with per-row variation (an id) used to derive the deterministic salt. */
  def saltedAgg(df: DataFrame, keys: Seq[String], spreadCol: String,
                sumCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(col(spreadCol)), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__pc"), sum(col(sumCol)).as("__ps"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum("__pc").as("n_rows"), round(sum("__ps"), 2).as("sum_value"))
  }

  /** Salted inner JOIN for a shuffle join whose key distribution is
    * heavy-hitter skewed: the big side derives a deterministic salt from
    * `spreadCol`, the small side replicates into ALL `saltBuckets` salt
    * values, and the join runs on (keys, salt) — a heavy key's rows now
    * land on `saltBuckets` reducers instead of one straggler.
    *
    * Semantics are identical to `big.join(small, keys)` for any inputs
    * (every big row meets every matching small row exactly once, in the
    * shard its salt selects); q91's plain-join oracle proves it. Cost:
    * the small side shuffles `saltBuckets`× — size the bucket count to
    * the skew factor, not higher. Spark's own AQE skew-join split is
    * preferred when it applies (sort-merge joins it can re-plan at
    * runtime); this is the explicit fallback for plans AQE can't split
    * or engines where runtime re-planning is off.
    *
    * `keys` must name columns present on BOTH sides (rename upstream). */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 spreadCol: String, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val salted = big.withColumn("__salt",
      pmod(hash(col(spreadCol)), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, (keys :+ "__salt").toSeq).drop("__salt")
  }

  /** Bloom-pruned semi-join: `probe` rows whose `probeKey` appears in
    * `build`'s `buildKey` set — exact semi-join semantics, with a Bloom
    * filter pre-pass so the shuffle only carries probable matches.
    *
    * The regime this targets sits between the two easy cases: the build
    * key set is too large to broadcast as a hash relation (so the semi
    * join becomes a full shuffle of BOTH sides), yet a Bloom filter of
    * it is megabytes (~1.2 bytes/key at 1% fpp). Build once
    * (mergeable sketch, aggregated treewise), broadcast the filter, and
    * drop non-matching probe rows BEFORE the exchange — at a selective
    * key set this removes most of the probe side's shuffle bytes, which
    * is the dominant cost of a 100 TB semi join. The exact semi join
    * then runs over survivors only; false positives (bounded by `fpp`)
    * are eliminated there, false negatives cannot occur, so the result
    * is bit-identical to the plain semi join (q168's oracle proves it).
    * This is Spark's own runtime row-level bloom filtering
    * (spark.sql.optimizer.runtime.bloomFilter.*) made explicit and
    * tunable — that rule only fires on selective joins its cost model
    * recognizes, and its `BloomFilterMightContain` expression is not a
    * public API.
    *
    * Keys are compared through their canonical string render (same
    * convention as the dedup ingest bloom). The filter itself is a
    * bounded driver artifact (like PQ codebooks): `expectedItems` keys
    * at `fpp` ≈ `-1.44·log2(fpp)` bits/key. */
  /** Conservative per-key footprint of a broadcast hash relation — the
    * regime gate's unit (key + hash-map overhead). */
  private val BroadcastKeyBytes = 24L

  def bloomSemiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
                    buildKey: String, expectedItems: Long,
                    fpp: Double = 0.01, forceBloom: Boolean = false): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    val spark = probe.sparkSession
    val semiRight = build.select(col(buildKey).as(probeKey))
    // REGIME GATE (asserted by SkewSpec): when the build key set fits the
    // session's broadcast threshold, the plain semi join already sends
    // every probe row through an EXACT broadcast hash lookup — a bloom
    // pre-pass there is pure overhead (build pass + probe hashing) with
    // zero shuffle saved, which is precisely how the r12 bench measured
    // it (bloom 0.50 s vs plain 0.37 s at 1×). The bloom's regime starts
    // where broadcast ends; below the crossover this IS the plain join.
    val broadcastable =
      expectedItems * BroadcastKeyBytes <=
        spark.sessionState.conf.autoBroadcastJoinThreshold
    if (broadcastable && !forceBloom)
      return probe.join(semiRight, Seq(probeKey), "left_semi")
    // integral keys build/probe the bloom on raw longs (no string render
    // on the 100 TB side); anything else uses the canonical string form
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
    val longKeys = integral.contains(probe.schema(probeKey).dataType) &&
      integral.contains(build.schema(buildKey).dataType)
    val keyCast = if (longKeys) "long" else "string"
    val bloom = build.stat.bloomFilter(col(buildKey).cast(keyCast),
      expectedItems, fpp)
    // the predicate closes over the filter object, so it binds through a
    // per-invocation registry closure (compiled expression — a Scala udf
    // here would sever WholeStageCodegen exactly where the probe scan
    // does its work); the entry is reclaimed after consumption
    val fnName = "graft_bloom_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(fnName,
      args => graft.functions.GraftBloomMightContain(args.head, bloom), "built-in")
    graft.QueryCleanup.register(() =>
      spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(fnName)))
    probe
      .filter(call_function(fnName, col(probeKey).cast(keyCast)))
      .join(semiRight, Seq(probeKey), "left_semi")
  }
}
