// Skew-stress harness (VERDICT r9 #5): demonstrate the two heavy-hitter
// join mitigations side by side on a deliberately Zipf-like key, at 1x
// and 10x volume:
//   (a) plain shuffle join under AQE with skew-join splitting enabled --
//       report runtime AND whether the final adaptive plan actually
//       split the skewed partitions ("skew=true" in the SMJ node);
//   (b) graft.ops.Skew.saltedJoin -- the explicit salting fallback for
//       plans AQE cannot re-split.
// Broadcast is disabled for BOTH paths: the small side here fits under
// the 10 MB broadcast threshold, which in production is the FIRST fix
// for a skewed join; this harness deliberately forces the shuffle-join
// regime where skew actually hurts.
// One-off driver run; results recorded in PERFORMANCE.md.
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.ui.enabled=false -i tools/stress_skew.scala
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
// default skew thresholds: partition > 256MB AND > 5x median; lower the
// floor so the 1x run can also demonstrate activation
spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

// Zipf-like key: k = floor(u^4 * 1000) over a deterministic md5 uniform.
// Key 0 holds ~18% of all rows ((1/1000)^(1/4)); ~1000 tail keys. The
// payload pads rows to make the heavy partition's BYTES skew too (AQE
// splits on bytes, not row counts).
def bigSide(n: Long): DataFrame =
  spark.range(0, n).select(
    col("id"),
    floor(pow(
      (pmod(conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10).cast("long"),
        lit(1000000L)) + 0.5) / 1000000.0, 4.0) * 1000).cast("long").as("k"),
    substring(md5(col("id").cast("string")), 1, 24).as("pad"))

val small = spark.range(0, 1000).select(col("id").as("k"),
  concat(lit("dim_"), col("id")).as("attr")).cache()
small.count()

def time[A](label: String)(f: => A): Unit = {
  val t0 = System.nanoTime()
  val r = f
  val s = (System.nanoTime() - t0) / 1e9
  println(f"STRESS $label $s%.2f s -> $r")
}

def run(tag: String, n: Long): Unit = {
  // (c) the unmitigated baseline: AQE on but skew splitting OFF -- the
  // heavy key's partition runs as one straggler task
  spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
  time(s"join_plain_noskewsplit_$tag") {
    bigSide(n).join(small, Seq("k")).queryExecution.toRdd.count()
  }
  spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  val big = bigSide(n)
  val plain = big.join(small, Seq("k"))
  time(s"join_plain_aqe_$tag") { plain.queryExecution.toRdd.count() }
  val finalPlan = plain.queryExecution.executedPlan.toString
  println(s"STRESS skew_split_active_$tag ${finalPlan.contains("skew=true")}")
  time(s"join_salted_$tag") {
    graft.ops.Skew.saltedJoin(bigSide(n), small, Seq("k"), "id", 32)
      .queryExecution.toRdd.count()
  }
}

run("1x", 20000000L)
run("10x", 200000000L)
System.exit(0)
