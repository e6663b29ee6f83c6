package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 1-D Earth Mover's Distance between a group's empirical distribution of a
  * numeric "position" column and a fixed global distribution.
  *
  * Reference: scipy.stats.wasserstein_distance over integer positions
  * (t-closeness.py:81,200). For sorted positions p_0 < ... < p_m with
  * cumulative masses P, Q, the closed form is
  *   EMD = sum_i |cumP_i - cumQ_i| * (p_{i+1} - p_i).
  *
  * This typed Aggregator holds a position->count map per group (bounded by
  * the sensitive-attribute domain, which is small by construction — 2 values
  * in the reference) and computes the closed form against the broadcast
  * global distribution in `finish`. One shuffle for all groups, map-side
  * partial aggregation included — this replaces the reference's driver-side
  * per-group Python loop (t-closeness.py:110-121), its biggest scalability
  * sin (SURVEY §3).
  *
  * `global` maps position -> probability and must cover every position in
  * the data (it is the dataset-wide distribution, so it does).
  *
  * State bound: the per-group map and the broadcast global dictionary are
  * both capped at [[EmdAggregator.MaxDomain]] positions (enforced at
  * construction). The map-per-group formulation is only the right
  * topology for SMALL ordinal domains; a high-cardinality numeric
  * sensitive column would grow a map per group plus a driver-side
  * collect, an OOM at lake scale. Callers with wider domains must use
  * the windowed closed form ([[graft.ops.TCloseness.groupEmd]]), whose
  * state never leaves executors — [[graft.ops.TCloseness.groupEmdAgg]]
  * probes the domain size and routes there automatically.
  */
class EmdAggregator(global: Map[Double, Double])
    extends Aggregator[Double, Map[Double, Long], Double] {

  require(global.size <= EmdAggregator.MaxDomain,
    s"EmdAggregator: global domain of ${global.size} positions exceeds the " +
      s"${EmdAggregator.MaxDomain}-position state bound — use " +
      "TCloseness.groupEmd (windowed closed form, executor-resident state)")

  private val positions: Array[Double] = global.keys.toArray.sorted

  override def zero: Map[Double, Long] = Map.empty

  override def reduce(b: Map[Double, Long], pos: Double): Map[Double, Long] =
    b.updated(pos, b.getOrElse(pos, 0L) + 1L)

  override def merge(a: Map[Double, Long], b: Map[Double, Long]): Map[Double, Long] =
    b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }

  override def finish(counts: Map[Double, Long]): Double = {
    val total = counts.values.sum.toDouble
    if (total == 0 || positions.length < 2) return 0.0
    var cumP = 0.0 // group
    var cumQ = 0.0 // global
    var emd = 0.0
    var i = 0
    while (i < positions.length - 1) {
      cumP += counts.getOrElse(positions(i), 0L) / total
      cumQ += global(positions(i))
      emd += math.abs(cumP - cumQ) * (positions(i + 1) - positions(i))
      i += 1
    }
    emd
  }

  override def bufferEncoder: Encoder[Map[Double, Long]] =
    Encoders.kryo[Map[Double, Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object EmdAggregator {

  /** Hard cap on the sensitive-attribute domain this formulation will
    * hold as per-group map state (and broadcast as the global
    * dictionary). 1024 positions × ~48 bytes/entry ≈ 48 KiB per group
    * buffer worst-case — safely inside executor memory at any group
    * count, while real ordinal sensitive domains (the reference's is 2)
    * sit far below it. */
  val MaxDomain = 1024

  /** Column form: `df.groupBy(qis).agg(EmdAggregator.emd(globalDist)(col))`. */
  def emd(global: Map[Double, Double]): Column => Column = {
    val fn = udaf(new EmdAggregator(global))
    (c: Column) => fn(c)
  }
}
