package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage-truncating eager materialization for iterative state — the
  * shared implementation behind `Graph.truncate` and the power-iteration
  * loops, with a SCALE-SAFETY strategy knob.
  *
  * `localCheckpoint(eager = true)` is the right call in local mode and for
  * executor-stable clusters: it materializes the state into executor
  * storage and cuts the logical plan to a leaf (the r16 win — constant
  * plan size per iteration instead of 689-Exchange plans). But the blocks
  * are UNREPLICATED and the lineage is gone, so on a real cluster one
  * executor loss mid-run makes a long iterative job unrecoverable — it
  * fails the query instead of recomputing. At 100 TB, where an iteration
  * chain holds tens of checkpoints across hundreds of executors, that is
  * a near-certainty, so the non-local default switches to RELIABLE
  * `checkpoint(eager = true)` into durable storage (same plan truncation,
  * executor-loss-safe).
  *
  * Strategy conf `spark.graft.truncate`:
  *  - `auto` (default): localCheckpoint when the master is `local[*]`,
  *    reliable checkpoint otherwise;
  *  - `local`: always localCheckpoint (opt back in on a cluster whose
  *    executors are known stable and whose iteration chains are short);
  *  - `reliable`: always reliable checkpoint (belt-and-braces locally,
  *    e.g. for spec coverage of the cluster path).
  *
  * The reliable path needs a checkpoint directory: an already-set
  * `SparkContext.setCheckpointDir` wins, else `spark.graft.checkpointDir`
  * is applied. With neither configured the call falls back to
  * localCheckpoint (with a one-time stderr warning) rather than failing —
  * a missing directory is an operator omission, not a reason to kill the
  * query that happened to trip it. */
object Truncate {

  @volatile private var warnedNoDir = false

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val reliable = spark.conf.get("spark.graft.truncate", "auto") match {
      case "reliable" => true
      case "local"    => false
      case _          => !sc.master.startsWith("local")
    }
    if (!reliable) df.localCheckpoint(eager = true)
    else {
      if (sc.getCheckpointDir.isEmpty)
        spark.conf.getOption("spark.graft.checkpointDir") match {
          case Some(d) => sc.setCheckpointDir(d)
          case None =>
            if (!warnedNoDir) {
              warnedNoDir = true
              System.err.println("[graft] truncate strategy 'reliable' but no " +
                "checkpoint dir (set spark.graft.checkpointDir or " +
                "SparkContext.setCheckpointDir) — falling back to localCheckpoint")
            }
            return df.localCheckpoint(eager = true)
        }
      df.checkpoint(eager = true)
    }
  }
}
