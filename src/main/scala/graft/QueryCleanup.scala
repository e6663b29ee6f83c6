package graft

import scala.util.Try

/** Post-consumption cleanup hooks for `SparkEntry.queries` entries.
  *
  * A query function returns a lazy DataFrame, so a query that caches
  * upstream stages (q88's corpus pipeline) cannot unpersist them itself —
  * the caller has not materialized the plan yet. Instead the query
  * registers a hook here and the harness (Verify after writing each
  * result, Bench after each timed rep, specs directly) drains the
  * registry once the result has been fully consumed.
  *
  * ORDERING CONTRACT: drain() must run only AFTER the query's result has
  * been fully consumed. Hooks that release plain caches are benign to
  * run early (an unpersisted cache merely recomputes), but hooks that
  * release localCheckpoint storage (q76 / the corpus pipeline register
  * these via dedupClustersReleasable) free storage whose LINEAGE WAS
  * TRUNCATED — after such a hook runs, the associated DataFrame is
  * unreadable, not merely slower. drain() swallows hook FAILURES so one
  * broken hook can't strand the rest, but it cannot make an early drain
  * safe.
  */
object QueryCleanup {
  private val hooks = scala.collection.mutable.ArrayBuffer.empty[() => Unit]

  def register(f: () => Unit): Unit = synchronized { hooks += f }

  /** Run and clear all registered hooks (idempotent when empty). */
  def drain(): Unit = synchronized {
    hooks.foreach(f => Try(f()))
    hooks.clear()
  }
}
