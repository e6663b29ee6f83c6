package graft

import scala.collection.mutable

/** Per-query provenance sidecars: a query may record a small JSON payload
  * (chain manifests, batch row counts, a canonical md5 of its collected
  * rows) while it runs; [[Verify]] writes it beside the query's parquet
  * dump as `<name>.provenance.json` AFTER the dump is atomically
  * published. The point is attribution: when a driver gate marks a row
  * red while clean sequential runs pass (the r11–r13 q198 mode), the
  * sidecar pins in one read whether the divergence is the query's math
  * (sidecar md5 differs from a healthy run) or dump/compare corruption
  * (sidecar md5 matches the oracle, the dumped parquet does not).
  *
  * Scoping mirrors [[QueryCleanup]]: payloads attach to the query scope
  * active on the recording thread, so overlapping queries in one JVM can
  * never cross-write each other's sidecars.
  */
object Provenance {

  private val payloads = mutable.LinkedHashMap.empty[String, String]

  /** Record `json` as the active query's provenance payload (last write
    * wins within one invocation). */
  def record(json: String): Unit = {
    val scope = QueryCleanup.activeScope
    synchronized { payloads.update(scope, json) }
  }

  /** Remove and return `name`'s payload, if one was recorded. */
  def drain(name: String): Option[String] =
    synchronized { payloads.remove(name) }
}
