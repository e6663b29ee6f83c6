package graft

import org.apache.spark.SparkContext

/** Narrow access point for Spark-internal plumbing the public API doesn't
  * expose. Kept to ONE capability on purpose: draining the async listener
  * bus so per-query metric snapshots (BenchMetrics) don't race stage
  * completion events. Uses reflection rather than a `package org.apache
  * .spark` escape so the project's own namespace stays honest; falls back
  * to a bounded sleep if the internal shape ever changes. */
object SparkInternals {

  def flushListenerBus(sc: SparkContext): Unit =
    try {
      val m = sc.getClass.getMethod("listenerBus")
      val bus = m.invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } catch {
      case _: Throwable => Thread.sleep(500)
    }
}
