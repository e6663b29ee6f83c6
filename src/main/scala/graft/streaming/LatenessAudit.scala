package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Watermark-lateness observability. A watermark is a DATA-LOSS contract:
  * every stateful operator silently drops input rows whose event time is
  * behind it (aggregations and dropDuplicates filter them out;
  * mapGroups/flatMapGroupsWithState state that timed out can no longer
  * absorb them). At 100 TB a skewed or stalled upstream partition makes
  * late data a certainty, so the drops must be OBSERVABLE — a pipeline
  * that can't see its lateness losses reports wrong aggregates with a
  * green status.
  *
  * Spark already meters the drops per stateful operator
  * (`StateOperatorProgress.numRowsDroppedByWatermark`); this object makes
  * them consumable two ways:
  *
  *  - Pull: [[droppedByWatermark]] / [[droppedByOperator]] read a query's
  *    `recentProgress`. Caveat: recentProgress is a bounded ring buffer
  *    (spark.sql.streaming.numRecentProgressUpdates, default 100), so
  *    pull-auditing a long-lived query undercounts once the buffer wraps.
  *  - Push: [[LatenessListener]] accumulates drops per query id through
  *    the StreamingQueryListener bus — unbounded lifetime, the production
  *    path (alert when the counter moves).
  *
  * Lateness SEMANTICS per operator family (what a nonzero count means):
  *  - windowed aggregation ([[EventStream.windowedCounts]] and the DP
  *    release, [[StreamStats]], [[StreamHeavyHitters]]): the dropped row's
  *    window was already finalized — emitted results never revise.
  *  - dropDuplicates ([[StreamDedup]]): a late duplicate of an expired id
  *    would be re-admitted as new; a late FIRST occurrence is lost
  *    entirely.
  *  - flatMapGroupsWithState ([[EventStream.sessionizeStream]],
  *    [[StreamThrottle]]): late rows for an evicted key would open a
  *    fresh state lifetime rather than extend the old one.
  */
object LatenessAudit {

  /** Total input rows dropped by watermark across the query's retained
    * progress history (ALL stateful operators). See the ring-buffer
    * caveat above — for unbounded queries use [[LatenessListener]]. */
  def droppedByWatermark(q: StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator)
      .map(_.numRowsDroppedByWatermark)
      .sum

  /** Per-operator drop totals over the retained progress history, keyed
    * by the operator's name (e.g. "stateStoreSave", "dedupe",
    * "flatMapGroupsWithState"). */
  def droppedByOperator(q: StreamingQuery): Map[String, Long] =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator)
      .toSeq
      .groupBy(_.operatorName)
      .view.mapValues(_.map(_.numRowsDroppedByWatermark).sum)
      .toMap

  /** Push-mode accumulator: register with `spark.streams.addListener`,
    * read [[dropped]] keyed by query id. Progress events arrive on the
    * listener bus AFTER the batch that dropped the rows commits — an
    * audit read immediately after `processAllAvailable` should tolerate
    * that tiny lag (tests poll; production alerting reads periodically). */
  final class LatenessListener extends StreamingQueryListener {
    private val byQuery = new ConcurrentHashMap[java.util.UUID, AtomicLong]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val d = e.progress.stateOperators.iterator.map(_.numRowsDroppedByWatermark).sum
      if (d > 0)
        byQuery.computeIfAbsent(e.progress.id, _ => new AtomicLong(0L)).addAndGet(d)
    }

    /** Cumulative dropped-row count for a query id (0 if never seen). */
    def dropped(id: java.util.UUID): Long =
      Option(byQuery.get(id)).map(_.get()).getOrElse(0L)
  }
}
