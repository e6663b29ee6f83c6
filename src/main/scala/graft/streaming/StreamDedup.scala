package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of `graft.ops.Dedup.exact`: drop documents whose
  * content was already seen, over an unbounded stream.
  *
  * Uses `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
  * streaming dropDuplicates keeps one state row per EVER-seen key
  * forever (same unbounded-state failure the sessionizer had before
  * event-time timeouts), while the within-watermark variant evicts a
  * key's state once the watermark passes its last occurrence + delay.
  * The trade is explicit and documented: a duplicate arriving AFTER its
  * original's state was evicted is emitted again. That is the correct
  * contract for ingest dedup, where duplicates cluster in time (retries,
  * double-delivery, re-crawls within a window); corpus-wide historical
  * dedup is the batch operator's job.
  *
  * State is keyed on the 128-bit content md5 (16 bytes/doc), not the
  * document text — same shuffle/state-size rationale as the batch path.
  */
object StreamDedup {

  /** First-seen-wins content dedup over a watermarked stream.
    * `tsCol` must be the event-time column the watermark is defined on. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__content_md5", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_md5")
      .drop("__content_md5")
}
