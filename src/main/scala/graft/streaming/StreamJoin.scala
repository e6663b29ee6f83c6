package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join — the attribution shape: match each
  * right-side event (click) to left-side events (impressions) with the
  * same key whose event time precedes it by at most `withinSeconds`.
  * Both sides carry watermarks and the time bound lives INSIDE the join
  * condition — that is what lets Structured Streaming expire buffered
  * state: an impression older than (right watermark − within) can never
  * match again and is dropped from the state store. A time bound applied
  * as a post-join filter would leave both buffers unbounded — the
  * classic stream-join OOM.
  *
  * Column contract: the two inputs use DISTINCT column names (rename
  * upstream, e.g. `imp_ts`/`click_ts`) except the shared `keyCol`;
  * output is left columns + right columns with one `keyCol`.
  *
  * Scale: state per side is (watermark + within) of data hash-partitioned
  * by key — the join itself is an ordinary key exchange. The same call
  * works on BATCH frames (watermarks are no-ops there), which is exactly
  * how the spec proves stream ≡ batch across micro-batch splits. */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String,
                   withinSeconds: Long,
                   watermark: String = "2 hours"): DataFrame = {
    require(withinSeconds > 0, s"withinSeconds=$withinSeconds must be > 0")
    val l = (if (left.isStreaming) left.withWatermark(leftTsCol, watermark)
             else left).as("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTsCol, watermark)
             else right).as("r")
    l.join(r,
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") &&
          col(s"r.$rightTsCol") <=
            col(s"l.$leftTsCol") + expr(s"interval $withinSeconds seconds"))
      .drop(col(s"r.$keyCol"))
  }
}
