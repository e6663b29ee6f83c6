package graft.queries

import graft.Tables
import graft.ops.{DifferentialPrivacy, Multimodal, Similarity, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search, event-time, differential-privacy, and multimodal
  * queries, each with an exact DuckDB oracle. All floating-point results
  * are rounded to 6dp BEFORE any ranking so cross-engine last-ulp
  * differences can never flip an ordering or a hash.
  */
object VectorEventQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NQueries = 8 // query set: vec_id < 8 (broadcast-small)

  val queries: Map[String, Q] = Map(
    // Exact brute-force cosine top-k: broadcast query set, one corpus pass.
    "q38_knn_bruteforce" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.knnBruteForce(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", K)
        .orderBy("qid", "rank")
    }),

    // IVF-style two-level search (nprobe=1, per-label mean centroids).
    "q39_knn_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.knnIvf(e, e.filter(col("vec_id") < NQueries),
        "vec_id", "embedding", "label", K)
        .orderBy("qid", "rank")
    }),

    // Embedding-cosine near-duplicate pairs, cell-bucketed by label (the
    // O(n²)-avoiding shape; threshold tuned to the synthetic data's
    // similarity ceiling so the check is value-bearing at every sf).
    "q56_cosine_near_dup" -> ((s, dir) => {
      Similarity.cosineNearDup(Tables.embeddings(s, dir),
        "vec_id", "embedding", "label", threshold = 0.44)
        .orderBy("id_a", "id_b")
    }),

    // Gap-based sessionization (30-min inactivity gap).
    "q40_sessionize" -> ((s, dir) => {
      TimeSeries.sessionize(Tables.events(s, dir), gapMinutes = 30)
        .select("event_id", "user_id", "session_seq")
        .orderBy("event_id")
    }),

    // Tumbling 1-hour windowed aggregation (batch twin of the streaming
    // path in graft.streaming.EventStream). Window start rendered as a
    // string so timestamp precision never affects the compare.
    "q41_window_agg" -> ((s, dir) => {
      TimeSeries.windowAgg(Tables.events(s, dir), "1 hour")
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // Laplace-mechanism DP count per event_type (deterministic hash-seeded
    // noise — test/oracle mode; see DifferentialPrivacy scaladoc).
    "q42_dp_count" -> ((s, dir) => {
      DifferentialPrivacy.dpCount(Tables.events(s, dir), Seq("event_type"),
        epsilon = 1.0, seed = 42L)
        .orderBy("event_type")
    }),

    // DP sum of `value` clipped to [0, 200], ε=0.5.
    "q43_dp_sum" -> ((s, dir) => {
      DifferentialPrivacy.dpSum(Tables.events(s, dir), Seq("event_type"),
        "value", lo = 0.0, hi = 200.0, epsilon = 0.5, seed = 7L)
        .orderBy("event_type")
    }),

    // Multimodal plumbing: metadata projection of the binary media table
    // (the codegen'd stage; the stubbed decode is unit-tested instead).
    "q44_media_stats" -> ((s, dir) => {
      Multimodal.mediaStats(Multimodal.asMediaTable(Tables.documents(s, dir)))
        .orderBy("doc_id")
    }))

  private def lapSql(value: String, key: String, scale: String) =
    s"""round($value + (-($scale) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 6)
        """.trim.replaceAll("\n\\s*", " ")

  private def uSql(key: String, seed: Long) =
    s"(CAST('0x' || substr(md5($key || '|' || '$seed'), 1, 15) AS BIGINT) % 1000000 + 0.5) / 1000000.0"

  private val knnCore =
    s"""q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < $NQueries)"""

  val oracles: Map[String, String] = Map(
    "q38_knn_bruteforce" ->
      s"""WITH $knnCore,
          sc AS (SELECT qid, e.vec_id, round(list_cosine_similarity(qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM q CROSS JOIN embeddings e WHERE e.vec_id <> qid),
          r AS (SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sc)
          SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, sim FROM r WHERE rank <= $K ORDER BY qid, rank""",
    "q39_knn_ivf" ->
      s"""WITH cent AS (SELECT label, list(round(m, 6) ORDER BY p) AS centroid FROM (
            SELECT label, p, avg(v) AS m FROM (
              SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v, generate_subscripts(embedding, 1) AS p
              FROM embeddings) GROUP BY label, p) GROUP BY label),
          $knnCore,
          routed AS (SELECT qid, qv, label, round(list_cosine_similarity(qv, centroid), 6) AS csim
                     FROM q CROSS JOIN cent),
          best AS (SELECT qid, qv, label FROM (
            SELECT *, row_number() OVER (PARTITION BY qid ORDER BY csim DESC, label) AS r FROM routed) WHERE r = 1),
          sc AS (SELECT qid, e.vec_id, round(list_cosine_similarity(qv, e.embedding::DOUBLE[]), 6) AS sim
                 FROM best b JOIN embeddings e ON e.label = b.label AND e.vec_id <> b.qid),
          r AS (SELECT qid, vec_id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank FROM sc)
          SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, sim FROM r WHERE rank <= $K ORDER BY qid, rank""",
    "q56_cosine_near_dup" ->
      """WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
              FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
          SELECT id_a, id_b, sim FROM p WHERE sim >= 0.44 ORDER BY id_a, id_b""",
    "q40_sessionize" ->
      """SELECT event_id, user_id, CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM (SELECT event_id, user_id, ts,
                  CASE WHEN prev IS NULL OR floor(epoch(ts)) - floor(epoch(prev)) > 1800 THEN 1 ELSE 0 END AS ns
                FROM (SELECT event_id, user_id, ts,
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                      FROM events))
          ORDER BY event_id""",
    "q41_window_agg" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q42_dp_count" ->
      s"""SELECT event_type, ${lapSql("c", "event_type", "1.0")} AS dp_count
          FROM (SELECT event_type, count(*) AS c, ${uSql("event_type", 42L)} AS u
                FROM events GROUP BY event_type)
          ORDER BY event_type""",
    "q43_dp_sum" ->
      s"""SELECT event_type, ${lapSql("sm", "event_type", "200.0 / 0.5")} AS dp_sum
          FROM (SELECT event_type, sum(greatest(least(value, 200.0), 0.0)) AS sm, ${uSql("event_type", 7L)} AS u
                FROM events GROUP BY event_type)
          ORDER BY event_type""",
    "q44_media_stats" ->
      """SELECT doc_id,
                (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS media_type,
                CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                md5(text) AS payload_md5
          FROM documents ORDER BY doc_id""")
}
