package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Multimodal
import graft.streaming.EventStreams

/** Multimodal + event-stream operators with DuckDB oracles: the decode
  * stub derives features from bytes only, so the oracle reconstructs them
  * from octet lengths; the streaming transforms run here in batch mode
  * over `events` (identical code plans as a stream — see StreamingSpec
  * for the readStream path) and the oracles replay them as windowed SQL.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary media column + batched per-partition decode (stubbed kernel).
    "q_multimodal_decode" -> ((s, d) => {
      Multimodal.decodeFeatures(s, Tables.load(s, d, "documents"))
        .orderBy("doc_id")
    }),

    // Tumbling event-time window aggregate (watermarked on streams).
    "q_stream_window" -> ((s, d) => {
      EventStreams.windowedAgg(Tables.load(s, d, "events"))
        .orderBy("window_start_us", "event_type")
    }),

    // Gap-based sessionization via flatMapGroupsWithState.
    "q_stream_sessionize" -> ((s, d) => {
      EventStreams.sessionize(s, Tables.load(s, d, "events"))
        .toDF()
        .orderBy("user_id", "start_us")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(unicode(substr(text, 1, 1)) AS INT) AS first_byte,
        |  CAST(64 + octet_length(encode(text)) % 577 AS INT) AS width,
        |  CAST(64 + (octet_length(encode(text)) * 31) % 433 AS INT) AS height,
        |  CASE CAST(octet_length(encode(text)) % 3 AS INT)
        |    WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_stream_window" ->
      """SELECT epoch_us(time_bucket(INTERVAL 10 MINUTE, ts)) AS window_start_us,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_stream_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(value AS DECIMAL(18,4)) AS v,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM m)
        |SELECT user_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
        |  COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin
  )
}
