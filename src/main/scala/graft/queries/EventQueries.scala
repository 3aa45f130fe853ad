package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time queries over `events` — the batch equivalents of the
  * streaming operators (tumbling windows, sessionization with a gap); the
  * same logic runs as Structured Streaming in graft.streaming with
  * watermarks and state (tested with MemoryStream; no oracle needed there
  * because the batch/stream transforms share this code's semantics). */
object EventQueries {

  import Tables.t

  private val gapMicros = 30L * 60 * 1000 * 1000 // 30-minute session gap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows per event_type
    "e_window_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // sessionization: 30-min-gap sessions per user; per-session stats
    "e_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          // parquet ts is TIMESTAMP_NTZ; cast to (UTC-session) TIMESTAMP for
          // unix_micros — DuckDB's epoch_us treats the naive value identically
          when(col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp")) > gapMicros, 1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy(col("user_id").cast("long").as("user_id"), col("session_seq").as("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).cast("long").as("first_event"),
          max(col("event_id")).cast("long").as("last_event"))
        .orderBy("user_id", "session_seq")
    }),

    // STREAMING sessionizer driven end-to-end (MemoryStream micro-batch
    // replay, event-time-timeout eviction included): per-user total session
    // counts from the timeout-emitted closure rows — must equal the batch
    // sessionizer's per-user session count (graft.streaming.StreamReplay).
    "e_sessionize_stream" -> ((s, dir) => {
      graft.streaming.StreamReplay.sessionCounts(s, t(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id").cast("long").as("user_id"), col("n_sessions"))
        .orderBy("user_id")
    }),

    // STREAMING funnel replay (click -> purchase, effectively unbounded
    // window): per-user completion counts; the oracle runs the same state
    // machine as a recursive CTE.
    "e_funnel_stream" -> ((s, dir) => {
      graft.streaming.StreamReplay.funnelCounts(s, t(s, dir, "events"),
          Seq("click", "purchase"), windowMinutes = 1000000)
        .select(col("user_id").cast("long").as("user_id"), col("n_hits"))
        .orderBy("user_id")
    }),

    // STREAMING exact dedup replay on (user_id, event_type, ts): with an
    // event-time-ordered feed the output is exactly the batch DISTINCT.
    "e_dedup_stream" -> ((s, dir) => {
      graft.streaming.StreamReplay.dedupRows(s, t(s, dir, "events"))
        .select(col("user_id").cast("long").as("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("user_id", "event_type", "ts_us")
    }),

    // per-user event funnel: users who clicked and then purchased (order-aware
    // exists; the streaming analogue is stateful pattern detection)
    "e_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .groupBy("user_id").agg(min("ts").as("first_click"))
      val buys = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(max("ts").as("last_purchase"))
      clicks.join(buys, "user_id")
        .where(col("last_purchase") > col("first_click"))
        .select(col("user_id").cast("long").as("user_id"))
        .orderBy("user_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "e_window_hourly" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*)::BIGINT AS n, (sum(value::DECIMAL(18,2)))::DOUBLE AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e_sessionize" ->
      s"""WITH marked AS (
         |  SELECT user_id, event_id, ts,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapMicros
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |), numbered AS (
         |  SELECT user_id, event_id,
         |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         |  FROM marked)
         |SELECT user_id::BIGINT AS user_id, session_seq::BIGINT AS session_seq,
         |  count(*)::BIGINT AS n_events,
         |  min(event_id)::BIGINT AS first_event, max(event_id)::BIGINT AS last_event
         |FROM numbered GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    "e_sessionize_stream" ->
      s"""WITH marked AS (
         |  SELECT user_id,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapMicros
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id::BIGINT AS user_id, sum(new_session)::BIGINT AS n_sessions
         |FROM marked GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the funnel state machine (click arms, purchase fires) as a per-user
    // recursive scan in event order
    "e_funnel_stream" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |rec(user_id, rn, state, hits) AS (
        |  SELECT user_id, 0, 0, 0 FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT r.user_id, r.rn + 1,
        |    CASE WHEN e.event_type = 'click' AND r.state = 0 THEN 1
        |         WHEN e.event_type = 'purchase' AND r.state = 1 THEN 0
        |         ELSE r.state END,
        |    r.hits + CASE WHEN e.event_type = 'purchase' AND r.state = 1 THEN 1 ELSE 0 END
        |  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT user_id::BIGINT AS user_id, arg_max(hits, rn)::BIGINT AS n_hits
        |FROM rec GROUP BY user_id HAVING arg_max(hits, rn) > 0 ORDER BY user_id""".stripMargin,

    "e_dedup_stream" ->
      """SELECT DISTINCT user_id::BIGINT AS user_id, event_type, epoch_us(ts)::BIGINT AS ts_us
        |FROM events ORDER BY user_id, event_type, ts_us""".stripMargin,

    "e_funnel" ->
      """WITH c AS (SELECT user_id, min(ts) AS first_click FROM events WHERE event_type = 'click' GROUP BY user_id),
        | p AS (SELECT user_id, max(ts) AS last_purchase FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT c.user_id::BIGINT AS user_id FROM c JOIN p ON c.user_id = p.user_id
        |WHERE p.last_purchase > c.first_click ORDER BY user_id""".stripMargin
  )
}
