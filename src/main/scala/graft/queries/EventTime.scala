package graft.queries

import graft.{Det, Tables}
import graft.api.Windows
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation queries (SURVEY.md §2.I) — thin
  * instantiations of the graft.api.Windows surface over the `events`
  * table. Batch versions are DuckDB-verifiable; the same expressions run
  * unchanged under readStream (graft.streaming + StreamingSpec).
  *
  * Event-time semantics vs Flink (SURVEY.md §3.3): Spark's watermark is
  * per-query and advances between micro-batches (no in-band per-record
  * watermarks, no allowedLateness knob — the watermark delay IS the
  * lateness allowance). `wnd_late_drop` simulates that model
  * deterministically in batch using arrival order (event_id).
  */
object EventTime {
  type Q = (SparkSession, String) => DataFrame

  private def stdAggs = Seq(count(lit(1)).as("n_events"),
    Det.sumMoney(col("value")).as("sum_value"))

  /** 6 h / 30 min sliding windows per event_type — the namesake operator. */
  def wndSliding(s: SparkSession, d: String): DataFrame =
    Windows.sliding(Tables.events(s, d), "ts", "6 hours", "30 minutes",
        Seq(col("event_type")), stdAggs)
      .orderBy("window_start", "event_type")

  val queries: Map[String, Q] = Map(
    "wnd_tumbling" -> ((s, d) =>
      Windows.tumbling(Tables.events(s, d), "ts", "1 hour",
          Seq(col("event_type")), stdAggs)
        .orderBy("window_start", "event_type")),

    "wnd_sliding" -> (wndSliding _),

    // Session windows, 30 min gap; strict->= gap flag in the oracle
    // matches Spark's merge rule (FIXTURES.md: 946 sessions at sf0.001).
    "wnd_session" -> ((s, d) =>
      Windows.session(Tables.events(s, d), "ts", "30 minutes",
          Seq(col("user_id")), stdAggs)
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .orderBy("user_id", "session_start")),

    // Pane-based two-level sliding aggregation — must equal wnd_sliding
    // bit-for-bit (partial sums stay exact DECIMAL until the final cast),
    // so it shares wnd_sliding's oracle.
    "wnd_pane_twolevel" -> ((s, d) =>
      Windows.slidingByPanes(Tables.events(s, d), "ts", "30 minutes", slots = 12,
          keys = Seq(col("event_type")),
          paneAggs = Seq(count(lit(1)).as("pn"), sum(Det.dec2(col("value"))).as("psum")),
          rollupAggs = Seq(sum(col("pn")).as("n_events"),
            sum(col("psum")).cast("double").as("sum_value")))
        .select("window_start", "window_end", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type")),

    // Simulated-watermark late drop (arrival order = event_id), then 1 h
    // tumbling agg. The sequential arrival-order scan is exactly what the
    // streaming watermark does incrementally.
    "wnd_late_drop" -> ((s, d) =>
      Windows.tumbling(
          Windows.dropLate(Tables.events(s, d), "ts", "event_id", "10 minutes"),
          "ts", "1 hour", Seq(col("event_type")), stdAggs)
        .select("window_start", "event_type", "n_events", "sum_value")
        .orderBy("window_start", "event_type"))
  )

  private val slidingOracle: String =
    """SELECT ws.window_start, ws.window_start + INTERVAL 6 HOUR AS window_end,
      |       e.event_type, count(*) AS n_events,
      |       CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (SELECT unnest(generate_series(TIMESTAMP '2023-12-31 18:00:00',
      |                                    TIMESTAMP '2024-01-31 00:00:00',
      |                                    INTERVAL 30 MINUTE)) AS window_start) ws
      |JOIN events e ON e.ts >= ws.window_start
      |             AND e.ts < ws.window_start + INTERVAL 6 HOUR
      |GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "wnd_tumbling" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
        |       (date_trunc('hour', ts) + INTERVAL 1 HOUR)::TIMESTAMP AS window_end,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    "wnd_sliding" -> slidingOracle,

    "wnd_pane_twolevel" -> slidingOracle,

    "wnd_session" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, value FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
        |                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |                 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessioned AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM sessioned GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "wnd_late_drop" ->
      """WITH a AS (
        |  SELECT event_id, ts::TIMESTAMP AS ts, event_type, value FROM events
        |), hw AS (
        |  SELECT *, max(ts) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS hwm
        |  FROM a
        |), kept AS (
        |  SELECT * FROM hw WHERE ts >= hwm - INTERVAL 10 MINUTE
        |)
        |SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM kept GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
  )
}
