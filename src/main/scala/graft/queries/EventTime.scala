package graft.queries

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation (SURVEY.md §2.I) — the core surface of
  * a "large window" engine. Batch versions run over the `events` parquet
  * (DuckDB-verifiable); the same expressions run unchanged under
  * `readStream` (see graft.streaming and the ScalaTest streaming suite).
  *
  * Event-time semantics vs Flink (SURVEY.md §3.3): Spark's watermark is
  * per-query and advances between micro-batches (no in-band per-record
  * watermarks, no allowedLateness knob — the watermark delay IS the
  * lateness allowance). `wnd_late_drop` simulates that model
  * deterministically in batch using arrival order (event_id).
  */
object EventTime {
  type Q = (SparkSession, String) => DataFrame

  /** 6 h / 30 min sliding windows per event_type — the namesake operator.
    * Each event lands in 12 windows; Spark's `window()` does the
    * multi-assignment via Expand, aggregation stays partial+final (one
    * shuffle on the window×type key) — no per-key state blow-up at scale.
    */
  def wndSliding(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Det.sumMoney(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val queries: Map[String, Q] = Map(
    "wnd_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Det.sumMoney(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")),

    "wnd_sliding" -> (wndSliding _),

    // Session windows, 30 min gap. Spark merges an event into the open
    // session iff ts < session_end (= last ts + gap); a gap of exactly
    // 30 min starts a new session. The oracle's gaps-and-islands SQL uses
    // the matching strict->= flag (FIXTURES.md verified: 946 sessions at
    // sf0.001).
    "wnd_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), Det.sumMoney(col("value")).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start")),

    // Pane-based large-window optimization (Cutty/Scotty-style slicing):
    // pre-aggregate into 30 min tumbling panes, then roll each pane up
    // into the 12 sliding windows containing it. Partial sums stay exact
    // DECIMAL until the final cast, so the result is bit-identical to
    // wnd_sliding (same oracle). At 100 TB this turns a 12x Expand of raw
    // rows into a 12x Expand of pane rows — the classic slicing win.
    "wnd_pane_twolevel" -> ((s, d) => {
      val panes = Tables.events(s, d)
        .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("pn"), sum(Det.dec2(col("value"))).as("psum"))
        .select(col("window.start").as("pane_start"), col("event_type"), col("pn"), col("psum"))
      panes
        .withColumn("window_start",
          explode(expr("sequence(pane_start - INTERVAL 5 HOURS 30 MINUTES, pane_start, INTERVAL 30 MINUTES)")))
        .groupBy(col("window_start"), col("event_type"))
        .agg(sum(col("pn")).as("n_events"), sum(col("psum")).cast("double").as("sum_value"))
        .select(col("window_start"), (col("window_start") + expr("INTERVAL 6 HOURS")).as("window_end"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // Simulated-watermark late drop: arrival order = event_id (FIXTURES),
    // high-watermark = running max event time, events more than 10 min
    // behind it are dropped, then 1 h tumbling agg. The global
    // arrival-order window is inherently sequential — in production this
    // is exactly what the streaming watermark does incrementally
    // (per-batch max - delay); see stream_tumbling_append.
    "wnd_late_drop" -> ((s, d) => {
      val w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, d)
        .withColumn("hwm", max(col("ts")).over(w))
        .filter(col("ts") >= col("hwm") - expr("INTERVAL 10 MINUTES"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), Det.sumMoney(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    })
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
