package graft.queries

import graft.Tables
import graft.streaming.{EmbRow, Ev, Limit, Rule, StreamOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared query entries for the streaming-stateful operators
  * (SURVEY.md §2.J). Per the contract decision in SURVEY §2 (group J
  * note), each entry returns the batch-equivalent DataFrame — the SAME
  * StreamOps transformation applied to the batch source — while streaming
  * execution (readStream / MemoryStream, watermarks, timers) is covered
  * by the ScalaTest streaming suite. Where the batch equivalent is
  * order-free SQL, an oracle is declared too.
  */
object Streaming {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "stream_tumbling_append" -> ((s, d) =>
      StreamOps.tumblingAgg(Tables.events(s, d))
        .orderBy("window_start", "event_type")),

    "stream_dedup_watermark" -> ((s, d) =>
      StreamOps.dedupByEventId(Tables.events(s, d))
        .orderBy("event_type")),

    // Keep-LAST-row dedup (Flink SQL dedup's other half — ROW_NUMBER
    // ORDER BY rowtime DESC = 1): the newest row per user by
    // (ts, event_id). Batch replay is the declarative per-key max_by
    // (map-side-combining aggregate); the watermark-sealed streaming
    // emission with cross-batch replacement is covered by StreamingSpec.
    "stream_dedup_last" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.dedupKeepLast(ev, streaming = false)
        .toDF()
        .orderBy("user_id")
    }),

    // Dedup-on-INGEST (the streaming form of dedup_minhash_incr): the
    // bucket-keyed stateful matcher emits each arriving doc's
    // agreement count against its buckets' stored firsts
    // (StreamOps.minhashIncrCandidates — state one (id, sig) per
    // occupied bucket); the per-doc min-qualifying-first reduce is a
    // plain downstream agg since a doc's candidates all emit in its
    // arrival batch. Batch replay shares dedup_minhash_incr's oracle;
    // cross-batch bucket carryover is pinned in StreamingSpec.
    "stream_dedup_minhash" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val rows = graft.api.Dedup.minhashBandRows(
          graft.api.Scale.fanout(Tables.documents(s, d)), "doc_id", "text")
        .as[graft.streaming.DocBandRow]
      StreamOps.minhashIncrCandidates(rows, streaming = false).toDF()
        .withColumn("est", col("n_agree").cast("double") / lit(64.0))
        .filter(col("est") >= 0.7)
        .groupBy(col("doc_id"))
        .agg(min(struct(col("first_id"), col("est"))).as("m"))
        .select(col("doc_id"), col("m.first_id").as("duplicate_of"),
          graft.Det.round4(col("m.est")).as("est"))
        .orderBy("doc_id")
    }),

    // SESSION windows under readStream (the one §2.I shape that had no
    // streaming twin — round-14 verdict item): session_window with a
    // watermarked MERGE of open sessions, Spark's native streaming
    // session operator (complete/append via watermark; a
    // late-but-in-watermark event merging two open sessions across
    // batches is pinned in StreamingSpec). Batch replay is
    // plan-identical to wnd_session — identical Windows.session call —
    // so it shares that oracle.
    "stream_session" -> ((s, d) =>
      graft.api.Windows.session(Tables.events(s, d), "ts", "30 minutes",
          Seq(col("user_id")),
          Seq(count(lit(1)).as("n_events"),
            graft.Det.sumMoney(col("value")).as("sum_value")))
        .select("user_id", "session_start", "session_end", "n_events",
          "sum_value")
        .orderBy("user_id", "session_start")),

    // Stream-stream WINDOW join (Flink DataStream join): purchase ⋈
    // click of the same user in the same 1 h tumbling window — the
    // (user, window) equi-join whose streaming state Spark bounds by
    // the watermark's open windows (StreamOps.windowJoin; cross-batch
    // match + replay equality pinned in StreamingSpec). Batch replay
    // is plan-identical to wnd_join, so it shares that oracle.
    "stream_wnd_join" -> ((s, d) =>
      StreamOps.windowJoin(Tables.events(s, d)).orderBy("p_id", "c_id")),

    // UPSERT-source aggregation over the RETRACT stream (Flink
    // changelog semantics): totals per event_type over each user's
    // LATEST event — a grouped aggregate that stays correct as keys
    // update, maintained in streaming by folding ChangeRow deltas
    // (StreamOps.retractDeltas; retraction rows are pinned in
    // StreamingSpec with fold == batch over random splits). Batch
    // replay folds the net "I" changelog — exact integer cents.
    "stream_retract_agg" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.retractDeltas(ev, streaming = false).toDF()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          sum(col("delta_cents")).as("total_cents"))
        .orderBy("event_type")
    }),

    // UPDATING-TABLE JOIN over two retract streams (Flink's
    // two-changelog join — the round-14 verdict item): the per-user
    // latest PURCHASE dynamic table inner-joined to the per-user
    // latest SIGNUP dynamic table, emitted as a changelog in which
    // retractions flow THROUGH the join — when either side updates,
    // the old joined row leaves as "U-" and the new pair arrives as
    // "U+" (StreamOps.retractJoin; StreamingSpec pins the cross-batch
    // retraction where the update lands AFTER the join emitted the
    // old version, and random-split folds == batch). Batch replay:
    // the net "I" changelog — the final joined table, exact cents.
    "stream_retract_join" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.retractJoin(ev, streaming = false).toDF()
        .orderBy("user_id")
    }),

    // Event-time TEMPORAL join (Flink FOR SYSTEM_TIME AS OF / temporal
    // table function join): each purchase enriched with the signup
    // "profile version" CURRENT at its event time (latest signup
    // strictly before it in (ts, event_id) order; nulls when none).
    // Streaming execution is watermark-certified with Flink's
    // state-cleanup rule (StreamOps.temporalJoin; StreamingSpec pins
    // cross-batch version visibility + full-replay equality); batch
    // replay is the declarative strictly-preceding window twin, and no
    // arithmetic touches the values, so the oracle pins both.
    "stream_temporal_join" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.temporalJoin(ev, streaming = false).toDF()
        .orderBy("fact_id")
    }),

    // N:1 UPDATING-TABLE JOIN with retraction FANOUT (round-15 — the
    // general changelog join beyond stream_retract_join's 1:1 case):
    // the per-user latest table joined ON ITS event_type ATTRIBUTE to
    // the per-type latest reference table; when the reference updates,
    // every joined user of that type retracts and re-emits
    // (StreamOps.retractJoinFanout — three chained stateful operators,
    // state = Flink's updating-join row index per join key;
    // StreamingSpec pins the cross-batch fanout, the cross-key move,
    // and random-split folds == batch). Batch replay: the net "I"
    // changelog — the final N:1 joined table, exact cents.
    "stream_retract_join_fanout" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.retractJoinFanout(ev, streaming = false).toDF()
        .orderBy("user_id")
    }),

    // GENERAL N:M UPDATING-TABLE JOIN (round-16 — Flink's full
    // updating join, the capstone of the retract family): the
    // per-user latest table of the EVEN users joined to the per-user
    // latest table of the ODD users on their MUTABLE event_type
    // attribute — neither side keyed by the join key, so the join
    // holds a MapState row index on BOTH sides and ANY update fans
    // out across every joined partner of the other side
    // (StreamOps.retractJoinNm / NmJoinProcessor; StreamingSpec pins
    // both fanout directions, a both-side cross-key move, and
    // sign-weighted folds == batch over random splits). Batch replay:
    // the net "I" changelog — the two latest tables inner-joined on
    // event_type, exact cents.
    "stream_retract_join_nm" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.retractJoinNm(ev, streaming = false).toDF()
        .orderBy("l_user", "r_user")
    }),

    // Inclusive-binding temporal join (round-15 — the reference
    // `FOR SYSTEM_TIME AS OF` parity the strict default documents as a
    // divergence): a version sharing the fact's exact timestamp BINDS
    // (latest version with ts <= fact ts; at equal ts the highest
    // version id wins). Batch replay sorts versions before facts
    // inside the same strictly-preceding frame; the streaming form
    // adjusts only the binding comparator, watermark certificate
    // unchanged (StreamOps.temporalJoin(inclusive = true);
    // StreamingSpec pins the same-timestamp binding divergence).
    "stream_temporal_join_inclusive" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.temporalJoin(ev, streaming = false, inclusive = true).toDF()
        .orderBy("fact_id")
    }),

    // Dynamic-gap session windows under readStream (Flink
    // EventTimeSessionWindows.withDynamicGap's streaming twin —
    // purchases hold a session open 40 min, everything else 20):
    // plan-identical to wnd_session_dynamic in batch, so it shares
    // that oracle; the streaming merge is covered by StreamingSpec's
    // dynamic-gap test.
    "stream_session_dynamic" -> ((s, d) =>
      graft.api.Windows.sessionDynamic(Tables.events(s, d), "ts",
          when(col("event_type") === "purchase", "40 minutes")
            .otherwise("20 minutes"),
          Seq(col("user_id")),
          Seq(count(lit(1)).as("n_events"),
            graft.Det.sumMoney(col("value")).as("sum_value")))
        .select("user_id", "session_start", "session_end", "n_events",
          "sum_value")
        .orderBy("user_id", "session_start")),

    // The namesake two-level pane optimization as a chained streaming
    // aggregation (StreamOps.paneTwoLevel) — batch replay must equal
    // wnd_sliding bit-for-bit, so it shares that oracle; streaming
    // execution (watermark propagation through both stateful levels)
    // is covered by StreamingSpec.
    "stream_pane_twolevel" -> ((s, d) =>
      StreamOps.paneTwoLevel(Tables.events(s, d))
        .orderBy("window_start", "event_type")),

    // The CUMULATE window TVF under readStream (round-16 — Flink
    // SQL's growing cumulative windows, each shipping as ITS OWN end
    // passes the watermark): the slice-assigner StatefulProcessor —
    // per-pane MapState shared by the growing windows, one event-time
    // timer per window end, period-end state clear
    // (StreamOps.cumulate / CumulateProcessor; StreamingSpec pins the
    // cross-batch growth, the empty-prefix skip, the late-drop seal,
    // and full-replay equality). Batch replay is plan-identical to
    // wnd_cumulate, so it shares that oracle.
    // followedByAny under readStream — the one CEP emission mode the
    // seal-aware scan rejects, closed by the TIMER route: an anchor's
    // full alternative set is enumerated exactly once when the
    // watermark passes its WITHIN deadline (StreamOps.cepAny /
    // CepAnyProcessor; StreamingSpec pins the window-close emission,
    // the multi-alternative fan-out, and replay equality). Batch
    // replay is row-identical to event_cep_any's compiled route, so
    // the generated oracle is shared.
    "stream_cep_any" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepAny(ev, Analytic.CepPatterns.any, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id", "end_id", "n_rows", "step_counts")
    }),

    // SCD2 changelog materialization under readStream (Flink's
    // versioned dynamic table — the table temporal joins bind
    // against): each type change CLOSES the open version and emits
    // its [valid_from, valid_to) row exactly once, arrival-eager
    // (closures are final under the in-order contract, which a
    // disordered feed violates LOUDLY); open versions live in one
    // small tuple per user (StreamOps.scd2 / Scd2Processor;
    // StreamingSpec pins cross-batch folding, the loud disorder
    // rejection, and replay equality). Batch replay is
    // ts_scd2_intervals restricted to closed rows — the same
    // construction's oracle wrapped in the closed filter.
    "stream_scd2" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.scd2(ev, streaming = false)
        .orderBy("user_id", "version")
    }),

    // Flink SQL Window Top-N TVF under readStream: top-3 by value per
    // (1 h window, type), per-key state a k-bounded heap, one
    // event-time timer per window end, append-final emission
    // (StreamOps.wndTopk / WndTopkProcessor; StreamingSpec pins
    // cross-batch displacement, watermark sealing, the late drop, and
    // full-replay equality). Batch replay is plan-identical to
    // wnd_topk_per_window, so it shares that oracle.
    "stream_wnd_topk" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.wndTopk(ev, streaming = false)
        .orderBy("window_start", "event_type", "rnk")
    }),

    "stream_cumulate" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cumulate(ev, streaming = false)
        .orderBy("period_start", "window_end", "event_type")
    }),

    "stream_custom_trigger" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.customTrigger(ev, earlyEvery = 5, streaming = false)
        .toDF()
        .orderBy("user_id")
    }),

    // Flink DeltaTrigger (GlobalWindows + DeltaTrigger.of — the
    // TopSpeedWindowing shape): fire whenever the value moved more than
    // 80.00 vs the LAST fire, emitting the running aggregate. The
    // last-fired comparison chain is inherently sequential per key
    // (each fire decides the next baseline), so batch replay is the
    // per-key (ts, event_id)-ordered fold — one key shuffle, O(1)
    // state — and the oracle walks the identical chain with
    // WITH RECURSIVE (depth = per-key row count, 99 max here).
    "stream_delta_trigger" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.deltaTrigger(ev, thresholdCents = 8000L, streaming = false)
        .toDF()
        .orderBy("user_id", "event_id")
    }),

    "stream_interval_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      StreamOps.intervalJoinPairs(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"))
        .orderBy("p_id", "c_id")
    }),

    // Left-outer interval join: every purchase appears; unmatched ones
    // carry a null click id (streaming: emitted once the watermark
    // certifies no match can arrive — see StreamOps.intervalJoinPairs).
    "stream_interval_join_outer" -> ((s, d) => {
      val ev = Tables.events(s, d)
      StreamOps.intervalJoinPairs(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), "left_outer")
        .orderBy(col("p_id"), col("c_id").asc_nulls_first)
    }),

    // Full-outer interval join: unmatched rows on EITHER side appear
    // with null partner columns (streaming: the watermark certifies the
    // null emission on both sides — see StreamOps.intervalJoinPairs).
    "stream_interval_join_full" -> ((s, d) => {
      val ev = Tables.events(s, d)
      StreamOps.intervalJoinPairs(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), "full_outer")
        .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
    }),

    // Keyed two-stream connect (CoProcessFunction analog): per-user
    // limits derived deterministically from the fixture's signup events
    // (each signup sets ITS OWN user's limit to value+20 from its ts);
    // purchase/click events alert when they exceed the limit in effect
    // at their event time, carrying the user's running over-limit
    // count. The oracle is the per-key as-of-join formulation; the
    // two-MemoryStream streaming execution is covered by StreamingSpec.
    "stream_keyed_connect" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val all = Tables.events(s, d)
      val ev = all.filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      val limits = all.filter(col("event_type") === "signup")
        .select(col("event_id").as("limit_id"), col("ts").as("limit_ts"),
          col("user_id"), (col("value") + lit(20.0)).as("limit_value"))
        .as[Limit]
      StreamOps.connectGate(ev, limits, streaming = false)
        .toDF()
        .orderBy("event_id")
    }),

    // Periodic event-time early firing (ContinuousEventTimeTrigger
    // analog): partials every 15 event-time minutes per open (user, 1 h
    // window) under streaming (StreamingSpec asserts their event times
    // and contents); the batch replay — the oracle-gated surface — is
    // the unchanged finals.
    "stream_early_fire" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.earlyFireWindow(ev, streaming = false)
        .toDF()
        .orderBy("user_id", "window_start")
    }),

    // FIRE_AND_PURGE periodic firing (PurgingTrigger analog): state
    // cleared on every 15 min event-time fire, so emissions are
    // per-interval DELTAS of the 1 h window instead of growing
    // partials. Batch replay — the oracle-gated surface — is the
    // per-interval aggregation with exact-micros boundaries; the
    // streaming pane emission and the delta-vs-partial identity are
    // covered by StreamingSpec.
    "stream_early_fire_purge" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.earlyFirePurgeWindow(ev, streaming = false)
        .toDF()
        .orderBy("user_id", "window_start", "fire_ts")
    }),

    // Single-pass side-output routing (OutputTag analog): every event
    // exactly once with a route label — 'late' from the stateful
    // per-user out-of-order detector (14-day horizon under the
    // md5(event_id) arrival scramble; the fixture's generation order is
    // time-ordered, so the scramble is what exercises the late path),
    // 'fail' for error events, 'pass' otherwise.
    "stream_side_outputs" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.sideOutputs(ev,
          arrival = e => org.apache.commons.codec.digest.DigestUtils.md5Hex(e.event_id.toString),
          horizonMinutes = 14 * 24 * 60, failType = "error", streaming = false)
        .toDF()
        .orderBy("event_id")
    }),

    // General-pattern stateful CEP: batch replay of the incremental
    // flatMapGroupsWithState matcher (StreamOps.cepPattern) for the
    // signup{2,} view{1,2} purchase{1,} pattern — row-identical to the
    // compiled gaps-and-islands form, pinned by the same generated
    // oracle as event_cep_quant. Streaming execution (seal-aware
    // incremental emission, cross-batch state carry) is covered by
    // StreamingSpec.
    "stream_cep_pattern" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPattern(ev, Analytic.CepPatterns.quant, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // Relaxed-contiguity stateful CEP: batch replay of the incremental
    // matcher for the followedBy pattern signup{1,} click{1,2}
    // purchase{1,} WITHIN 24 h — pinned by the same generated oracle as
    // event_cep_relaxed (and the stateful matcher is the one form that
    // also supports relaxed + SKIP PAST LAST ROW, which the compiled
    // plan declines).
    "stream_cep_relaxed" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPattern(ev, Analytic.CepPatterns.relaxed, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // AFTER MATCH SKIP TO FIRST in the stateful matcher: batch replay of
    // the seal-aware incremental scan (each Sealed result carries its
    // resume row — the click run's first consumed row) for the same
    // funnel as event_cep_skip_first, pinned by the same generated
    // WITH RECURSIVE oracle. Streaming execution (cross-batch sealing
    // with the gap-row overlap) is covered by StreamingSpec.
    "stream_cep_skip" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPattern(ev, Analytic.CepPatterns.skipFirst, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // CEP pattern GROUP (Flink Pattern.begin(subPattern).times(2)):
    // (view+ click+){2} under strict contiguity, unrolled at
    // construction (the bounded-unroll identity — CepPattern.repeat) to
    // view+ click+ view+ click+ and run by the sequential matcher
    // (repeated symbols, which Cep.compile's run alignment declines).
    // TO NEXT ROW: every position of the anchoring view run emits. The
    // oracle is a hand-written four-run lead() alignment over the same
    // gaps-and-islands run table the generated oracles build — runs
    // tile the row space, so a strict group match IS four consecutive
    // runs with alternating symbols, anchored at each tail position.
    "event_cep_group" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPattern(ev, Analytic.CepPatterns.group, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // MATCH_RECOGNIZE text -> the SEQUENTIAL matcher: the same grouped
    // pattern as event_cep_group, but built by PARSING clause text with
    // repeated variables (`PATTERN (view+ click+ view+ click+)`), which
    // Cep.compile's run alignment declines — proving the SQL front door
    // reaches the per-key matcher (the streaming engine's semantics),
    // not just the compiled gaps-and-islands route. Oracle shared with
    // event_cep_group (the renderer round-trips the group pattern, so
    // the parsed steps are identical — CepSqlSpec pins that).
    "stream_cep_sql" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val pat = graft.api.MatchRecognize
        .parse(graft.api.MatchRecognize.render(Analytic.CepPatterns.group))
        .toSymbolic.get._2
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPattern(ev, pat, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // Streaming general MEASURES (VERDICT r10 item 7): the SAME
    // MATCH_RECOGNIZE text as event_cep_sql_agg — MATCH_NUMBER,
    // match-wide and variable-scoped aggregates, FIRST/LAST offsets,
    // CLASSIFIER — resolved by MrSpec.resolveMeasures and evaluated AT
    // EACH SEALED MATCH'S EMISSION inside the stateful matcher
    // (StreamOps.cepPatternMeasures), so the aggregates flow
    // incrementally with no second stateful stage. Batch replay here;
    // hash-pinned by the SAME oracle as the batch route; streaming
    // emission (cross-batch MATCH_NUMBER, seal-aware aggregate timing)
    // is covered by StreamingSpec.
    "stream_cep_sql_agg" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val spec = graft.api.MatchRecognize.parse(Analytic.CepSql.aggMeasures)
      val (symCol, pat) = spec.toSymbolic.get
      val sm = graft.api.MatchRecognize.streamMeasures(spec)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col(symCol).as("event_type"), col("value"))
        .as[Ev]
      val m = StreamOps.cepPatternMeasures(ev, pat,
        spec.stepElems.map(_.variable), sm, streaming = false).toDF()
      graft.api.MatchRecognize.streamMeasuresSelect(m, spec, "user_id")
        .withColumn("click_sum", graft.Det.round2(col("click_sum")))
        .orderBy("user_id", "start_id")
    }),

    // MEASURES EXPRESSIONS on the streaming route: the same clause as
    // event_cep_sql_expr — hidden sub-measures evaluated at each sealed
    // match's emission, arithmetic applied as a projection. Batch
    // replay shares that key's closed-form islands oracle.
    "stream_cep_sql_expr" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val spec = graft.api.MatchRecognize.parse(Analytic.CepSql.exprMeasures)
      val (symCol, pat) = spec.toSymbolic.get
      val sm = graft.api.MatchRecognize.streamMeasures(spec)
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col(symCol).as("event_type"), col("value"))
        .as[Ev]
      val m = StreamOps.cepPatternMeasures(ev, pat,
        spec.stepElems.map(_.variable), sm, streaming = false).toDF()
      graft.api.MatchRecognize.streamMeasuresSelect(m, spec, "user_id")
        .withColumn("mean_v", graft.Det.round2(col("mean_v")))
        .orderBy("user_id", "start_id")
    }),

    // Streaming ANN SERVING (StreamOps.lshServe — the RAG-ingestion
    // shape): probe vectors stream against the STATIC corpus via a
    // stream-static LSH bucket join, exact-cosine verify, stateless
    // per-batch top-k. Batch replay here IS Similarity.lshTopK (same
    // planes, same tiebreaks), so the key shares sim_lsh_bucketed's
    // generated md5-plane oracle; chopped-stream == batch equality is
    // pinned in StreamingSpec.
    "stream_sim_topk" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val e = Tables.embeddings(s, d)
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding")).as[EmbRow]
      StreamOps.lshServe(e, probes, 5, tables = 8, bits = 6, dim = 64,
          streaming = false)
        .select(col("probe_id"), col("rnk"), col("neighbor_id"),
          graft.Det.round4(col("cos")).as("cos"))
        .orderBy("probe_id", "rnk")
    }),

    // ITERATIVE conditions on the seal-aware streaming route (round-12
    // verdict item 1 — lifts the round-11 exclusion for the bounded
    // class): event_cep_iterative's purchase-anchor / first-higher-
    // successor pattern through StreamOps.cepPatternIterStream —
    // complete first-qualifying resolutions are arrival-fixed (the
    // sealed-membership precondition the exclusion cited), pending
    // anchors fail at the WITHIN horizon. Batch replay here shares the
    // independent row_number-first-successor oracle; the cross-batch
    // seal behavior (anchor and qualifying successor in different
    // batches) is pinned in StreamingSpec.
    "stream_cep_iter" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPatternIterStream(ev, Analytic.CepPatterns.iter,
          Analytic.CepPatterns.iterConds, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // QUANTIFIED iterative conditions on the seal-aware streaming
    // route (round-13 verdict item 2 — generalizes stream_cep_iter
    // beyond all-{1,1}): a greedy contiguous purchase run of 1-2 rows
    // anchors, the successor's predicate references the run's FIRST
    // row. Streaming emission uses the wildcard-probe seal test
    // (StreamOps.cepPatternIterStream) — an anchor seals when the
    // bare re-walk agrees with the all-satisfying-future probe walk,
    // which covers tail-touching greedy runs exactly. Batch replay
    // here; the independent run-arithmetic oracle below; cross-batch
    // splits THROUGH the quantified run boundary are pinned in
    // StreamingSpec.
    "stream_cep_iter_quant" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPatternIterStream(ev, Analytic.CepPatterns.iterQuant,
          Analytic.CepPatterns.iterQuantConds, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // Bounded ALTERNATION on the seal-aware stateful matcher (round-12
    // item 2): the SAME clause text as event_cep_alt — branches
    // expanded at parse, probed per anchor in declaration order, a
    // sealed branch emitting only when no more-preferred branch is
    // still pending (the stateful form of the batch leftmost-branch
    // dedup). Batch replay here shares event_cep_alt's generated
    // oracle; cross-batch branch resolution is pinned in StreamingSpec.
    "stream_cep_alt" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val spec = graft.api.MatchRecognize.parse(Analytic.CepSql.altFunnel)
      val branches = spec.expandBranches.map(_.toSymbolic.get)
      val symCol = branches.head._1
      require(branches.forall(_._1 == symCol),
        "alternation branches must share one symbol column")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col(symCol).as("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPatternAlt(ev, branches.map(_._2), streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // SQL:2016 PERMUTE on the seal-aware stateful matcher (the
    // streaming sibling of event_cep_sql_permute): PERMUTE(c, v, p)
    // IS bounded alternation over the 3! expanded orderings, so the
    // branch-probing matcher behind stream_cep_alt executes it
    // unchanged — expandBranches emits the orderings in the same
    // declaration order the batch union deduplicates by, so a
    // contested anchor resolves to the same earliest ordering. Batch
    // replay shares event_cep_sql_permute's per-branch oracle.
    "stream_cep_permute" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val spec = graft.api.MatchRecognize.parse(Analytic.CepSql.permuteFunnel)
      val branches = spec.expandBranches.map(_.toSymbolic.get)
      val symCol = branches.head._1
      require(branches.forall(_._1 == symCol),
        "PERMUTE branches must share one symbol column")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col(symCol).as("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPatternAlt(ev, branches.map(_._2), streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // Pattern exclusion {- click+ -} on the seal-aware matcher (the
    // streaming sibling of event_cep_sql_exclude): exclusion is an
    // OUTPUT filter by SQL:2016 semantics — matching is unchanged, so
    // the stateful ALL-ROWS matcher runs the un-excluded pattern and
    // the excluded variables' rows are dropped at emission with `pos`
    // keeping the original consumption numbering (the same post-filter
    // MatchRecognize.applyExclusion applies on the batch routes).
    // Batch replay shares event_cep_sql_exclude's islands oracle.
    "stream_cep_exclude" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val spec = graft.api.MatchRecognize.parse(Analytic.CepSql.exclAllRows)
      val (symCol, pat) = spec.toSymbolic.get
      val exVars = spec.elems.filter(e => e.excluded && !e.isGap)
        .flatMap(e => if (e.altVars.nonEmpty) e.altVars else Seq(e.variable))
      require(exVars.nonEmpty, "exclAllRows must carry an exclusion")
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col(symCol).as("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPatternAllRows(ev, pat,
          spec.stepElems.map(_.variable), streaming = false).toDF()
        .filter(!col("step").isin(exVars: _*))
        .select(col("user_id"), col("end_id").as("purchase_id"), col("pos"),
          col("event_id"), col("ts"), col("step"), col("value"))
        .orderBy("user_id", "purchase_id", "pos")
    }),

    // ALL ROWS PER MATCH on the seal-aware matcher (the row-level
    // sibling of stream_cep_sql_agg): the SAME clause text as
    // event_cep_sql_allrows, rows emitted per SEALED match with the
    // strict span tiled into per-step scopes. Batch replay shares the
    // batch route's islands oracle; streaming emission timing is in
    // StreamingSpec.
    "stream_cep_allrows" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val spec = graft.api.MatchRecognize.parse(Analytic.CepSql.allRows)
      val (symCol, pat) = spec.toSymbolic.get
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col(symCol).as("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPatternAllRows(ev, pat,
          spec.stepElems.map(_.variable), streaming = false).toDF()
        .select(col("user_id"), col("end_id").as("purchase_id"), col("pos"),
          col("event_id"), col("ts"), col("step"), col("value"))
        .orderBy("user_id", "purchase_id", "pos")
    }),

    // Flink Evictor analog (window + CountEvictor.of(3)): per (user, 1 h
    // tumbling window), the aggregate over only the LAST 3 events by
    // event time, plus the full seen count. Batch replay of the bounded
    // keep-last-N fold (StreamOps.evictorWindow); the streaming form
    // (transformWithState ListState + per-window event-time timer on
    // RocksDB) is covered by StreamingSpec.
    "stream_evictor" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.evictorWindow(ev, keepN = 3, streaming = false)
        .toDF()
        .orderBy("user_id", "window_start")
    }),

    // Flink sliding count window (countWindow(20, 5) = GlobalWindows +
    // CountTrigger.of(5) + CountEvictor.of(20)): every 5th event per
    // user fires the aggregate over the last min(arrivals, 20) events.
    // Batch replay of the bounded trigger/evictor fold
    // (StreamOps.countSlideWindow); the streaming form
    // (transformWithState ListState buffer + counter, data-driven
    // firing under TimeMode.None on RocksDB) is covered by
    // StreamingSpec. Same oracle as the wnd_count_sliding frame form —
    // the fold and the frame are provably the same function.
    "stream_count_slide" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.countSlideWindow(ev, size = 20, slide = 5, streaming = false)
        .toDF()
        .orderBy("user_id", "fire_seq")
    }),

    // Flink SQL event-time OVER aggregation (`sum(..) OVER (PARTITION BY
    // user ORDER BY rowtime RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND
    // CURRENT ROW)` — RowTimeRangeBoundedPrecedingFunction): every event
    // row emits its user's trailing-7-day count and exact-cents sum.
    // Batch replay of the per-timestamp-group fold (StreamOps.overAgg);
    // the incremental streaming form (pending buffer + per-ms event-time
    // timers + frame-bounded retained state on RocksDB) is covered by
    // StreamingSpec. Equal-ts rows are RANGE peers in both engines.
    "stream_over_agg" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.overAgg(ev, frameUs = 7L * 24 * 3600 * 1000000L, streaming = false)
        .toDF()
        .orderBy("user_id", "event_id")
    }),

    // Flink SQL event-time OVER aggregation, ROWS flavor
    // (RowTimeRowsBoundedPrecedingFunction): each event row emits the
    // count/exact-cents sum over itself and its user's previous 9 rows
    // in (ts, event_id) order — the canonical last-N-transactions
    // feature. Ties are NOT peers (unlike stream_over_agg's RANGE
    // form); retained streaming state is the last ≤10 rows per key, a
    // constant bound. Batch replay of the same fold (StreamOps
    // .overRows); incremental form covered by StreamingSpec.
    "stream_over_rows" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.overRows(ev, n = 10, streaming = false)
        .toDF()
        .orderBy("user_id", "event_id")
    }),

    // Flink SQL event-time OVER aggregation, UNBOUNDED-preceding flavor
    // (RowTimeUnboundedPrecedingFunction): each event row emits its
    // user's running count/exact-cents sum from the first row, in
    // (ts, event_id) order. The O(1)-state member of the OVER family —
    // retained state is one (count, cents) pair per key. Batch replay
    // of the same running fold (StreamOps.overUnbounded); incremental
    // form covered by StreamingSpec.
    "stream_over_unbounded" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.overUnbounded(ev, streaming = false)
        .toDF()
        .orderBy("user_id", "event_id")
    }),

    // Flink SQL continuous Top-N (`row_number() OVER (PARTITION BY type
    // ORDER BY sum(value) DESC) <= 3` maintained over an update stream):
    // the per-type top-3 users by running exact-cents total. Batch
    // replay emits the final ranking (fire_seq dropped — it numbers the
    // streaming update emissions, covered by StreamingSpec along with
    // cross-batch MapState carry). See StreamOps.topNByType for the
    // rank-operator placement law and the 100 TB pre-aggregation note.
    "stream_topn" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.topNByType(ev, k = 3, streaming = false)
        .toDF()
        .select("event_type", "rnk", "user_id", "total")
        .orderBy("event_type", "rnk")
    }),

    // Multi-input watermark propagation: two independently-watermarked
    // streams union into one windowed agg; the downstream watermark is
    // the MIN of the inputs' (Spark's multipleWatermarkPolicy default,
    // Flink's min-of-inputs rule), so one lagging source holds every
    // window open instead of racing siblings dropping its late rows.
    // Batch replay = plain union + tumbling agg; the min rule itself
    // is StreamingSpec's. See StreamOps.unionMinWatermark.
    "stream_union_min_watermark" -> ((s, d) => {
      val ev = Tables.events(s, d)
      StreamOps.unionMinWatermark(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"))
        .orderBy("window_start", "event_type")
    }),

    // Watermark IDLENESS escape (Flink WatermarkStrategy.withIdleness,
    // VERDICT r16 missing #1): the min-of-inputs union where a source
    // stalled for more than the idle bound (measured in the SIBLING'S
    // event time — deterministic, replay-stable) stops holding
    // downstream windows open. Heartbeat-union mechanism and the
    // two-phase stall/rejoin behavior are StreamingSpec's; batch
    // replay = plain union + tumbling agg (heartbeats are watermark
    // metadata only). See StreamOps.unionIdleWatermark.
    "stream_union_idle" -> ((s, d) => {
      val ev = Tables.events(s, d)
      StreamOps.unionIdleWatermark(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"))
        .orderBy("window_start", "event_type")
    }),

    // DELETE/TOMBSTONE propagation (GDPR erasure through a keyed
    // aggregate — the changelog axis the upsert-fed retract family
    // never fires): a sparse delete marker retracts the user's entire
    // prior contribution as "D" rows and blocks future ones. Batch
    // replay = the compacted changelog (tombstoned users net to
    // nothing; clean users one "I" per type); arrival-order streaming
    // emission and the zero-net-fold property are StreamingSpec's.
    // See StreamOps.tombstoneChangelog.
    "stream_tombstone" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.tombstoneChangelog(ev, streaming = false)
        .toDF()
        .orderBy("user_id", "event_type")
    }),

    // Retract-stream continuous Top-N (the changelog twin of
    // stream_topn — Flink's RetractableTopNFunction into a retract
    // sink): each fire emits only the CHANGED rank slots as U-/U+
    // pairs (I on first fill), so a materializing consumer applies
    // |changed| rows, not k. Batch replay = the final ranking as "I"
    // rows; per-slot diff emission and sign-weighted reconstruction
    // are StreamingSpec's. See StreamOps.topNRetract.
    "stream_topn_retract" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.topNRetract(ev, k = 3, streaming = false)
        .toDF()
        .orderBy("event_type", "rnk")
    }),

    // Flink LOOKUP JOIN (FOR SYSTEM_TIME AS OF proctime): facts resolve
    // against the dim's CURRENT contents. Batch replay is the broadcast
    // left join (fixture user_ids all resolve; StreamingSpec pins the
    // miss->null row and the per-batch dim refresh via foreachBatch —
    // see StreamOps.lookupJoin for the freshness contract). The dim
    // broadcasts — the fact side never shuffles, the 100 TB lookup
    // shape.
    "stream_lookup_join" -> ((s, d) =>
      StreamOps.lookupJoin(
        Tables.events(s, d)
          .select("event_id", "user_id", "event_type", "value"),
        Tables.customer(s, d))
        .orderBy("event_id")),

    // Flink broadcast-state pattern: a rule stream carrying dynamic
    // thresholds joined to the event stream — alerts where the event
    // value exceeds the threshold in effect at its event time. Rules
    // are derived deterministically from the fixture's signup events
    // (even ids arm the purchase threshold, odd ids the click one, at
    // value+20); batch replay of the keyed rule fold
    // (StreamOps.ruleAlerts); two-MemoryStream streaming execution is
    // covered by StreamingSpec. The oracle is the broadcast as-of-join
    // formulation — the 100 TB batch shape (rules broadcast, events
    // resolve map-side).
    "stream_broadcast_rules" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val all = Tables.events(s, d)
      val ev = all.filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      val rules = all.filter(col("event_type") === "signup")
        .select(col("event_id").as("rule_id"), col("ts").as("rule_ts"),
          when(pmod(col("event_id"), lit(2)) === 0, "purchase").otherwise("click")
            .as("target_type"),
          (col("value") + lit(20.0)).as("threshold"))
        .as[Rule]
      StreamOps.ruleAlerts(ev, rules, streaming = false)
        .toDF()
        .orderBy("event_id")
    }),

    // Value-predicate stateful CEP: the SimpleCondition route under the
    // incremental matcher — the pattern's CASE derivation maps the
    // stream to derived symbols, then the ordinary seal-aware matcher
    // runs unchanged (StreamingSpec covers streaming emission). Batch
    // replay pinned by the same generated oracle as event_cep_where.
    "stream_cep_where" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val pat = Analytic.CepPatterns.where
      val ev = Tables.events(s, d)
        .withColumn("event_type", expr(pat.caseSql))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepPattern(ev, pat.symbolic, streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    }),

    // MEASURES under seal-aware incremental emission: the stateful
    // sibling of event_cep_measures — batch replay shares its oracle;
    // cross-batch sealed emission with value-carrying buffer state is
    // covered by StreamingSpec (StreamOps.cepMeasuresStream).
    "stream_cep_measures" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepMeasuresStream(ev, withinMinutes = 10, streaming = false)
        .toDF()
        .orderBy("user_id", "purchase_id")
    }),

    // Stateful CEP (Flink CEP `C+ P WITHIN 10 min`): batch replay of the
    // flatMapGroupsWithState pattern matcher — row-identical to the
    // event_cep gaps-and-islands rewrite, which is what the oracle pins.
    // Streaming execution (incremental runs, state pruning, cross-batch
    // carryover) is covered by StreamingSpec.
    "stream_cep" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepRunThenFinal(ev, withinMinutes = 10)
        .toDF()
        .orderBy("user_id", "purchase_id")
    }),

    // CEP TIMEOUT SIDE OUTPUT under readStream (Flink
    // PatternStream.select(timeoutTag, PatternTimeoutFunction, ...)):
    // signup → click partial matches whose 12 h window expires with no
    // purchase, emitted by event-time timers at their deadlines
    // (StreamOps.cepTimeout / CepTimeoutProcessor; StreamingSpec pins
    // the cross-batch cancellation, the timer-gated emission, the
    // same-timestamp tie, and full-replay equality). Batch replay is
    // row-identical to event_cep_timeout's anti-join, sharing its
    // generated oracle.
    "stream_cep_timeout" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Ev]
      StreamOps.cepTimeout(ev, Analytic.CepPatterns.timeoutPrefix,
          "purchase", streaming = false)
        .toDF()
        .orderBy("user_id", "start_id")
    })
  )

  /** Hand-written group-repetition replay for (view+ click+){2} — four
    * consecutive runs with the unrolled alternation, one match per
    * anchoring-run position. Shared by event_cep_group (DSL-built) and
    * stream_cep_sql (the same pattern PARSED from MATCH_RECOGNIZE text).
    */
  private val groupOracle: String =
    """WITH e AS (SELECT user_id AS k, ts::TIMESTAMP AS ts, event_id AS ord,
        |            event_type AS sym FROM events),
        |f AS (SELECT *, CASE WHEN lag(sym) OVER (PARTITION BY k ORDER BY ts, ord)
        |                     IS DISTINCT FROM sym THEN 1 ELSE 0 END AS chg FROM e),
        |r AS (SELECT *, sum(chg) OVER (PARTITION BY k ORDER BY ts, ord
        |                               ROWS UNBOUNDED PRECEDING) AS rid FROM f),
        |p AS (SELECT *, row_number() OVER (PARTITION BY k, rid ORDER BY ts, ord) AS pos
        |      FROM r),
        |runs AS (SELECT k, rid, any_value(sym) AS sym, count(*) AS len
        |         FROM p GROUP BY k, rid),
        |seq AS (SELECT *, lead(sym, 1) OVER w AS sym_2, lead(len, 1) OVER w AS len_2,
        |               lead(sym, 2) OVER w AS sym_3, lead(len, 2) OVER w AS len_3,
        |               lead(sym, 3) OVER w AS sym_4, lead(len, 3) OVER w AS len_4
        |        FROM runs WINDOW w AS (PARTITION BY k ORDER BY rid)),
        |cand AS (SELECT * FROM seq WHERE sym = 'view' AND sym_2 = 'click'
        |                            AND sym_3 = 'view' AND sym_4 = 'click'),
        |ends AS (SELECT c.*, pe.ord AS end_id, pe.ts AS end_ts
        |         FROM cand c JOIN p pe ON pe.k = c.k AND pe.rid = c.rid + 3
        |                              AND pe.pos = c.len_4)
        |SELECT en.k AS user_id, pa.ord AS start_id, pa.ts AS start_ts,
        |       en.end_id, en.end_ts,
        |       (en.len - pa.pos + 1) + en.len_2 + en.len_3 + en.len_4 AS n_rows,
        |       concat_ws(',', en.len - pa.pos + 1, en.len_2, en.len_3, en.len_4)
        |         AS step_counts
        |FROM ends en JOIN p pa ON pa.k = en.k AND pa.rid = en.rid
        |ORDER BY user_id, start_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // window join: plan-identical to the batch wnd_join key
    "stream_wnd_join" -> EventTime.oracles("wnd_join"),
    // streaming session windows: batch replay is plan-identical to
    // wnd_session (same Windows.session call), so the oracle is shared
    "stream_session" -> EventTime.oracles("wnd_session"),
    // retract-agg: totals over each user's latest row; DuckDB round()
    // is half-away-from-zero vs Spark's HALF_UP — identical on the
    // non-negative fixture values (the documented cents idiom)
    "stream_retract_agg" ->
      """WITH l AS (
        |  SELECT user_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |  WHERE rn = 1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,
    // retract join: each side's latest row by (ts, event_id) per user,
    // inner-joined — the net changelog of the final joined table
    "stream_retract_join" ->
      """WITH f AS (
        |  SELECT user_id, event_id AS fact_id,
        |         CAST(round(value * 100) AS BIGINT) AS fact_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events WHERE event_type = 'purchase')
        |  WHERE rn = 1),
        |v AS (
        |  SELECT user_id, event_id AS version_id,
        |         CAST(round(value * 100) AS BIGINT) AS version_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events WHERE event_type = 'signup')
        |  WHERE rn = 1)
        |SELECT f.user_id, f.fact_id, f.fact_cents,
        |       v.version_id, v.version_cents,
        |       'I' AS kind, CAST(1 AS BIGINT) AS sign
        |FROM f JOIN v ON f.user_id = v.user_id
        |ORDER BY f.user_id""".stripMargin,
    // temporal join: the same strictly-preceding window formulation —
    // last_value IGNORE NULLS over ROWS UNBOUNDED PRECEDING..1
    // PRECEDING mirrors Spark's last(ignoreNulls).over(-1 frame)
    "stream_temporal_join" ->
      """WITH w AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type, value,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END
        |               IGNORE NULLS) OVER win AS version_id,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts::TIMESTAMP END
        |               IGNORE NULLS) OVER win AS version_ts,
        |    last_value(CASE WHEN event_type = 'signup' THEN value END
        |               IGNORE NULLS) OVER win AS version_value
        |  FROM events WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id AS fact_id, ts AS fact_ts,
        |       value AS fact_value, version_id, version_ts, version_value
        |FROM w WHERE event_type = 'purchase' ORDER BY fact_id""".stripMargin,
    // fanout retract join: the per-user latest table N:1-joined on
    // event_type to the per-type latest reference row
    "stream_retract_join_fanout" ->
      """WITH l AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS user_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |  WHERE rn = 1),
        |r AS (
        |  SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) AS type_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |          ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |  WHERE rn = 1)
        |SELECT l.user_id, l.event_type, l.user_cents, r.type_cents,
        |       'I' AS kind, CAST(1 AS BIGINT) AS sign
        |FROM l JOIN r ON l.event_type = r.event_type
        |ORDER BY l.user_id""".stripMargin,
    // N:M retract join: each parity side's latest row per user,
    // inner-joined on the mutable event_type attribute — the net
    // changelog of the final joined table
    "stream_retract_join_nm" ->
      """WITH l AS (
        |  SELECT user_id AS l_user, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS l_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events WHERE user_id % 2 = 0)
        |  WHERE rn = 1),
        |r AS (
        |  SELECT user_id AS r_user, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS r_cents
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |          ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events WHERE user_id % 2 = 1)
        |  WHERE rn = 1)
        |SELECT l.l_user, r.r_user, l.event_type, l.l_cents, r.r_cents,
        |       'I' AS kind, CAST(1 AS BIGINT) AS sign
        |FROM l JOIN r ON l.event_type = r.event_type
        |ORDER BY l.l_user, r.r_user""".stripMargin,
    // inclusive temporal join: versions sort BEFORE facts at equal ts
    // (the flag column), so the same strictly-preceding ROWS frame
    // binds a same-timestamp version — the FOR SYSTEM_TIME AS OF rule
    "stream_temporal_join_inclusive" ->
      """WITH w AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type, value,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END
        |               IGNORE NULLS) OVER win AS version_id,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts::TIMESTAMP END
        |               IGNORE NULLS) OVER win AS version_ts,
        |    last_value(CASE WHEN event_type = 'signup' THEN value END
        |               IGNORE NULLS) OVER win AS version_value
        |  FROM events WINDOW win AS (PARTITION BY user_id
        |    ORDER BY ts, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END,
        |             event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id AS fact_id, ts AS fact_ts,
        |       value AS fact_value, version_id, version_ts, version_value
        |FROM w WHERE event_type = 'purchase' ORDER BY fact_id""".stripMargin,
    // dynamic-gap streaming sessions: batch replay is plan-identical
    // to wnd_session_dynamic, so the oracle is shared
    "stream_session_dynamic" -> EventTime.oracles("wnd_session_dynamic"),
    // streaming CUMULATE: batch replay is plan-identical to
    // wnd_cumulate, so the oracle is shared
    "stream_cumulate" -> EventTime.oracles("wnd_cumulate"),
    // CEP timeout batch replay = the batch anti-join's generated oracle
    "stream_cep_timeout" -> Analytic.oracles("event_cep_timeout"),
    // streaming Window Top-N: batch replay is plan-identical to
    // wnd_topk_per_window, so the oracle is shared
    "stream_wnd_topk" -> EventTime.oracles("wnd_topk_per_window"),
    // streaming followedByAny: batch replay = the batch compiled
    // route's generated oracle
    "stream_cep_any" -> Analytic.oracles("event_cep_any"),
    // SCD2 materialization: the batch construction's oracle restricted
    // to CLOSED versions (open versions live in state, not output)
    "stream_scd2" ->
      s"""SELECT * FROM (
         |${EventTime.oracles("ts_scd2_intervals")}
         |) WHERE valid_to IS NOT NULL ORDER BY user_id, version""".stripMargin,
    "stream_cep_measures" -> Analytic.oracles("event_cep_measures"),
    // streaming general MEASURES: batch replay must equal the batch
    // general-MEASURES route exactly — same hand-written islands oracle
    "stream_cep_sql_agg" -> Analytic.oracles("event_cep_sql_agg"),
    // row-level streaming CEP batch replay = the batch islands oracle
    "stream_cep_allrows" -> Analytic.oracles("event_cep_sql_allrows"),
    // streaming MEASURES expressions = the batch closed-form oracle
    "stream_cep_sql_expr" -> Analytic.oracles("event_cep_sql_expr"),
    "stream_cep_alt" -> Analytic.oracles("event_cep_alt"),
    // iterative-condition batch replay = the independent first-higher-
    // successor oracle shared with event_cep_iterative
    "stream_cep_iter" -> Analytic.oracles("event_cep_iterative"),
    // Independent run-arithmetic replay of the QUANTIFIED iterative
    // pattern (p_run{1,2} greedy contiguous, then the first later
    // purchase above the run's FIRST value, WITHIN as a FILTER on that
    // first-qualifying successor — walkAlt commits to the first
    // satisfying run and only then checks WITHIN): acnt = 2 iff the
    // row immediately after the anchor is a purchase (greedy cap 2),
    // the successor scan starts after the run, and every purchase row
    // anchors independently under SKIP TO NEXT ROW.
    "stream_cep_iter_quant" ->
      """WITH t AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
        |    event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |a AS (SELECT c.user_id, c.event_id, c.ts, c.value, c.rn,
        |        CASE WHEN n.event_type = 'purchase' THEN 2 ELSE 1 END AS acnt,
        |        CASE WHEN n.event_type = 'purchase' THEN n.rn ELSE c.rn END
        |          AS run_end
        |      FROM t c LEFT JOIN t n
        |        ON n.user_id = c.user_id AND n.rn = c.rn + 1
        |      WHERE c.event_type = 'purchase'),
        |b AS (SELECT a.*, s.event_id AS b_id, s.ts AS b_ts,
        |        row_number() OVER (PARTITION BY a.user_id, a.rn
        |                           ORDER BY s.rn) AS srn
        |      FROM a JOIN t s ON s.user_id = a.user_id AND s.rn > a.run_end
        |        AND s.event_type = 'purchase' AND s.value > a.value)
        |SELECT user_id, event_id AS start_id, ts AS start_ts,
        |       b_id AS end_id, b_ts AS end_ts,
        |       CAST(acnt + 1 AS BIGINT) AS n_rows,
        |       CAST(acnt AS VARCHAR) || ',1' AS step_counts
        |FROM b WHERE srn = 1 AND b_ts <= ts + INTERVAL 1440 MINUTE
        |ORDER BY user_id, start_id""".stripMargin,
    // ANN serving batch replay = lshTopK's generated md5-plane oracle
    // (the same parameters as sim_lsh_bucketed)
    "stream_sim_topk" -> graft.api.Similarity.lshTopKOracleSql(5,
      tables = 8, bits = 6, probeIdBound = 10),
    "stream_cep_permute" -> Analytic.oracles("event_cep_sql_permute"),
    "stream_dedup_minhash" -> graft.api.Dedup.minhashIncrementalOracleSql(0.7),
    "stream_cep_exclude" -> Analytic.oracles("event_cep_sql_exclude"),
    "stream_cep_pattern" -> graft.api.Cep.oracleSql(Analytic.CepPatterns.quant),
    "stream_cep_relaxed" -> graft.api.Cep.oracleSql(Analytic.CepPatterns.relaxed),
    "stream_cep_skip" -> graft.api.Cep.oracleSql(Analytic.CepPatterns.skipFirst),

    // DeltaTrigger chain replay: the last-fired baseline updates only on
    // fires, so the oracle walks each key's rows in (ts, event_id) order
    // with WITH RECURSIVE — same integer-cents arithmetic as the fold
    "stream_delta_trigger" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id AS u, ts::TIMESTAMP AS ts, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (SELECT *, sum(cents) OVER (PARTITION BY u ORDER BY rn
        |                                 ROWS UNBOUNDED PRECEDING) AS csum FROM e),
        |chain(u, rn, lastf, fired) AS (
        |  SELECT u, rn, cents, false FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r2.u, r2.rn,
        |         CASE WHEN abs(r2.cents - ch.lastf) > 8000
        |              THEN r2.cents ELSE ch.lastf END,
        |         abs(r2.cents - ch.lastf) > 8000
        |  FROM chain ch JOIN r r2 ON r2.u = ch.u AND r2.rn = ch.rn + 1)
        |SELECT r.u AS user_id, r.event_id, r.ts, r.rn AS n_events,
        |       CAST(r.csum AS DOUBLE) / 100 AS sum_value,
        |       CAST(r.cents AS DOUBLE) / 100 AS fired_value
        |FROM r JOIN chain ch ON ch.u = r.u AND ch.rn = r.rn
        |WHERE ch.fired
        |ORDER BY user_id, event_id""".stripMargin,
    // hand-written group-repetition replay: four consecutive runs with
    // the unrolled alternation, one match per anchoring-run position
    "stream_cep_sql" -> groupOracle,  // same parsed pattern (CepSqlSpec pins)
    "event_cep_group" -> groupOracle,

    "stream_cep_where" -> graft.api.Cep.oracleSqlWhere(Analytic.CepPatterns.where),
    "stream_pane_twolevel" -> EventTime.oracles("wnd_sliding"),
    "stream_tumbling_append" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
        |       (date_trunc('hour', ts) + INTERVAL 1 HOUR)::TIMESTAMP AS window_end,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,

    "stream_dedup_watermark" ->
      """SELECT event_type, count(*) AS n_events FROM (
        |  SELECT DISTINCT ON (event_id) event_id, event_type FROM events
        |  ORDER BY event_id, event_type
        |) GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The newest row per user, ties broken by event_id descending —
    // exactly the keep-last ROW_NUMBER formulation.
    "stream_dedup_last" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "stream_custom_trigger" ->
      """SELECT user_id, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
        |       'final' AS emit_kind
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_interval_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
        |ORDER BY p_id, c_id""".stripMargin,

    "stream_interval_join_outer" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
        |ORDER BY p_id, c_id NULLS FIRST""".stripMargin,

    "stream_interval_join_full" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id,
        |       coalesce(p.user_id, c.user_id) AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
        |ORDER BY p_id NULLS FIRST, c_id NULLS FIRST""".stripMargin,

    // Per-key as-of join: each alertable event resolves the latest
    // limit for ITS USER at or before its ts (ties: highest limit_id);
    // alerts where value clears the limit, numbered per user in
    // (ts, event_id) order.
    "stream_keyed_connect" ->
      """WITH l AS (SELECT event_id AS limit_id, ts::TIMESTAMP AS limit_ts, user_id,
        |                  value + 20 AS limit_value
        |           FROM events WHERE event_type = 'signup'),
        |e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
        |      FROM events WHERE event_type IN ('purchase', 'click')),
        |j AS (SELECT e.*, l.limit_id, l.limit_value,
        |             row_number() OVER (PARTITION BY e.event_id
        |                                ORDER BY l.limit_ts DESC, l.limit_id DESC) AS rn
        |      FROM e JOIN l ON l.user_id = e.user_id AND l.limit_ts <= e.ts),
        |q AS (SELECT event_id, ts, user_id, event_type, value, limit_id, limit_value
        |      FROM j WHERE rn = 1 AND value > limit_value)
        |SELECT *, row_number() OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS n_over
        |FROM q ORDER BY event_id""".stripMargin,

    // Cents derived exactly like the Scala fold (round(value*100),
    // summed, /100) so the replay does not rely on fixture values
    // being exact two-decimal amounts.
    "stream_early_fire" ->
      """SELECT user_id, date_trunc('hour', ts::TIMESTAMP)::TIMESTAMP AS window_start,
        |       count(*) AS n_events,
        |       CAST(sum(round(value * 100)) AS DOUBLE) / 100 AS sum_value,
        |       'final' AS emit_kind
        |FROM events GROUP BY 1, 2 ORDER BY user_id, window_start""".stripMargin,

    // Interval-end boundary in exact integer micros on both engines:
    // fires cover (b - 15 min, b], a row at the exact window start
    // rides the first fire (GREATEST(1, ...)). Cents derive exactly
    // like the Scala fold.
    "stream_early_fire_purge" ->
      """WITH e AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS us, value FROM events),
        |k AS (SELECT user_id, (us // 3600000000) * 3600000000 AS ws_us,
        |             us - (us // 3600000000) * 3600000000 AS off_us, value
        |      FROM e)
        |SELECT user_id,
        |  make_timestamp(ws_us) AS window_start,
        |  make_timestamp(ws_us + GREATEST(1, (off_us + 900000000 - 1) // 900000000)
        |                 * 900000000) AS fire_ts,
        |  count(*) AS n_events,
        |  CAST(sum(round(value * 100)) AS DOUBLE) / 100 AS sum_value
        |FROM k GROUP BY 1, 2, 3
        |ORDER BY user_id, window_start, fire_ts""".stripMargin,

    // The md5(event_id) scramble IS the arrival order on both engines.
    "stream_side_outputs" ->
      """WITH m AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value,
        |                  max(ts::TIMESTAMP) OVER (
        |                    PARTITION BY user_id
        |                    ORDER BY md5(CAST(event_id AS VARCHAR))
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |           FROM events)
        |SELECT event_id, ts, user_id, event_type, value,
        |       CASE WHEN pm IS NOT NULL AND ts < pm - INTERVAL 14 DAY THEN 'late'
        |            WHEN event_type = 'error' THEN 'fail'
        |            ELSE 'pass' END AS route
        |FROM m ORDER BY event_id""".stripMargin,

    // Keep-last-3 per (user, hour window): the kept tail is rn <= 3
    // under the DESCENDING (ts, event_id) order; first/last kept ids
    // are the rn extremes within it. sum_kept derives cents exactly
    // like the Scala fold (round(value*100), summed, /100) — for
    // non-negative values round-half-up and round-half-away agree, so
    // the gate holds even for values that are not exact cents.
    "stream_evictor" ->
      """WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, value,
        |                  date_trunc('hour', ts::TIMESTAMP) AS window_start
        |           FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, window_start
        |                                   ORDER BY ts DESC, event_id DESC) AS rn,
        |             count(*) OVER (PARTITION BY user_id, window_start) AS n_seen
        |      FROM e)
        |SELECT user_id, window_start,
        |  CAST(max(n_seen) AS BIGINT) AS n_seen,
        |  count(*) AS n_kept,
        |  CAST(sum(round(value * 100)) AS DOUBLE) / 100 AS sum_kept,
        |  arg_max(event_id, rn) AS first_kept_id,
        |  arg_min(event_id, rn) AS last_kept_id
        |FROM r WHERE rn <= 3
        |GROUP BY user_id, window_start
        |ORDER BY user_id, window_start""".stripMargin,

    // Identical text to the wnd_count_sliding oracle: the batch fold
    // and the SQL frame are the same function, so one oracle pins both.
    "stream_count_slide" ->
      """WITH r AS (SELECT user_id, ts::TIMESTAMP AS ts, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, CAST(rn // 5 AS BIGINT) AS fire_seq,
        |  count(*) OVER f AS n_in_window,
        |  CAST(sum(round(value * 100)) OVER f AS DOUBLE) / 100 AS sum_value,
        |  first_value(event_id) OVER f AS first_id,
        |  event_id AS last_id
        |FROM r
        |WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |QUALIFY rn % 5 = 0
        |ORDER BY user_id, fire_seq""".stripMargin,

    // The SQL RANGE frame IS the batch semantics of the OVER operator;
    // epoch_us integers make the frame bound exact micro arithmetic in
    // both engines (no interval/precision coercion in the comparison).
    "stream_over_agg" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_7d,
        |  CAST(sum(round(value * 100)) OVER w AS DOUBLE) / 100 AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP)
        |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // The running ROWS UNBOUNDED PRECEDING frame in the (ts, event_id)
    // total order.
    "stream_over_unbounded" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_run,
        |  CAST(sum(round(value * 100)) OVER w AS DOUBLE) / 100 AS sum_run
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS UNBOUNDED PRECEDING)
        |ORDER BY user_id, event_id""".stripMargin,

    // The SQL ROWS frame in the (ts, event_id) total order — event_id
    // tie-break makes the frame content deterministic cross-engine.
    "stream_over_rows" ->
      """SELECT user_id, event_id,
        |  count(*) OVER w AS n_last10,
        |  CAST(sum(round(value * 100)) OVER w AS DOUBLE) / 100 AS sum_last10
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    // Final ranking of the running per-(type, user) totals — ties break
    // by user_id ascending, the processor's deterministic order.
    "stream_topn" ->
      """SELECT event_type, rnk, user_id, total FROM (
        |  SELECT event_type, user_id,
        |         CAST(total_cents AS DOUBLE) / 100 AS total,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY total_cents DESC, user_id) AS rnk
        |  FROM (SELECT event_type, user_id, sum(round(value * 100)) AS total_cents
        |        FROM events GROUP BY 1, 2))
        |WHERE rnk <= 3
        |ORDER BY event_type, rnk""".stripMargin,

    "stream_union_min_watermark" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type IN ('purchase', 'click')
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // idle-aware union: heartbeats are watermark metadata, filtered
    // before the aggregation — the batch replay is identical to the
    // plain min-watermark union's.
    "stream_union_idle" ->
      """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE event_type IN ('purchase', 'click')
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    // Compacted tombstone changelog: users carrying a delete marker
    // (signup with event_id % 19 = 0) vanish entirely; the rest emit
    // one exact-cents "I" per contributed type.
    "stream_tombstone" ->
      """SELECT user_id, event_type,
        |  CAST(CAST(sum(round(value * 100)) AS BIGINT) AS DOUBLE) / 100 AS contributed,
        |  'I' AS kind, CAST(1 AS BIGINT) AS sign
        |FROM events
        |WHERE event_type IN ('purchase', 'click')
        |  AND user_id NOT IN (SELECT DISTINCT user_id FROM events
        |                      WHERE event_type = 'signup' AND event_id % 19 = 0)
        |GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    // Batch replay of the retract Top-N: one invocation from empty
    // state emits the final ranking as first-fill "I" rows.
    "stream_topn_retract" ->
      """SELECT event_type, CAST(1 AS BIGINT) AS fire_seq, rnk, user_id, total,
        |       'I' AS kind, CAST(1 AS BIGINT) AS sign
        |FROM (
        |  SELECT event_type, user_id,
        |         CAST(total_cents AS DOUBLE) / 100 AS total,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY total_cents DESC, user_id) AS rnk
        |  FROM (SELECT event_type, user_id, sum(round(value * 100)) AS total_cents
        |        FROM events GROUP BY 1, 2))
        |WHERE rnk <= 3
        |ORDER BY event_type, rnk""".stripMargin,

    "stream_lookup_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_name, c.c_nationkey
        |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
        |ORDER BY e.event_id""".stripMargin,

    // Broadcast as-of join formulation: every alertable event resolves
    // the latest rule for its type at or before its ts (ties: highest
    // rule_id), alerts where value clears the threshold.
    "stream_broadcast_rules" ->
      """WITH r AS (SELECT event_id AS rule_id, ts::TIMESTAMP AS rule_ts,
        |                  CASE WHEN event_id % 2 = 0 THEN 'purchase' ELSE 'click' END AS target_type,
        |                  value + 20 AS threshold
        |           FROM events WHERE event_type = 'signup'),
        |e AS (SELECT event_id, ts::TIMESTAMP AS ts, event_type, value FROM events
        |      WHERE event_type IN ('purchase', 'click')),
        |j AS (SELECT e.*, r.rule_id, r.threshold,
        |             row_number() OVER (PARTITION BY e.event_id
        |                                ORDER BY r.rule_ts DESC, r.rule_id DESC) AS rn
        |      FROM e JOIN r ON r.target_type = e.event_type AND r.rule_ts <= e.ts)
        |SELECT event_id, ts, event_type, value, rule_id, threshold
        |FROM j WHERE rn = 1 AND value > threshold
        |ORDER BY event_id""".stripMargin,

    // Same islands rewrite as event_cep's oracle — the stateful matcher
    // must reproduce the declarative pattern row-for-row.
    "stream_cep" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    sum(CASE WHEN event_type != 'click' THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS blk
        |  FROM events),
        |p AS (SELECT user_id, ts AS purchase_ts, event_id AS purchase_id,
        |             blk - 1 AS pblk
        |      FROM t WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, blk, ts AS cts FROM t WHERE event_type = 'click')
        |SELECT p.user_id, purchase_id, purchase_ts,
        |       count(*) AS n_clicks, min(cts) AS first_click_ts
        |FROM p JOIN c ON c.user_id = p.user_id AND c.blk = p.pblk
        |WHERE cts >= purchase_ts - INTERVAL 10 MINUTE
        |GROUP BY p.user_id, purchase_id, purchase_ts
        |ORDER BY p.user_id, purchase_id""".stripMargin
  )
}
