package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over an event stream (the streaming twin of
  * graft.operators.TimeSeriesOps): watermarked event-time windows and
  * custom sessionization state — the Structured Streaming surface the
  * reference never had (its only "streaming" is ordered follow-mode
  * emission, logsqlite `src/logger.rs:287-288,442-451`).
  *
  * Scale notes: the windowed aggregate is a standard partial-agg +
  * state-store plan keyed by (window, type) — state size is bounded by the
  * watermark horizon, late rows beyond it are dropped deterministically.
  * Sessionization state lives per user key in the state store; the timeout
  * closes idle sessions so state does not grow with stream length.
  */
object EventStreamOps {

  /** Input event (µs-precision timestamp — the streaming-plane type). */
  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)

  /** Closed (or force-flushed) session summary. */
  final case class Session(
      user_id: Long, session_start_ms: Long, session_end_ms: Long, n_events: Long)

  final case class SessionState(startMs: Long, endMs: Long, n: Long)

  /** Tumbling 1-hour event-time windows with a watermark: counts + sums per
    * (window, type). Append mode — a window emits once its watermark
    * passes, making results deterministic under reordering within the
    * allowed lateness.
    */
  def windowedCounts(events: Dataset[Event], lateness: String = "10 minutes"): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming exact deduplication: drops repeats of (user_id, ts) seen
    * within the watermark horizon — the streaming half of the dedup pack
    * (state is bounded by the watermark; an unbounded dropDuplicates would
    * grow state forever on a 100 TB/day stream).
    */
  def dedupStream(events: Dataset[Event], lateness: String = "10 minutes"): Dataset[Event] =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "ts")

  /** Stream-stream interval join: each error event joined to the same
    * user's click events within `intervalMs` BEFORE it — the streaming twin
    * of the batch as-of/range joins (RelationalOps.lastClickBeforeError,
    * TimeSeriesOps.eventsNearErrors).
    *
    * Both sides carry watermarks and the join condition bounds click time
    * to [error − interval, error], so the state store can evict a buffered
    * click once the error-side watermark passes click_ts + interval — state
    * is bounded by interval + lateness, never by stream length. That time
    * bound is the difference between a join that runs forever at 100 TB/day
    * and one that OOMs; an unbounded-condition stream join buffers
    * everything.
    */
  def clicksBeforeErrors(
      events: Dataset[Event],
      intervalMs: Long = 5L * 60 * 1000,
      lateness: String = "10 minutes"): DataFrame = {
    val errors = events.toDF().where(col("event_type") === "error")
      .select(col("ts").as("err_ts"), col("user_id").as("err_user"),
        col("value").as("err_value"))
      .withWatermark("err_ts", lateness)
    val clicks = events.toDF().where(col("event_type") === "click")
      .select(col("ts").as("click_ts"), col("user_id").as("click_user"),
        col("value").as("click_value"))
      .withWatermark("click_ts", lateness)
    errors.join(clicks,
      col("err_user") === col("click_user") &&
      col("click_ts") >= col("err_ts") - expr(s"INTERVAL ${intervalMs / 1000} SECONDS") &&
      col("click_ts") <= col("err_ts"))
      .select(col("err_user").as("user_id"),
        unix_millis(col("err_ts")).as("err_ms"),
        unix_millis(col("click_ts")).as("click_ms"))
  }

  /** Custom stateful sessionization: flatMapGroupsWithState keyed by user,
    * 30-minute inactivity gap closes a session (event-time semantics via
    * the watermark; idle keys are flushed by the event-time timeout).
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past the gap: close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.startMs, s.endMs, s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= gapMs =>
                  cur = Some(s.copy(endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(user, s.startMs, s.endMs, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once event time passes end + gap
              state.setTimeoutTimestamp(s.endMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** A user's funnel-step advance: emitted when the user first reaches
    * `step` (1-based index into `steps`). */
  final case class FunnelAdvance(user_id: Long, step: Int, step_type: String, ts_ms: Long)

  /** Streaming ordered funnel — the online twin of
    * [[graft.operators.EventAnalyticsOps.funnel]]: per-user state is ONE
    * integer (the furthest step reached); an event advances the state iff
    * it matches the next needed step type, and each advance is emitted as
    * it happens. Aggregating `FunnelAdvance` by step downstream gives the
    * live funnel table with exactly the batch semantics (greedy
    * earliest-match over the per-user event order).
    *
    * State is O(1) per user forever — no event buffering — so the
    * operator's state-store footprint is #active-users × one int,
    * independent of stream length; users idle past `ttl` are evicted (a
    * re-appearing user restarts, the deliberate bounded-state trade
    * documented on the other streaming ops).
    */
  def funnelStream(
      events: Dataset[Event],
      steps: Seq[String] = Seq("signup", "view", "click", "purchase"),
      lateness: String = "10 minutes",
      ttlMs: Long = 24L * 3600 * 1000): Dataset[FunnelAdvance] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Int, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[Int]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var furthest = state.getOption.getOrElse(0)
            val out = Seq.newBuilder[FunnelAdvance]
            var maxTs = 0L
            rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
              maxTs = math.max(maxTs, e.ts.getTime)
              if (furthest < steps.length && e.event_type == steps(furthest)) {
                furthest += 1
                out += FunnelAdvance(user, furthest, e.event_type, e.ts.getTime)
              }
            }
            state.update(furthest)
            if (maxTs > 0) state.setTimeoutTimestamp(maxTs + ttlMs)
            out.result().iterator
          }
      }
  }
}
