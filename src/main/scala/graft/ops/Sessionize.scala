package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sessionization — the gaps-and-islands operator every event pipeline
 * needs: group each user's events into sessions separated by an
 * inactivity gap, then aggregate per session.
 *
 * Built on Spark's native `session_window` (SPARK-10816), the merging
 * session-window aggregation Catalyst plans as ONE hash shuffle on the
 * user key followed by a per-partition sort-merge of overlapping
 * windows — no self-join, no window-function pass over the whole event
 * log. The same expression runs unchanged under Structured Streaming
 * with a watermark (the streaming twin in
 * [[graft.streaming.StreamingCuration.sessionizeStream]]), where state
 * is evicted once the watermark passes a session's close — this is the
 * 100 TB path: per-user state is bounded by the gap, not the history.
 *
 * Window semantics (asserted in SessionizeSpec and replicated by the
 * registered `user_sessions` DuckDB oracle): a session spans
 * [first event, last event + gap); an event extends its predecessor's
 * session iff it starts AT OR before previous ts + gap — Spark merges
 * boundary-adjacent windows, so `ts - prev == gap` still extends, and
 * only `ts - prev > gap` starts a new session.
 *
 * The gap is a single `gapSeconds` parameter: both the `session_window`
 * interval and [[sessionStats]]'s trailing-gap correction derive from
 * it, so the two can never disagree (a split interval-string/seconds
 * pair could silently skew spans negative).
 */
object Sessionize {

  /**
   * Per-(user, session) aggregate over an `events(user_id, ts,
   * event_type, value)` frame: session bounds, event count, purchase
   * count, and total `value` (rounded for engine-portable compare).
   * Works identically on a batch frame and a watermarked streaming
   * frame (see [[graft.streaming.StreamingCuration.sessionizeStream]]).
   *
   * @param gapSeconds inactivity gap in seconds (default 6 hours)
   * @param tsCol      event-time column (the watermark column when
   *                   streaming)
   */
  def userSessions(events: DataFrame, gapSeconds: Long = 21600L,
                   tsCol: String = "ts"): DataFrame =
    events
      .groupBy(session_window(col(tsCol), s"$gapSeconds seconds").as("s"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum(col("value")), 6).as("total_value"))
      .select(col("user_id"),
        col("s.start").as("session_start"),
        col("s.end").as("session_end"),
        col("n_events"), col("n_purchases"), col("total_value"))

  /**
   * Corpus-level session summary over a [[userSessions]] frame:
   * distribution of session span per number-of-events bucket — the
   * rollup a product team reads. One tiny aggregation.
   *
   * The span is the EVENT span (last − first event), not the padded
   * window: `session_window`'s end is last event + gap, so the same
   * `gapSeconds` that built the sessions is subtracted back out —
   * single-event sessions have span 0 by construction, never negative.
   * Millisecond-precise (`unix_millis`, not second-truncating
   * `unix_timestamp`).
   */
  def sessionStats(sessions: DataFrame, gapSeconds: Long = 21600L): DataFrame = {
    val spanSec: Column =
      (unix_millis(col("session_end")) - unix_millis(col("session_start")))
        .cast("double") / 1000.0 - gapSeconds.toDouble
    sessions
      .groupBy(least(col("n_events"), lit(5)).cast("int").as("n_events_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(spanSec), 6).as("mean_span_sec"),
        round(max(spanSec), 6).as("max_span_sec"),
        sum(col("n_purchases")).as("n_purchases"))
  }
}
