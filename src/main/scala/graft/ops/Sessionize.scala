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
 * DuckDB oracle): a session spans [first event, last event + gap); an
 * event extends its predecessor's session iff it starts strictly before
 * previous ts + gap, i.e. consecutive events with `ts - prev == gap`
 * start a NEW session.
 */
object Sessionize {

  /**
   * Per-(user, session) aggregate over an `events(user_id, ts,
   * event_type, value)` frame: session bounds, event count, purchase
   * count, and total `value` (rounded for engine-portable compare).
   *
   * @param gap inactivity gap, e.g. "6 hours" — must parse as a Spark
   *            interval literal
   */
  def userSessions(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        round(sum(col("value")), 6).as("total_value"))
      .select(col("user_id"),
        col("s.start").as("session_start"),
        col("s.end").as("session_end"),
        col("n_events"), col("n_purchases"), col("total_value"))

  /**
   * Corpus-level session summary: distribution of session length per
   * number-of-events bucket — the rollup a product team reads. One extra
   * tiny aggregation over [[userSessions]] (keys: n_events bucket).
   */
  def sessionStats(sessions: DataFrame, gapSeconds: Long): DataFrame = {
    // duration of the EVENT SPAN (last - first), not the padded window:
    // subtract the trailing gap session_window appends after the last event
    val spanSec: Column =
      unix_timestamp(col("session_end")) - unix_timestamp(col("session_start")) -
        lit(gapSeconds)
    sessions
      .groupBy(least(col("n_events"), lit(5)).cast("int").as("n_events_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(spanSec), 6).as("mean_span_sec"),
        max(spanSec).cast("long").as("max_span_sec"),
        sum(col("n_purchases")).as("n_purchases"))
  }
}
