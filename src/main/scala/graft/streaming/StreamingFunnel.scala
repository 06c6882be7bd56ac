package graft.streaming

import graft.ops.Funnel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming twin of [[graft.ops.Funnel]] — per-user stage arrivals
 * computed on a live event stream with EXACT batch semantics under any
 * arrival order. The chained-conditional-min funnel is not an
 * incremental fold (an earlier first-view arriving late can qualify
 * clicks that were previously too early), so the only correct streaming
 * form is buffer-until-finalized: each user's events accumulate in
 * `flatMapGroupsWithState` state, and when the event-time watermark
 * passes the user's last event + `finalizeDelayMs`, the buffered set is
 * finalized through the SAME chain rule as the batch operator
 * ([[Funnel.chainTimes]], order-insensitive by construction) and the
 * user's stage rows are emitted append-mode.
 *
 * State is bounded by each user's STAGE-TYPE event count inside their
 * activity horizon (non-stage events never enter the buffer) — the
 * watermark GC's every finalized user, and a user quiet for longer
 * than the finalize delay is flushed. This is the standard
 * sessionization-class state budget, NOT per-key-forever state; a user
 * continuously active for an unbounded horizon keeps extending their
 * own buffer, the same pathological-key budget as an unbounded
 * session, and gets the same operational answer (cap the horizon
 * upstream if that population exists).
 * Batch row parity (including cross-microbatch out-of-order arrivals)
 * is pinned in StreamingFunnelSpec.
 */
object StreamingFunnel {

  /** `(user_id, stage, stage_name, stage_ts)` — append-mode, one row
    * per stage reached, emitted when the user's buffer finalizes. */
  def userStagesStream(events: DataFrame, stageTypes: Seq[String],
                       watermarkDelay: String = "10 seconds",
                       finalizeDelayMs: Long = 10000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // the watermark column itself must reach the stateful operator — a
    // unix_millis projection would strip the event-time tag. Only stage
    // types enter the buffer: other event types can never affect the
    // chain, so buffering them would inflate state for nothing.
    val typed = events
      .withWatermark("ts", watermarkDelay)
      .filter(col("event_type").isin(stageTypes: _*))
      .select(col("user_id").cast("long"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
    def flush(user: Long, buf: Seq[(Long, String)]) = {
      val times = Funnel.chainTimes(buf, stageTypes)
      times.zipWithIndex.iterator.map { case (t, i) =>
        (user, i + 1, stageTypes(i), new java.sql.Timestamp(t))
      }
    }
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, String)],
        (Long, Int, String, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[Seq[(Long, String)]]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            flush(user, buf)
          } else {
            val buf = state.getOption.getOrElse(Seq.empty) ++
              it.map(e => (e._2.getTime, e._3))
            state.update(buf)
            // finalize once the watermark passes last-event + delay; a
            // fully-late buffer still needs a legal (future) timeout
            state.setTimeoutTimestamp(math.max(
              buf.map(_._1).max + finalizeDelayMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
      .toDF("user_id", "stage", "stage_name", "stage_ts")
  }
}
