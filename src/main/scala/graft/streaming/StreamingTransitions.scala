package graft.streaming

import graft.ops.Transitions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming twin of [[graft.ops.Transitions]] — per-user hop events on a
 * live stream with EXACT batch semantics under any arrival order. A hop
 * depends on the NEIGHBOR in (ts, event_id) order, so an incremental
 * "remember the last event" fold is wrong the moment one event arrives
 * late (it would chain across the gap and never repair). The correct
 * streaming form is the same buffer-until-finalized shape as
 * [[StreamingFunnel]]: per-user events accumulate in
 * `flatMapGroupsWithState` state; when the watermark passes the user's
 * last event + `finalizeDelayMs`, the buffer is sorted once through the
 * shared [[Transitions.hopSeq]] chain and the hop rows are emitted
 * append-mode. The transition MATRIX is then a plain downstream
 * aggregation over the emitted hops (windowed or global at the sink) —
 * the same separation the batch operator keeps between the window pass
 * and the tiny rollup.
 *
 * State budget: sessionization-class — each user's events inside their
 * activity horizon, GC'd at finalize; same bound and same pathological-
 * key caveat as the streaming funnel.
 * Batch hop parity (cross-microbatch out-of-order) is pinned in
 * StreamingTransitionsSpec.
 */
object StreamingTransitions {

  /** `(user_id, prev_type, event_type, ts)` — append-mode, one row per
    * event in the user's finalized chain (the first carries
    * `__start`). */
  def hopsStream(events: DataFrame,
                 watermarkDelay: String = "10 seconds",
                 finalizeDelayMs: Long = 10000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").cast("long"), col("ts"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(Long, Long, String)],
        (Long, String, String, java.sql.Timestamp)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[Seq[(Long, Long, String)]]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            Transitions.hopSeq(buf).iterator.map { case (prev, cur, tsMs) =>
              (user, prev, cur, new java.sql.Timestamp(tsMs))
            }
          } else {
            val buf = state.getOption.getOrElse(Seq.empty) ++
              it.map(e => (e._2.getTime, e._3, e._4))
            state.update(buf)
            state.setTimeoutTimestamp(math.max(
              buf.map(_._1).max + finalizeDelayMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
      .toDF("user_id", "prev_type", "event_type", "ts")
  }
}
