package graft.streaming

import graft.ops.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/**
 * Streaming twin of [[graft.ops.AsOfJoin]] — ingest-time attribution
 * (click → last preceding view by the same user) with EXACT batch
 * semantics under any arrival order. A right row's match depends on the
 * latest left row AT OR BEFORE it, so an incremental "remember the last
 * left" fold is wrong the moment a left event arrives late: it would
 * attribute a click to a view that a still-in-flight earlier view should
 * have displaced — and, once emitted, never repair. The correct
 * streaming form is the same buffer-until-finalized shape as
 * [[StreamingFunnel]]/[[StreamingTransitions]] (the neighbor dependency
 * is the same): per-key events from BOTH sides accumulate in
 * `flatMapGroupsWithState` state; when the watermark passes the key's
 * last event + `finalizeDelayMs`, the buffer runs once through the
 * shared [[AsOfJoin.matchSeq]] chain — the batch operator's exact sort
 * and tie rules — and one attributed row per right event is emitted
 * append-mode.
 *
 * State budget: sessionization-class — each key's events inside its
 * activity horizon, GC'd at finalize; same bound and the same
 * pathological-key caveat as the streaming funnel. The horizon is the
 * trade: a right event arriving after its key finalized starts a fresh
 * buffer and cannot see the previous epoch's left rows (the streaming
 * dedup documents the identical bounded-state trade); size
 * `watermarkDelay`/`finalizeDelayMs` to the attribution window.
 * Batch parity (cross-microbatch late left rows, equal-ts ties,
 * unmatched rights) is pinned in StreamingAsOfJoinSpec.
 *
 * Null handling: rows with a null key, null event time, or null id are
 * DROPPED on both sides before the typed cast. The JSON decode layer
 * deliberately passes valid-JSON-with-missing-fields rows through as
 * nulls; an unfiltered null here would throw at Dataset deserialization
 * and — because the poison row sits in the source — re-kill the job on
 * every checkpoint restart. The batch twin keeps null-key/ts rows (its
 * window just sorts them first), but a null event time is meaningless
 * under a watermark, so the streaming form treats all three as malformed
 * input, same as the decode layer's parse-error skip (SURVEY S4).
 * Pinned in StreamingAsOfJoinSpec.
 */
object StreamingAsOfJoin {

  /**
   * @param left    streaming frame providing the carried columns
   * @param right   streaming frame whose every row is emitted once
   * @param key     equi key column (both sides; cast to long)
   * @param ts      event-time column name (both sides)
   * @param leftId  left row id carried onto matches (null rows dropped,
   *                as in the batch operator)
   * @param rightId right row id preserved in the output
   * @return append-mode stream, one row per FINALIZED right row:
   *         (rightId, key, right ts as `ts`, leftId as
   *         `matched_<leftId>`, left ts as `matched_ts`, lag in ms) —
   *         the batch operator's exact output shape
   */
  /**
   * @param progressive finalize the buffer PREFIX below the watermark
   *   every batch instead of waiting for key inactivity — the
   *   hot-key remedy (r15): a continuously-active key (one user
   *   receiving most of the stream) NEVER reaches the inactivity
   *   timeout, so its buffer grows with the stream's lifetime
   *   (measured: 8.6 MB after one 20 s feed at 90% single-user share —
   *   linear forever). With `progressive` on, each batch emits matches
   *   for right events older than the watermark (no in-bound arrival
   *   can change them: any future event has ts ≥ watermark) and prunes
   *   the buffer to the live suffix plus the latest below-watermark
   *   left rows (the carry candidates future rights still need; ties at
   *   the max ts all retained for matchSeq's id rule) — state bounded
   *   by the WATERMARK HORIZON per key, not the key's lifetime, and
   *   attribution latency drops from key-inactivity to watermark lag.
   *   The trade, SETTLED by the r16 lateness drill
   *   (graft.AsOfLatenessDrill + the lateness-bound spec case): there
   *   is NO output divergence from the default form under the
   *   watermark contract. An event arriving with ts below the
   *   watermark is dropped by the stateful operator's late-input
   *   filter BEFORE either mode's buffer — the class progressive
   *   pruning could have missed never reaches the default buffer
   *   either — and for every admitted right the carry rule is
   *   sufficient: any pruned left is strictly older than the carried
   *   newest-below-watermark left, which an in-bound right
   *   (ts ≥ watermark) can never need. Measured at lateness rates
   *   1/5/10% × depths 0.5/2/4× the watermark delay:
   *   diff-vs-batch-oracle IDENTICAL between modes at every cell, zero
   *   at in-bound depth (BASELINE.md r16). Progressive is therefore the
   *   DEFAULT since r17 — at 100 TB a continuously-hot key under the
   *   inactivity-only form grows state with the stream's lifetime, and
   *   the drill proved the bounded form costs nothing in output.
   *   `progressive = false` remains the knob for consumers that key on
   *   the flush-batched emission shape (nothing emitted for a key until
   *   its inactivity flush); goldens are pinned under the new default
   *   AND the legacy form (StreamingAsOfJoinSpec — both modes stay
   *   batch-exact).
   */
  def lastBeforeStream(left: DataFrame, right: DataFrame,
                       key: String, ts: String,
                       leftId: String, rightId: String,
                       watermarkDelay: String = "10 seconds",
                       finalizeDelayMs: Long = 10000L,
                       progressive: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    // null key/ts/id rows dropped (see scaladoc): one poison row must not
    // permanently kill the job at deserialization on every restart
    val l = left.filter(col(leftId).isNotNull &&
        col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).cast("long").as("k"), col(ts).as("t"),
        lit(true).as("isl"), col(leftId).cast("long").as("id"))
    val r = right.filter(col(rightId).isNotNull &&
        col(key).isNotNull && col(ts).isNotNull)
      .select(col(key).cast("long").as("k"), col(ts).as("t"),
        lit(false).as("isl"), col(rightId).cast("long").as("id"))
    // watermark AFTER the union so one horizon governs both sides (a
    // per-side watermark would anyway combine as the min; this keeps the
    // single knob explicit)
    val typed = l.unionByName(r)
      .withWatermark("t", watermarkDelay)
      .as[(Long, Timestamp, Boolean, Long)]
    // state carries (buffer, maxTs): the timeout horizon needs the key's
    // latest event time, and rescanning the whole buffer every microbatch
    // would cost O(B·n) on a hot key alive across B batches. Fresh rows
    // are PREPENDED (List :::) so the old buffer is shared, not copied —
    // matchSeq sorts, so buffer order is free.
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[(List[(Long, Boolean, Long)], Long),
        (Long, Long, Timestamp, Option[Long], Option[Timestamp], Option[Long])](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, it: Iterator[(Long, Timestamp, Boolean, Long)],
         state: GroupState[(List[(Long, Boolean, Long)], Long)]) =>
          if (state.hasTimedOut) {
            val buf = state.get._1
            state.remove()
            AsOfJoin.matchSeq(buf).iterator.map { case (rid, rts, m) =>
              (rid, k, new Timestamp(rts), m.map(_._1),
                m.map(p => new Timestamp(p._2)), m.map(rts - _._2))
            }
          } else {
            val (old, oldMax) = state.getOption.getOrElse((Nil, Long.MinValue))
            val fresh = it.map(e => (e._2.getTime, e._3, e._4)).toList
            val maxTs = fresh.foldLeft(oldMax)((m, e) => math.max(m, e._1))
            val buf = fresh ::: old
            val wm = state.getCurrentWatermarkMs()
            val (emit, keep) =
              if (!progressive || wm <= 0) (Nil, buf)
              else {
                // prefix-finalize: everything below the watermark is
                // immutable under in-bound arrivals — emit its rights,
                // retain only the newest below-watermark LEFT rows (all
                // ties at the max ts) as carry candidates for live rights
                val (done, live) = buf.partition(_._1 < wm)
                if (done.isEmpty) (Nil, buf)
                else {
                  val doneLeftTs = done.collect { case (t, true, _) => t }
                  val carry =
                    if (doneLeftTs.isEmpty) Nil
                    else {
                      val mx = doneLeftTs.max
                      done.filter(e => e._2 && e._1 == mx)
                    }
                  (AsOfJoin.matchSeq(done), live ::: carry)
                }
              }
            state.update((keep, maxTs))
            state.setTimeoutTimestamp(math.max(
              maxTs + finalizeDelayMs,
              state.getCurrentWatermarkMs() + 1))
            emit.iterator.map { case (rid, rts, m) =>
              (rid, k, new Timestamp(rts), m.map(_._1),
                m.map(p => new Timestamp(p._2)), m.map(rts - _._2))
            }
          }
      }
      .toDF(rightId, key, ts, s"matched_$leftId", "matched_ts", "lag_ms")
  }
}
