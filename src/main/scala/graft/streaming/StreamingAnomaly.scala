package graft.streaming

import graft.schema.AdModel.{AnomalyAlert, CtrResult}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming LAG — the anomaly job's `LAG(ctr, 1) OVER (PARTITION BY
 * campaign_id ORDER BY event_time)` (flink/anomaly_job.sql:56) re-expressed
 * as a `flatMapGroupsWithState` operator (SURVEY §7.5), since Structured
 * Streaming has no event-time OVER window.
 *
 * Per campaign the state is the last-seen `(window_end, ctr)`. Each
 * arriving finalized-window row emits `(current, previous)` and advances
 * the state; the alert predicate and projection
 * (flink/anomaly_job.sql:63-84) are applied inline: SPIKE requires
 * `previous > 0 AND current > previous * 2`, DROP is `current < previous *
 * 0.5` (unguarded — x → 0 IS a drop), first row per campaign never alerts.
 *
 * Ordering: rows are sorted by `window_end` within each micro-batch;
 * across batches the upstream append-mode window aggregation emits each
 * key's windows in watermark order — the same monotonicity assumption
 * Flink's event-time OVER makes (flink/anomaly_job.sql:18,56).
 *
 * Scale: state is one (long, double) per campaign — trivially bounded —
 * and idle campaigns are GC'd by an event-time timeout one hour past their
 * last window, so key churn (new campaign ids over months of uptime) can
 * never accumulate unbounded state.
 */
object StreamingAnomaly {

  final case class LagState(lastWindowEndMs: Long, lastCtr: Double)

  private val idleStateMs: Long = 3600L * 1000L

  /** The reference's exact alert predicate (flink/anomaly_job.sql:63-84). */
  def alertType(current: Double, previous: Double): Option[String] = {
    val spike = previous > 0.0 && current > previous * 2.0
    val drop = current < previous * 0.5
    if (spike) Some("SPIKE") else if (drop) Some("DROP") else None
  }

  private def perCampaign(
      campaignId: String,
      rows: Iterator[CtrResult],
      state: GroupState[LagState]): Iterator[AnomalyAlert] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val ordered = rows.toIndexedSeq.sortBy(_.window_end.getTime)
      var prev = state.getOption
      val out = IndexedSeq.newBuilder[AnomalyAlert]
      for (r <- ordered) {
        prev.foreach { p =>
          alertType(r.ctr, p.lastCtr).foreach { t =>
            out += AnomalyAlert(r.window_end, campaignId, r.ctr, p.lastCtr, t)
          }
        }
        prev = Some(LagState(r.window_end.getTime, r.ctr))
      }
      prev.foreach { p =>
        state.update(p)
        // Event-time timeout must sit above the current watermark. In batch
        // execution there is no watermark (getCurrentWatermarkMs throws) and
        // timeouts can never fire — skip registration there.
        scala.util.Try(state.getCurrentWatermarkMs()).foreach { wm =>
          state.setTimeoutTimestamp(math.max(p.lastWindowEndMs + idleStateMs, wm + 1L))
        }
      }
      out.result().iterator
    }
  }

  /**
   * @param ctr frame with [[graft.schema.AdModel.ctrResultSchema]] columns —
   *            streaming (chained from the ctr topic, T5) or batch (the
   *            operator runs identically with empty initial state).
   *            Event time is `window_end` (S6: `event_time AS window_end`,
   *            flink/anomaly_job.sql:16).
   * @param minImpressions the reference's optional noise filter
   *            (flink/anomaly_job.sql:59-60) — low-traffic windows are
   *            dropped BEFORE the per-campaign state, so the streaming
   *            LAG chains across them exactly like the batch twin
   *            ([[graft.ops.AnomalyDetect.alerts]]). Default 0 = parity.
   */
  def alerts(ctr: DataFrame, watermarkDelay: String = "5 seconds",
             minImpressions: Long = 0L): Dataset[AnomalyAlert] = {
    val spark = ctr.sparkSession
    import spark.implicits._
    // S6: event time IS window_end (flink/anomaly_job.sql:16) — watermark
    // directly on it; no-op in batch
    val timed0 = graft.ops.EventTime.watermarked(ctr, watermarkDelay, "window_end")
    val timed =
      if (minImpressions > 0L)
        timed0.filter(org.apache.spark.sql.functions.col("impression_count") > minImpressions)
      else timed0
    timed
      .select("window_start", "window_end", "campaign_id",
        "impression_count", "click_count", "ctr")
      .as[CtrResult]
      .groupByKey(_.campaign_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        perCampaign)
  }
}
