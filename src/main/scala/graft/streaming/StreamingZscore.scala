package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/**
 * Streaming twin of the rolling z-score detector
 * ([[graft.ops.AnomalyDetect.zscoreAlerts]]) — the frame-bounded window
 * aggregates (`ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING`)
 * re-expressed as a `flatMapGroupsWithState` operator with a bounded
 * ring buffer per key, since Structured Streaming has no event-time OVER
 * window (same gap that motivates [[StreamingAnomaly]]).
 *
 * Numerical parity with the batch form is EXACT, not approximate: the
 * buffer replays each statistic with the batch engine's own arithmetic —
 * mean as naive in-order sum / count (Catalyst's `Average`), standard
 * deviation via Welford's recurrence (Catalyst's `CentralMomentAgg`:
 * `delta = x - m; m += delta/n; M2 += delta * (x - m)`) — over the same
 * chronological order the batch window frame uses, so the doubles are
 * bit-identical and the round-to-6-before-filter alert decision can
 * never diverge between the two forms.
 *
 * Scale: state is at most `lookback` doubles per key; idle keys are GC'd
 * by an event-time timeout one hour past their last window (same churn
 * bound as [[StreamingAnomaly]]).
 */
object StreamingZscore {

  final case class SeriesPoint(window_end: Timestamp, campaign_id: String,
                               value: Double)
  final case class ZscoreAlert(alert_time: Timestamp, campaign_id: String,
                               current_value: Double, mean_value: Double,
                               std_value: Double, zscore: Double,
                               alert_type: String)
  final case class RingState(lastWindowEndMs: Long, values: Vector[Double])

  private val idleStateMs: Long = 3600L * 1000L

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (mean, stddev_samp) with the batch engine's exact arithmetic —
    * naive in-order sum for the mean, Welford for the deviation. */
  private[streaming] def stats(values: Vector[Double]): (Double, Double) = {
    val n = values.length
    val mu = values.sum / n
    var m = 0.0; var m2 = 0.0; var i = 0
    while (i < values.length) {
      val x = values(i); i += 1
      val delta = x - m
      m += delta / i
      m2 += delta * (x - m)
    }
    (mu, math.sqrt(m2 / (n - 1)))
  }

  /** The batch rule's exact decision: round BOTH the gates and the score
    * to 6 decimals first. Returns (mean, std, z, type) when alerting. */
  private[streaming] def score(values: Vector[Double], current: Double,
                               minPoints: Int, threshold: Double)
      : Option[(Double, Double, Double, String)] = {
    if (values.length < minPoints) None
    else {
      val (mu, sigma) = stats(values)
      val sdR = round6(sigma)
      // sigma == 0 → z is NaN/Inf (scala BigDecimal can't round it; the
      // batch form's NaN fails its filter the same way) — gate first
      if (sdR <= 0.0) None
      else {
        val zR = round6((current - mu) / sigma)
        if (math.abs(zR) > threshold)
          Some((round6(mu), sdR, zR, if (zR > 0) "HIGH" else "LOW"))
        else None
      }
    }
  }

  def alerts(series: DataFrame, lookback: Int = 8, minPoints: Int = 3,
             threshold: Double = 2.0,
             watermarkDelay: String = "5 seconds"): Dataset[ZscoreAlert] = {
    val spark = series.sparkSession
    import spark.implicits._
    val timed = graft.ops.EventTime.watermarked(series, watermarkDelay, "window_end")
    timed.select("window_end", "campaign_id", "value").as[SeriesPoint]
      .groupByKey(_.campaign_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[SeriesPoint], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val ordered = rows.toIndexedSeq.sortBy(_.window_end.getTime)
            var buf = state.getOption.map(_.values).getOrElse(Vector.empty)
            var lastMs = state.getOption.map(_.lastWindowEndMs).getOrElse(0L)
            val out = IndexedSeq.newBuilder[ZscoreAlert]
            for (r <- ordered) {
              score(buf, r.value, minPoints, threshold).foreach {
                case (mu, sd, z, t) =>
                  out += ZscoreAlert(r.window_end, key, r.value, mu, sd, z, t)
              }
              buf = (buf :+ r.value).takeRight(lookback)
              lastMs = r.window_end.getTime
            }
            if (ordered.nonEmpty) {
              state.update(RingState(lastMs, buf))
              scala.util.Try(state.getCurrentWatermarkMs()).foreach { wm =>
                state.setTimeoutTimestamp(math.max(lastMs + idleStateMs, wm + 1L))
              }
            }
            out.result().iterator
          }
      }
  }
}
