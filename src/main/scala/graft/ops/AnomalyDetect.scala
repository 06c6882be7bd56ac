package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CTR spike/drop anomaly detection (SURVEY §2.5 W1, §2.2 P3/P8/P9/P11).
 *
 * Reference (flink/anomaly_job.sql:49-84):
 *   view ctr_with_previous:
 *     LAG(ctr, 1) OVER (PARTITION BY campaign_id ORDER BY event_time)
 *   insert:
 *     WHERE previous_ctr IS NOT NULL
 *       AND ((previous_ctr > 0 AND current_ctr > previous_ctr * 2.0)   -- SPIKE
 *            OR (current_ctr < previous_ctr * 0.5))                    -- DROP
 *     alert_type = CASE WHEN prev > 0 AND curr > prev*2.0 THEN 'SPIKE'
 *                       WHEN curr < prev*0.5 THEN 'DROP' END
 *
 * Note the reference's exact guards: SPIKE additionally requires
 * `previous_ctr > 0` (so 0 → x is not a spike), DROP has no such guard
 * (x → 0 IS a drop when x > 0). The first row per campaign never alerts
 * (LAG yields NULL, filtered).
 *
 * This is the batch form (`lag().over(Window...)` — catalyst WindowExec,
 * one shuffle on campaign_id). Structured Streaming has no event-time OVER;
 * the streaming twin lives in [[graft.streaming.StreamingPipelines]] as a
 * `flatMapGroupsWithState` operator with identical per-key semantics.
 */
object AnomalyDetect {

  /** µ-int robust-z grid with the NaN guard (ADVICE r14): Spark's
    * `floor()` on a double returns a LONG, so a NaN modified z-score
    * silently collapses to 0 (no alert) while DuckDB's double `floor`
    * preserves NaN — which DuckDB orders ABOVE every threshold (alerts).
    * A NaN input must read NULL robust_z on BOTH engines (the
    * ivfCellStats n_degenerate convention: a non-numeric statistic is no
    * evidence), so the oracles carry the same `CASE WHEN isnan` guard. */
  private def muGridZ(z: Column): Column =
    when(isnan(z), lit(null).cast("double"))
      .otherwise(floor(z * 1e6 + 0.5) / 1e6)

  /**
   * @param ctr frame with columns (campaign_id, ctr, and `timeCol` /
   *            `alertTimeCol` timestamps — in the reference event_time IS
   *            window_end, flink/anomaly_job.sql:16)
   * @param minImpressions the reference's OPTIONAL low-traffic noise
   *            filter (`WHERE impression_count > 10`, commented out at
   *            flink/anomaly_job.sql:59-60): windows with
   *            `impression_count <= minImpressions` are removed from the
   *            series BEFORE the LAG (the view would filter its source),
   *            so the LAG chains across them. Default 0 keeps reference
   *            parity — every emitted window has >= 1 impression, and
   *            the plan is untouched.
   */
  def alerts(ctr: DataFrame, timeCol: String = "window_end",
             alertTimeCol: String = "window_end",
             minImpressions: Long = 0L): DataFrame = {
    val spike = col("previous_ctr") > 0.0 &&
      col("current_ctr") > col("previous_ctr") * 2.0
    val drop = col("current_ctr") < col("previous_ctr") * 0.5
    val source =
      if (minImpressions > 0L) ctr.filter(col("impression_count") > minImpressions)
      else ctr
    source
      .select(col(alertTimeCol).as("alert_time"), col(timeCol).as("__order_time"),
        col("campaign_id"), col("ctr").as("current_ctr"))
      .withColumn("previous_ctr", lag(col("current_ctr"), 1).over(
        Window.partitionBy(col("campaign_id")).orderBy(col("__order_time"))))
      .filter(col("previous_ctr").isNotNull && (spike || drop))
      .select(col("alert_time"), col("campaign_id"), col("current_ctr"),
        col("previous_ctr"),
        when(spike, lit("SPIKE")).when(drop, lit("DROP")).as("alert_type"))
  }

  /**
   * Rolling z-score anomaly detector over any per-key windowed metric
   * series (ctr, impression volume, …) — a second detector family beside
   * the reference's ratio classifier (flink/anomaly_job.sql:63-75).
   * The ratio rule compares each window only to its immediate predecessor
   * (LAG 1), so one noisy window both alerts and poisons the next
   * comparison; this scores each window against the MEAN and SPREAD of
   * the preceding `lookback` windows, so gradual drift stays quiet while
   * a genuine outlier alerts. (The registered query scores hourly
   * impression VOLUME rather than ctr: on a sparse fixture — and on any
   * campaign whose per-window click counts are mostly zero — the ctr
   * series is almost-everywhere 0 and a rate z-score can never fire,
   * while traffic volume always carries a distribution.)
   *
   * Semantics:
   *  - statistics are frame-bounded window aggregates (`ROWS BETWEEN
   *    lookback PRECEDING AND 1 PRECEDING`) over the same per-campaign
   *    event-time ordering as [[alerts]] — current window excluded, so a
   *    spike can't mask itself by inflating its own baseline;
   *  - warm-up: no alert until `minPoints` prior windows exist (the
   *    z-score of a 1-2 point baseline is noise);
   *  - a zero-variance baseline never alerts (z undefined) — the
   *    LAG-ratio detector covers the flat-then-jump case;
   *  - `mean_ctr`/`std_ctr`/`zscore` are rounded to 6 decimals BEFORE
   *    the threshold filter, so the alert decision is made on exactly
   *    the values the DuckDB oracle compares — no float-boundary
   *    flicker between engines.
   *
   * Scale: one shuffle on campaign_id (same WindowExec shape as the LAG
   * detector — Catalyst collapses all four aggregates into one window
   * frame pass), no self-join, state O(lookback) per key.
   */
  /**
   * Seasonal (hour-of-day) baseline detector — the third detector
   * family: where the LAG-ratio rule reads one predecessor and the
   * rolling z-score reads a recent frame, this compares each window to
   * ALL windows sharing its hour-of-day, so a quiet 3 a.m. is judged
   * against other 3 a.m.s and daily periodicity stops masquerading as
   * anomaly (a traffic curve that halves every night would page the
   * rolling detector twice a day, and this one never).
   *
   * Semantics:
   *  - baseline cell = (key, hour-of-day); mean/stddev_samp are computed
   *    over the WHOLE cell, current window included (leave-one-in — at a
   *    month of history one point shifts a 30-point cell's mean by ~3%,
   *    and including it keeps the statistic a plain unordered aggregate
   *    on both engines);
   *  - warm-up: cells with fewer than `minPoints` windows never alert;
   *  - round-to-6-before-filter, zero-variance gate, HIGH/LOW labeling
   *    exactly as [[zscoreAlerts]];
   *  - `hour_of_day` derives from `timeCol`: with window END as the time
   *    column the label is shifted one hour from the window's span —
   *    for aligned tumbling windows that's a constant relabeling of the
   *    cells (a mod-24 bijection), never a change in which windows share
   *    a baseline.
   *
   * Scale: ONE shuffle on (key, hod) — the stats are unordered partition
   * aggregates, so Catalyst plans a WindowExec with no sort-frame state;
   * no self-join of the series against its baseline.
   */
  def seasonalAlerts(series: DataFrame, valueCol: String = "ctr",
                     keyCol: String = "campaign_id",
                     timeCol: String = "window_end",
                     minPoints: Int = 4,
                     threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col("hour_of_day"))
    val mu = avg(col("current_value")).over(w)
    val sigma = stddev_samp(col("current_value")).over(w)
    series
      .select(col(timeCol).as("alert_time"), col(keyCol),
        hour(col(timeCol)).as("hour_of_day"),
        col(valueCol).cast("double").as("current_value"))
      .withColumn("n_cell", count(lit(1)).over(w))
      .withColumn("mean_value", round(mu, 6))
      .withColumn("std_value", round(sigma, 6))
      .withColumn("zscore", round((col("current_value") - mu) / sigma, 6))
      .filter(col("n_cell") >= minPoints && col("std_value") > 0.0 &&
        abs(col("zscore")) > threshold)
      .select(col("alert_time"), col(keyCol), col("hour_of_day"),
        col("current_value"), col("mean_value"), col("std_value"),
        col("zscore"),
        when(col("zscore") > 0, lit("HIGH")).otherwise(lit("LOW"))
          .as("alert_type"))
  }

  /**
   * MAD (modified z-score) detector — the ROBUST fourth detector
   * family: where [[zscoreAlerts]]/[[seasonalAlerts]] judge against
   * mean/stddev, this judges against the per-key median and the median
   * absolute deviation. The difference matters exactly when anomalies
   * are present: one extreme point inflates a mean/std baseline enough
   * to MASK itself (and its neighbors), while the median/MAD baseline
   * moves by at most one rank — the standard Iglewicz–Hoaglin modified
   * z-score `M = 0.6745·(x − median) / MAD`, alerting at `|M| > 3.5`.
   *
   * Semantics (the [[seasonalAlerts]] conventions):
   *  - baseline cell = the key's WHOLE series, current point included
   *    (leave-one-in — both statistics are plain unordered aggregates
   *    on both engines, and a median moves at most one rank per point);
   *  - warm-up: keys with fewer than `minPoints` windows never alert;
   *  - `MAD == 0` never alerts (a majority-constant series makes every
   *    deviation infinite — the zero-variance gate's robust analogue);
   *  - `robust_z` is quantized to the µ-int grid `floor(z·1e6+0.5)/1e6`
   *    BEFORE the threshold filter (NOT `round(z, 6)` — the engines
   *    scale differently inside two-arg round and the sf0.1 gate caught
   *    a real half-tie, r14); median/MAD are exact Spark `percentile`
   *    == DuckDB `quantile_cont` (integer-count inputs interpolate
   *    identically), rounded only for output.
   *
   * Scale: ONE shuffle on the key — two chained WindowExec passes over
   * the same unordered partition (median, then MAD of the residuals),
   * no sort frame, no self-join. At 100 TB the same switch as the
   * quantile profile applies: `percentile` → `approx_percentile` for
   * fixed-size partials at tolerance-grade values.
   */
  def madAlerts(series: DataFrame, valueCol: String = "ctr",
                keyCol: String = "campaign_id",
                timeCol: String = "window_end",
                minPoints: Int = 6, threshold: Double = 3.5): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    series
      .select(col(timeCol).as("alert_time"), col(keyCol),
        col(valueCol).cast("double").as("current_value"))
      .withColumn("n_cell", count(lit(1)).over(w))
      .withColumn("__med", percentile(col("current_value"), lit(0.5)).over(w))
      .withColumn("__mad",
        percentile(abs(col("current_value") - col("__med")), lit(0.5)).over(w))
      .withColumn("robust_z", muGridZ(
        lit(0.6745) * (col("current_value") - col("__med")) / col("__mad")))
      .filter(col("n_cell") >= minPoints && col("__mad") > 0.0 &&
        abs(col("robust_z")) > threshold)
      .select(col("alert_time"), col(keyCol), col("current_value"),
        round(col("__med"), 6).as("median_value"),
        round(col("__mad"), 6).as("mad_value"),
        col("robust_z"),
        when(col("robust_z") > 0, lit("HIGH")).otherwise(lit("LOW"))
          .as("alert_type"))
  }

  /** Frozen per-key (median, MAD, n_points) baseline snapshot —
    * what [[madAlertsStream]] scores arriving windows against: computed
    * once over a LANDED series (two tiny per-key aggregates; the med
    * frame broadcasts into the residual pass). */
  def madBaseline(series: DataFrame, valueCol: String = "ctr",
                  keyCol: String = "campaign_id"): DataFrame = {
    val vals = series.select(col(keyCol),
      col(valueCol).cast("double").as("__v"))
    vals
      .groupBy(col(keyCol))
      .agg(percentile(col("__v"), lit(0.5)).as("med"),
        count(lit(1)).as("n_points"))
      .join(vals, Seq(keyCol))
      .groupBy(col(keyCol), col("med"), col("n_points"))
      .agg(percentile(abs(col("__v") - col("med")), lit(0.5)).as("mad"))
      .select(col(keyCol), col("med"), col("mad"), col("n_points"))
  }

  /**
   * Ingest-time MAD detector — the streaming shape of [[madAlerts]] on
   * the frozen-baseline pattern ([[graft.text.TextAnalysis
   * .robustLengthGateStream]]'s): the per-key (median, MAD) comes from a
   * [[madBaseline]] snapshot of the LANDED series and broadcasts into
   * every microbatch (stream-static equi join — no state, no watermark,
   * append-safe); each arriving window scores in a pure projection.
   * Same modified z-score, round-before-filter, zero-MAD and warm-up
   * gates, HIGH/LOW labels as the batch detector.
   *
   * The deliberate semantic difference: the batch detector's baseline
   * is leave-one-in over the whole series, while this judges NEW
   * windows against the frozen landed statistics — an arriving anomaly
   * burst cannot move the bar it is judged by, which is exactly what a
   * live detector wants (and why a self-updating streaming median —
   * unbounded per-key value state — is not the right construction).
   * Windows from keys absent from the snapshot never alert (no
   * baseline is no evidence). Formula parity with the batch detector at
   * the same statistics is pinned in StreamingAnomalySpec.
   */
  def madAlertsStream(seriesStream: DataFrame, baseline: DataFrame,
                      valueCol: String = "ctr",
                      keyCol: String = "campaign_id",
                      timeCol: String = "window_end",
                      minPoints: Int = 6,
                      threshold: Double = 3.5): DataFrame =
    seriesStream
      .select(col(timeCol).as("alert_time"), col(keyCol),
        col(valueCol).cast("double").as("current_value"))
      .join(broadcast(baseline), Seq(keyCol), "left")
      .withColumn("robust_z", muGridZ(
        lit(0.6745) * (col("current_value") - col("med")) / col("mad")))
      .filter(col("n_points") >= minPoints && col("mad") > 0.0 &&
        abs(col("robust_z")) > threshold)
      .select(col("alert_time"), col(keyCol), col("current_value"),
        round(col("med"), 6).as("median_value"),
        round(col("mad"), 6).as("mad_value"),
        col("robust_z"),
        when(col("robust_z") > 0, lit("HIGH")).otherwise(lit("LOW"))
          .as("alert_type"))

  def zscoreAlerts(series: DataFrame, valueCol: String = "ctr",
                   keyCol: String = "campaign_id",
                   timeCol: String = "window_end",
                   lookback: Int = 8, minPoints: Int = 3,
                   threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("alert_time"))
      .rowsBetween(-lookback, -1)
    val mu = avg(col("current_value")).over(w)
    val sigma = stddev_samp(col("current_value")).over(w)
    series
      .select(col(timeCol).as("alert_time"), col(keyCol),
        col(valueCol).cast("double").as("current_value"))
      .withColumn("n_prior", count(col("current_value")).over(w))
      .withColumn("mean_value", round(mu, 6))
      .withColumn("std_value", round(sigma, 6))
      .withColumn("zscore", round((col("current_value") - mu) / sigma, 6))
      .filter(col("n_prior") >= minPoints && col("std_value") > 0.0 &&
        abs(col("zscore")) > threshold)
      .select(col("alert_time"), col(keyCol), col("current_value"),
        col("mean_value"), col("std_value"), col("zscore"),
        when(col("zscore") > 0, lit("HIGH")).otherwise(lit("LOW"))
          .as("alert_type"))
  }
}
