package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Tumbling event-time window aggregation with distinct counts and the
 * guarded CTR ratio (SURVEY §2.4 A1-A5, §2.2 P2/P4/P5).
 *
 * Reference, Q1 (flink/flink_job.sql:76-98):
 *   GROUP BY TUMBLE(i.event_time, INTERVAL '1' MINUTE), i.campaign_id
 *   COUNT(DISTINCT i.impression_id), COUNT(DISTINCT c.click_id),
 *   ctr = CASE WHEN imp > 0 THEN CAST(clk AS DOUBLE)/imp ELSE 0.0 END
 * Q2 (flink/flink_job.sql:100-118): same counts grouped by raw
 * i.device_type, projected as COALESCE(device_type, 'Unknown').
 *
 * `COUNT(DISTINCT)` is the reference's deliberate defense against
 * LEFT-join fan-out (README.md:127 documents the COUNT(*) bug it fixes);
 * windows are 1-minute aligned on the **impression** event time — click
 * time never shifts window assignment.
 *
 * Scale note: two exact distinct aggregates in one GROUP BY trigger
 * Catalyst's Expand-based rewrite (rows ×3 pre-shuffle). That is exact and
 * fine into the TB range because partial aggregation still applies; the
 * sketch path for wider plans is approx_count_distinct (HLL). Streaming
 * mode cannot use exact distinct at all — see
 * [[graft.streaming.StreamingPipelines]] for the dedup-then-count rewrite.
 */
object WindowedCounts {

  /** P2+P4: NULL-safe ratio `CAST(clk AS DOUBLE)/imp`, 0.0 when imp = 0. */
  def guardedRatio(numerator: Column, denominator: Column): Column =
    when(denominator > 0, numerator.cast("double") / denominator.cast("double"))
      .otherwise(0.0)

  /** Shared scaffolding of the exact and sketch variants: tumble (or
    * hop, when `slide` is set) + two count aggregates + window-bound
    * projection + optional ctr. */
  private def windowedAgg(joined: DataFrame, groupKey: Column, keyOut: String,
                          timeCol: Column, windowLength: String,
                          countA: Column, countB: Column,
                          withRatio: Boolean,
                          slide: Option[String] = None): DataFrame = {
    val win = slide.map(s => window(timeCol, windowLength, s))
      .getOrElse(window(timeCol, windowLength))
    val agg = joined
      .groupBy(win, groupKey.as("__key"))
      .agg(countA.as("impression_count"), countB.as("click_count"))
    val base = agg.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("__key").as(keyOut),
      col("impression_count"),
      col("click_count"))
    if (withRatio)
      base.withColumn("ctr", guardedRatio(col("click_count"), col("impression_count")))
    else base
  }

  /**
   * A1-A4: tumble + two distinct counts + ctr. `groupKey` is the raw
   * grouping expression; `keyOut` the projected name.
   */
  def ctrAgg(joined: DataFrame, groupKey: Column, keyOut: String,
             timeCol: Column, windowLength: String,
             distinctA: Column, distinctB: Column,
             withRatio: Boolean): DataFrame =
    windowedAgg(joined, groupKey, keyOut, timeCol, windowLength,
      count_distinct(distinctA), count_distinct(distinctB), withRatio)

  /**
   * HOPPING (sliding) window twin of [[ctrAgg]] — the windowing form the
   * reference's TUMBLE cannot express: overlapping windows of
   * `windowLength` advancing every `slide`, so a short burst is visible
   * in every window that covers it instead of being split at an aligned
   * tumble boundary. Each event lands in `windowLength / slide` windows
   * — Spark's `window(col, len, slide)` expands exactly those
   * assignments before the aggregation (the documented cost of hop:
   * input rows × overlap factor into the shuffle, partial aggregation
   * still applies). Same exact distinct counts, same guarded ratio,
   * same output shape as [[ctrAgg]].
   */
  def ctrAggHopping(joined: DataFrame, groupKey: Column, keyOut: String,
                    timeCol: Column, windowLength: String, slide: String,
                    distinctA: Column, distinctB: Column,
                    withRatio: Boolean): DataFrame =
    windowedAgg(joined, groupKey, keyOut, timeCol, windowLength,
      count_distinct(distinctA), count_distinct(distinctB), withRatio,
      slide = Some(slide))

  /**
   * Sketch twin of [[ctrAgg]]: HLL++ `approx_count_distinct` instead of
   * the exact Expand-based rewrite. The exact path triples rows before the
   * shuffle (one Expand branch per distinct aggregate + one for plain
   * aggs); at 100 TB with wide plans that is the dominant shuffle cost,
   * while HLL sketches merge map-side in constant space per group. `rsd`
   * trades sketch size for error (HLL++ is exact below its sparse-mode
   * threshold, so small groups pay no accuracy at all). Batch gates use
   * [[ctrAgg]] (oracle-identical); this is the declared escape hatch for
   * scale, verified within tolerance in WindowedCountsSpec.
   */
  def ctrAggApprox(joined: DataFrame, groupKey: Column, keyOut: String,
                   timeCol: Column, windowLength: String,
                   distinctA: Column, distinctB: Column,
                   withRatio: Boolean, rsd: Double = 0.01): DataFrame =
    windowedAgg(joined, groupKey, keyOut, timeCol, windowLength,
      approx_count_distinct(distinctA, rsd), approx_count_distinct(distinctB, rsd),
      withRatio)
}
