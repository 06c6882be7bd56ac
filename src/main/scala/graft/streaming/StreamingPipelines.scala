package graft.streaming

import graft.ops.{EventTime, IntervalJoin, WindowedCounts}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming twins of the reference's main job (flink/flink_job.sql:74-120):
 * watermarked sources → LEFT interval join → tumbling 1-minute windows →
 * ctr-by-campaign (Q1) and engagement-by-device (Q2), emitted append-mode
 * on window close (T7: Flink windowed aggs emit exactly once per window).
 *
 * Two streaming-specific rewrites, both semantics-preserving (SURVEY §7.4):
 *
 * 1. `COUNT(DISTINCT)` is unsupported in streaming aggregation. Rewrite:
 *    dedup each input on its unique id *within the watermark*
 *    (`dropDuplicatesWithinWatermark` — state is GC'd once the watermark
 *    passes, unlike plain `dropDuplicates` whose id-set grows forever; the
 *    100 TB mandate makes that the only viable form), then count plain.
 * 2. Even with both sides deduped, the LEFT join can fan out one impression
 *    into several rows (several clicks within the 10-minute bound), so a
 *    single `count(*)` over joined rows would overcount impressions. The
 *    exact-under-any-fan-out form is a **two-phase chained windowed
 *    aggregation**: first `(window, key, impression_id) → count(click_id)`,
 *    then re-window `(window, key) → count(*) impressions, sum(clicks)`.
 *    Chained event-time window aggregations and time-interval-join →
 *    windowed-agg are supported via watermark propagation (Spark ≥3.5).
 *    Batch mode keeps the literal `countDistinct` (WindowedCounts.ctrAgg) —
 *    both forms are verified identical in StreamingParitySpec.
 *
 * The join output is **flattened** to stable column names (no i./c.
 * aliases) so it can be materialized to an intermediate topic — the
 * statement-set shared-scan topology of [[StreamingJobs.runMainJob]] — and
 * re-read by the two aggregations without loss.
 */
object StreamingPipelines {

  /**
   * §7.4 step 1: event-time projection (S5), watermark (T1), id-dedup.
   * NULL ids are dropped: `COUNT(DISTINCT id)` ignores NULLs, so a row
   * whose id is NULL can never contribute to either count — dropping it
   * pre-join keeps the two-phase counts exact (and such a row could never
   * equi-join anyway).
   */
  def prepared(raw: DataFrame, idCol: String, watermarkDelay: String): DataFrame = {
    val timed = EventTime.watermarked(EventTime.withEventTime(raw), watermarkDelay)
    timed.filter(col(idCol).isNotNull).dropDuplicatesWithinWatermark(Seq(idCol))
  }

  /**
   * J1 streaming: LEFT OUTER stream-stream interval join
   * (flink/flink_job.sql:91-95), flattened. Both sides watermarked; the
   * BETWEEN bound is what lets `StreamingSymmetricHashJoinExec` GC per-key
   * state and emit NULL-padded unmatched impressions once the watermark
   * passes `event_time + interval` (T3: bounded join state + late drop).
   */
  def joinedStream(impressions: DataFrame, clicks: DataFrame,
                   interval: String = "INTERVAL 10 MINUTES",
                   watermarkDelay: String = "5 seconds"): DataFrame =
    IntervalJoin.leftOuterWithin(
      prepared(impressions, "impression_id", watermarkDelay),
      prepared(clicks, "click_id", watermarkDelay),
      leftKey = "impression_id", rightKey = "impression_id",
      leftTime = "event_time", rightTime = "event_time",
      interval = interval)
      .select(
        col("i.impression_id"), col("i.user_id"), col("i.campaign_id"),
        col("i.ad_id"), col("i.device_type"), col("i.browser"),
        col("i.event_time"),
        col("c.click_id"), col("c.event_time").as("click_time"))

  /** §7.4 step 2: the two-phase exact distinct-count aggregation. */
  private def twoPhaseCtr(joined: DataFrame, groupKey: Column, keyOut: String,
                          windowLength: String): DataFrame = {
    val perImpression = joined
      .groupBy(
        window(col("event_time"), windowLength),
        groupKey.as("__key"),
        col("impression_id"))
      .agg(count(col("click_id")).as("__clicks"))
    perImpression
      .groupBy(window(col("window"), windowLength), col("__key"))
      .agg(count(lit(1)).as("impression_count"), sum("__clicks").as("click_count"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("__key").as(keyOut),
        col("impression_count"),
        col("click_count"))
  }

  /** Q1 streaming (flink/flink_job.sql:76-98). */
  def ctrByCampaign(joined: DataFrame, windowLength: String = "1 minute"): DataFrame =
    twoPhaseCtr(joined, col("campaign_id"), "campaign_id", windowLength)
      .withColumn("ctr",
        WindowedCounts.guardedRatio(col("click_count"), col("impression_count")))

  /** Q2 streaming (flink/flink_job.sql:100-118): COALESCE after grouping raw. */
  def engagementByDevice(joined: DataFrame, windowLength: String = "1 minute"): DataFrame =
    twoPhaseCtr(joined, col("device_type"), "device_type", windowLength)
      .withColumn("device_type", coalesce(col("device_type"), lit("Unknown")))

  /**
   * HOPPING-window streaming ctr — the sliding twin of
   * [[graft.ops.WindowedCounts.ctrAggHopping]] in its streaming-legal
   * form: overlapping windows rule out the two-phase exact-distinct
   * rewrite (the second aggregation would have to re-derive hop windows
   * from the first's window STRUCTS, which re-expands them), so the
   * sliding stream uses the HLL++ sketch escape hatch in a SINGLE
   * stateful aggregation — `window(col, len, slide)` assigns each row
   * its len/slide covering windows, `approx_count_distinct` merges
   * map-side in constant space per open window, append on window close.
   * HLL++ is deterministic over a given input set, so the batch twin
   * with the same rsd produces IDENTICAL counts per window — pinned in
   * StreamingSemanticsSpec, not just within tolerance.
   */
  def ctrByCampaignHopping(joined: DataFrame,
                           windowLength: String = "2 minutes",
                           slide: String = "1 minute",
                           rsd: Double = 0.01): DataFrame =
    joined
      .groupBy(window(col("event_time"), windowLength, slide),
        col("campaign_id"))
      .agg(approx_count_distinct(col("impression_id"), rsd).as("impression_count"),
        approx_count_distinct(col("click_id"), rsd).as("click_count"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("campaign_id"), col("impression_count"), col("click_count"),
        WindowedCounts.guardedRatio(col("click_count"), col("impression_count"))
          .as("ctr"))
}
