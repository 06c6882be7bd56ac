package graft.queries

import graft.ops.{AnomalyDetect, IntervalJoin, WindowedCounts}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's ad-analytics pipelines (flink/flink_job.sql,
 * flink/anomaly_job.sql) retargeted onto the driver's `events` table
 * (FIXTURES.md §4) for DuckDB-oracle checks.
 *
 * Mapping (same operator shapes, different column sources):
 *  - impressions := events WHERE event_type = 'view'
 *      impression_id := event_id (globally unique, like uuid4)
 *      campaign_id   := 'camp-' || user_id % 10   (10 campaigns, like the
 *                       generator's camp-{1..10}, generate_events.py:25)
 *      device_type   := bucketed `value` with a NULL band — exercises
 *                       COALESCE→'Unknown' (flink/flink_job.sql:106)
 *  - clicks := events WHERE event_type = 'click'; click_id := event_id
 *  - join key: user_id (events has no impression FK; the equi+range join
 *    shape of flink/flink_job.sql:91-95 is preserved exactly)
 *  - tumbling 1-minute windows on impression time (flink_job.sql:97)
 *
 * Scale: the join stays an equi-join on the key with the time range as a
 * residual filter (SortMergeJoin, not a cartesian range join); distinct
 * counts use Catalyst's exact expand-based path in batch.
 */
object EventQueries {

  /**
   * Shared intermediate frames (see [[SharedFrames]]): the batch analogue
   * of the reference's two sharing edges — the STATEMENT SET's shared
   * scan+join feeding both INSERTs (flink/flink_job.sql:74-120, T4) and
   * the `ctr_results` Kafka topic feeding the anomaly job
   * (flink/anomaly_job.sql:21, T5). Without it each registry query re-ran
   * the full scan+join+agg — at 100 TB that doubles the most expensive job.
   */
  private def memo(spark: SparkSession, sfDir: String, tag: String)
                  (build: => DataFrame): DataFrame =
    SharedFrames.memo(spark, sfDir, tag)(build)

  private def deviceExpr = when(col("value") < 50, "mobile")
    .when(col("value") < 100, "desktop")
    .when(col("value") < 150, lit(null: String))
    .otherwise("tablet")

  /** impressions-like frame from `events`. */
  def impressions(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsSpread(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(
        col("event_id").as("impression_id"),
        col("user_id"),
        concat(lit("camp-"), (col("user_id") % 10).cast("string")).as("campaign_id"),
        deviceExpr.as("device_type"),
        col("ts").as("event_time"))

  /** clicks-like frame from `events`. */
  def clicks(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsSpread(spark, sfDir)
      .filter(col("event_type") === "click")
      .select(
        col("event_id").as("click_id"),
        col("user_id"),
        col("ts").as("event_time"))

  /**
   * J1 on the events mapping: LEFT interval join, click within 10 min.
   * `user_id` is a hot key (~100 events/user at sf0.1, growing with
   * scale), so this uses the bucketed interval join — equi key
   * (user_id, 10-min bucket) — instead of plain SMJ-with-residual, and
   * the frame is persisted once per (session, sfDir) since both Q1 and
   * Q2 consume it (the reference's shared STATEMENT SET scan).
   */
  def joined(spark: SparkSession, sfDir: String): DataFrame =
    memo(spark, sfDir, "joined") {
      IntervalJoin.leftOuterWithinBucketed(
        impressions(spark, sfDir), clicks(spark, sfDir),
        leftKey = "user_id", rightKey = "user_id",
        leftTime = "event_time", rightTime = "event_time",
        intervalMs = 10L * 60 * 1000)
    }

  /**
   * Q1 flagship: ctr per (1-min window, campaign) — flink_job.sql:76-98.
   * Persisted: `anomalyAlerts` chains off this frame (the reference's
   * `ctr_results` topic edge), and recomputing it would double the most
   * expensive job. No output sort — the driver compare sorts rows itself.
   */
  def ctrByCampaign(spark: SparkSession, sfDir: String): DataFrame =
    memo(spark, sfDir, "ctr") {
      WindowedCounts.ctrAgg(joined(spark, sfDir),
        groupKey = col("i.campaign_id"), keyOut = "campaign_id",
        timeCol = col("i.event_time"), windowLength = "1 minute",
        distinctA = col("i.impression_id"), distinctB = col("c.click_id"),
        withRatio = true)
    }

  /** Q2: engagement per (window, device) — flink_job.sql:100-118. */
  def engagementByDevice(spark: SparkSession, sfDir: String): DataFrame =
    WindowedCounts.ctrAgg(joined(spark, sfDir),
      groupKey = col("i.device_type"), keyOut = "device_type",
      timeCol = col("i.event_time"), windowLength = "1 minute",
      distinctA = col("i.impression_id"), distinctB = col("c.click_id"),
      withRatio = false)
      .withColumn("device_type", coalesce(col("device_type"), lit("Unknown")))

  /** P2: spike/drop alerts chained off Q1's persisted frame —
    * anomaly_job.sql:45-84. */
  def anomalyAlerts(spark: SparkSession, sfDir: String): DataFrame =
    AnomalyDetect.alerts(ctrByCampaign(spark, sfDir))

  // ---------------------------------------------------------------- oracle

  /** Shared DuckDB CTE prefix mirroring impressions/clicks/join above. */
  private val mappingCtes: String =
    """WITH i AS (
      |  SELECT event_id AS impression_id, user_id,
      |         'camp-' || CAST(user_id % 10 AS VARCHAR) AS campaign_id,
      |         CASE WHEN value < 50 THEN 'mobile'
      |              WHEN value < 100 THEN 'desktop'
      |              WHEN value < 150 THEN NULL
      |              ELSE 'tablet' END AS device_type,
      |         make_timestamp(epoch_ms(ts) * 1000) AS event_time
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT event_id AS click_id, user_id, make_timestamp(epoch_ms(ts) * 1000) AS event_time
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT i.impression_id, i.campaign_id, i.device_type,
      |         i.event_time, c.click_id
      |  FROM i LEFT JOIN c ON i.user_id = c.user_id
      |     AND c.event_time BETWEEN i.event_time
      |                          AND i.event_time + INTERVAL 10 MINUTE)""".stripMargin

  private val ctrSelect: String =
    """SELECT CAST(date_trunc('minute', event_time) AS TIMESTAMP) AS window_start,
      |       CAST(date_trunc('minute', event_time) + INTERVAL 1 MINUTE AS TIMESTAMP) AS window_end,
      |       campaign_id,
      |       COUNT(DISTINCT impression_id) AS impression_count,
      |       COUNT(DISTINCT click_id) AS click_count,
      |       CASE WHEN COUNT(DISTINCT impression_id) > 0
      |            THEN CAST(COUNT(DISTINCT click_id) AS DOUBLE) / COUNT(DISTINCT impression_id)
      |            ELSE 0.0 END AS ctr
      |FROM j GROUP BY 1, 2, 3""".stripMargin

  val ctrOracle: String =
    s"$mappingCtes\n$ctrSelect\nORDER BY window_start, campaign_id"

  val engagementOracle: String =
    s"""$mappingCtes
       |SELECT CAST(date_trunc('minute', event_time) AS TIMESTAMP) AS window_start,
       |       CAST(date_trunc('minute', event_time) + INTERVAL 1 MINUTE AS TIMESTAMP) AS window_end,
       |       COALESCE(device_type, 'Unknown') AS device_type,
       |       COUNT(DISTINCT impression_id) AS impression_count,
       |       COUNT(DISTINCT click_id) AS click_count
       |FROM j GROUP BY 1, 2, j.device_type
       |ORDER BY window_start, device_type""".stripMargin

  val anomalyOracle: String =
    s"""$mappingCtes,
       |ctr_results AS ($ctrSelect),
       |with_prev AS (
       |  SELECT window_end, campaign_id, ctr AS current_ctr,
       |         LAG(ctr, 1) OVER (PARTITION BY campaign_id ORDER BY window_end) AS previous_ctr
       |  FROM ctr_results)
       |SELECT window_end AS alert_time, campaign_id, current_ctr, previous_ctr,
       |       CASE WHEN previous_ctr > 0 AND current_ctr > previous_ctr * 2.0 THEN 'SPIKE'
       |            WHEN current_ctr < previous_ctr * 0.5 THEN 'DROP' END AS alert_type
       |FROM with_prev
       |WHERE previous_ctr IS NOT NULL
       |  AND ((previous_ctr > 0 AND current_ctr > previous_ctr * 2.0)
       |       OR current_ctr < previous_ctr * 0.5)
       |ORDER BY alert_time, campaign_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("ctr_by_campaign", ctrByCampaign, Some(ctrOracle)),
    NamedQuery("engagement_by_device", engagementByDevice, Some(engagementOracle)),
    NamedQuery("anomaly_alerts", anomalyAlerts, Some(anomalyOracle)))
}
