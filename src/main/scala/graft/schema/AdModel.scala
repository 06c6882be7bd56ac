package graft.schema

import org.apache.spark.sql.types._

/**
 * Data model of the ad-analytics pipeline, re-expressed as Spark schemas.
 *
 * The reference declares these shapes as Flink DDL over Kafka JSON topics:
 *  - impressions: flink/flink_job.sql:5-15 (spec INSTRUCTIONS.md:34-46)
 *  - clicks:      flink/flink_job.sql:26-32
 *  - ctr_result:  flink/flink_job.sql:44-57 (re-read flink/anomaly_job.sql:8-18)
 *  - engagement_result: flink/flink_job.sql:59-71
 *  - anomaly_alert:     flink/anomaly_job.sql:31-43
 *
 * Spark-first mapping: fixed `StructType`s used by `from_json` for streaming
 * decode and by `Dataset[T]` encoders in tests. The DDL's computed column
 * `event_time AS TO_TIMESTAMP_LTZ(event_timestamp, 3)` (flink_job.sql:14,31)
 * is a read-time projection, applied by [[graft.ops.EventTime.withEventTime]].
 */
object AdModel {

  /** flink/flink_job.sql:5-15 — `cost` is declared but unused by any query. */
  val impressionSchema: StructType = StructType(Seq(
    StructField("impression_id", StringType),
    StructField("user_id", StringType),
    StructField("campaign_id", StringType),
    StructField("ad_id", StringType),
    StructField("device_type", StringType),
    StructField("browser", StringType),
    StructField("event_timestamp", LongType), // epoch millis
    StructField("cost", DecimalType(10, 2))
  ))

  /** flink/flink_job.sql:26-32 */
  val clickSchema: StructType = StructType(Seq(
    StructField("click_id", StringType),
    StructField("impression_id", StringType),
    StructField("user_id", StringType),
    StructField("event_timestamp", LongType)
  ))

  /** flink/flink_job.sql:44-57 / flink/anomaly_job.sql:8-18 */
  val ctrResultSchema: StructType = StructType(Seq(
    StructField("window_start", TimestampType),
    StructField("window_end", TimestampType),
    StructField("campaign_id", StringType),
    StructField("impression_count", LongType),
    StructField("click_count", LongType),
    StructField("ctr", DoubleType)
  ))

  /** flink/flink_job.sql:59-71 — no ctr column. */
  val engagementResultSchema: StructType = StructType(Seq(
    StructField("window_start", TimestampType),
    StructField("window_end", TimestampType),
    StructField("device_type", StringType),
    StructField("impression_count", LongType),
    StructField("click_count", LongType)
  ))

  /** flink/anomaly_job.sql:31-43 */
  val anomalyAlertSchema: StructType = StructType(Seq(
    StructField("alert_time", TimestampType),
    StructField("campaign_id", StringType),
    StructField("current_ctr", DoubleType),
    StructField("previous_ctr", DoubleType),
    StructField("alert_type", StringType)
  ))

  // Typed twins for Dataset[T] surfaces (tests, flatMapGroupsWithState).
  final case class Impression(
      impression_id: String, user_id: String, campaign_id: String,
      ad_id: String, device_type: String, browser: String,
      event_timestamp: Long, cost: java.math.BigDecimal)

  final case class Click(
      click_id: String, impression_id: String, user_id: String,
      event_timestamp: Long)

  final case class CtrResult(
      window_start: java.sql.Timestamp, window_end: java.sql.Timestamp,
      campaign_id: String, impression_count: Long, click_count: Long,
      ctr: Double)

  final case class AnomalyAlert(
      alert_time: java.sql.Timestamp, campaign_id: String,
      current_ctr: Double, previous_ctr: Double, alert_type: String)
}
