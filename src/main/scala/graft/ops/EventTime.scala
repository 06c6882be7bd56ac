package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time derivation + watermarking (SURVEY §2.1 S5/S6, §2.6 T1).
 *
 * Reference: computed columns `event_time AS TO_TIMESTAMP_LTZ(event_timestamp, 3)`
 * (flink/flink_job.sql:14,31), `event_time AS window_end`
 * (flink/anomaly_job.sql:16), and bounded-out-of-orderness watermarks
 * `WATERMARK FOR event_time AS event_time - INTERVAL 'n' SECOND`
 * (flink/flink_job.sql:15,32; flink/anomaly_job.sql:18).
 *
 * Spark-first: `timestamp_millis` is a codegen'd built-in (no UDF), and
 * `withWatermark` is Structured Streaming's equivalent of Flink's
 * bounded-out-of-orderness watermark — both drive late-row dropping and
 * state GC. On a batch DataFrame `withWatermark` is a no-op, so the same
 * builder serves both modes.
 */
object EventTime {

  /** S5: epoch-ms BIGINT → TIMESTAMP event_time, as a read-time projection. */
  def withEventTime(df: DataFrame, millisCol: String = "event_timestamp",
                    eventTimeCol: String = "event_time"): DataFrame =
    df.withColumn(eventTimeCol, timestamp_millis(col(millisCol)))

  /** T1: watermark for streaming inputs; identity for batch DataFrames.
    * S6 (`event_time AS window_end`, flink/anomaly_job.sql:16) is
    * expressed by watermarking that column directly — see
    * [[graft.streaming.StreamingAnomaly.alerts]]. */
  def watermarked(df: DataFrame, delay: String,
                  eventTimeCol: String = "event_time"): DataFrame =
    if (df.isStreaming) df.withWatermark(eventTimeCol, delay) else df
}
