package graft.ops

import org.apache.spark.sql.DataFrame
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
}
