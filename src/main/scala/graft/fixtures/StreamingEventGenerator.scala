package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Streaming twin of [[AdEventGenerator]] — the reference's continuously
 * running generator container (data-generator/generate_events.py driven by
 * EVENT_RATE, docker-compose.yml:121) as a Spark `rate` source.
 *
 * Each rate-source row becomes one impression; clicks are derived from the
 * same monotone row index by a deterministic per-row draw (xxhash64-based,
 * so the stream is reproducible run-to-run) against the 4-phase boost
 * schedule (generate_events.py:108-121), with the reference's 500–10000 ms
 * click delay (generate_events.py:145). Feed [[graft.streaming.JsonStreams.encode]]
 * into a topic, or plug the frames straight into
 * [[graft.streaming.StreamingPipelines]].
 *
 * Event time is derived from the row index (startMs + index/rate seconds),
 * not wall clock, so watermarks advance smoothly at exactly `rate` events
 * per simulated second regardless of processing jitter.
 */
object StreamingEventGenerator {

  private def boostExpr(minuteCol: org.apache.spark.sql.Column,
                        campaignCol: org.apache.spark.sql.Column) =
    when(campaignCol =!= "camp-1", 1.0)
      .when(minuteCol < 5, 1.0)
      .when(minuteCol < 10, 0.1)
      .when(minuteCol < 15, 4.0)
      .otherwise(1.0)

  /** Uniform-ish [0, 1) draw from a seeded hash of the row index. */
  private def draw(idx: org.apache.spark.sql.Column, salt: Int) =
    (pmod(xxhash64(idx, lit(salt)), lit(1000000L)).cast("double") / 1000000.0)

  /**
   * @param rowsPerSecond impressions per wall-clock second (EVENT_RATE)
   * @param startMs       simulated epoch-ms of row 0 (minute-aligned)
   * @param campaigns     camp-1..camp-n keyspace
   * @param simMsPerRow   simulated milliseconds between consecutive rows;
   *                      0 (default) = real-time pacing (1000/rate, like
   *                      the reference generator), larger values compress
   *                      time so tests cross window/join/watermark bounds
   *                      in wall-seconds instead of wall-minutes
   * @param skewShare     hot-key regime (the EventScaleSmoke axis on the
   *                      STREAMING side, r15): this share of all rows is
   *                      routed to `hotCampaign` by an independent draw,
   *                      the rest keep the uniform pick. 0 (default) =
   *                      the unchanged uniform generator.
   * @param hotCampaign   the key receiving the skewed share
   * @return (impressions, clicks) streaming frames in the reference's
   *         column layout; clicks carry the Bernoulli draw + delay
   */
  def events(spark: SparkSession, rowsPerSecond: Int = 50,
             startMs: Long = 0L, campaigns: Int = 10,
             clickRatio: Double = 0.1, ctrCap: Double = 0.6,
             simMsPerRow: Long = 0L,
             skewShare: Double = 0.0, hotCampaign: String = "camp-1")
      : (DataFrame, DataFrame) = {
    require(skewShare >= 0.0 && skewShare <= 1.0, s"skewShare $skewShare")
    // double-based pacing: integer 1000/rate would be 0 above 1000 rows/s
    // (frozen event time, watermark never advances) and ~2x off for 501-999
    val msPerRowExpr =
      if (simMsPerRow > 0) col("idx") * simMsPerRow
      else (col("idx") * (1000.0 / rowsPerSecond)).cast("long")
    // independent per-attribute draws (distinct salts) — raw idx moduli
    // would arithmetically correlate campaign/device/user the way the
    // reference's independent random.choice calls never do
    def pick(salt: Int, n: Int) = pmod(xxhash64(col("idx"), lit(salt)), lit(n)) + 1
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(col("value").as("idx"))
      .withColumn("event_timestamp", lit(startMs) + msPerRowExpr)
      .withColumn("minute", ((col("event_timestamp") - startMs) / 60000L).cast("long"))
      .withColumn("campaign_id",
        when(lit(skewShare) > 0.0 && draw(col("idx"), 15) < skewShare,
          lit(hotCampaign))
          .otherwise(concat(lit("camp-"), pick(10, campaigns).cast("string"))))

    val impressions = base.select(
      concat(lit("imp-"), col("idx")).as("impression_id"),
      concat(lit("user-"), pick(11, 10000)).as("user_id"),
      col("campaign_id"),
      concat(lit("ad-"), pick(12, 100)).as("ad_id"),
      element_at(array(lit("mobile"), lit("desktop"), lit("tablet")),
        pick(13, 3).cast("int")).as("device_type"),
      element_at(array(lit("chrome"), lit("safari"), lit("firefox"), lit("edge")),
        pick(14, 4).cast("int")).as("browser"),
      col("event_timestamp"),
      lit(new java.math.BigDecimal("0.25")).as("cost"))

    val p = least(lit(ctrCap), lit(clickRatio) * boostExpr(col("minute"), col("campaign_id")))
    val clicks = base
      .filter(draw(col("idx"), 1) < p)
      .select(
        concat(lit("clk-"), col("idx")).as("click_id"),
        concat(lit("imp-"), col("idx")).as("impression_id"),
        // same salt as the impression side: the click copies the
        // impression's user (generate_events.py:149)
        concat(lit("user-"), pick(11, 10000)).as("user_id"),
        (col("event_timestamp") + 500L +
          pmod(xxhash64(col("idx"), lit(2)), lit(9500L))).as("event_timestamp"))

    (impressions, clicks)
  }
}
