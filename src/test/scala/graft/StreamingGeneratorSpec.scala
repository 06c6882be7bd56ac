package graft

import graft.fixtures.StreamingEventGenerator
import graft.streaming.StreamingPipelines
import org.apache.spark.sql.functions._

/**
 * The rate-driven streaming generator feeds the full pipeline live: run it
 * for a few wall-clock seconds, then check the produced events respect the
 * reference's invariants (keyspace, click ratio bounds, delay window) and
 * that the windowed ctr aggregation consumes it without error.
 *
 * A rate source never drains, so `processAllAvailable` would chase fresh
 * rows forever — the tests poll the sink with a deadline and then stop the
 * query before asserting on what accumulated.
 */
class StreamingGeneratorSpec extends SparkSpec {

  /** Poll `cond` every 250 ms until true or `deadlineMs` elapses. */
  private def awaitOrTimeout(deadlineMs: Long)(cond: => Boolean): Boolean = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < end) { Thread.sleep(250); ok = cond }
    ok
  }

  test("generator events respect the reference keyspace and click semantics") {
    val (impressions, clicks) = StreamingEventGenerator.events(
      spark, rowsPerSecond = 500, startMs = 3600000L, campaigns = 3)

    val qi = impressions.writeStream.format("memory")
      .queryName("gen_impr").outputMode("append").start()
    val qc = clicks.writeStream.format("memory")
      .queryName("gen_clicks").outputMode("append").start()
    try {
      assert(awaitOrTimeout(30000L)(
        spark.table("gen_impr").count() > 500 &&
          spark.table("gen_clicks").count() > 10),
        "generator produced too few events in 30 s")
    } finally { qi.stop(); qc.stop() }

    val imps = spark.table("gen_impr").cache()
    val clks = spark.table("gen_clicks").cache()
    val n = imps.count()

    // keyspace (generate_events.py:25-29)
    assert(imps.select("campaign_id").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("camp-1", "camp-2", "camp-3")))
    assert(imps.select("device_type").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(Set("mobile", "desktop", "tablet")))

    // click ratio: base 0.1 with phase-1 boost 1.0 → expect ~10%
    val ratio = clks.count().toDouble / n
    assert(ratio > 0.02 && ratio < 0.3, s"click ratio $ratio out of band")

    // clicks reference emitted impressions within the 500-10000 ms delay
    // window (generate_events.py:145); the final click may reference an
    // impression emitted after the impression query stopped, so join
    val delays = clks.alias("c").join(imps.alias("i"), "impression_id")
      .select((col("c.event_timestamp") - col("i.event_timestamp")).as("delay"))
      .collect().map(_.getLong(0))
    assert(delays.nonEmpty)
    assert(delays.forall(d => d >= 500L && d <= 10000L),
      s"delays out of band: ${delays.filterNot(d => d >= 500L && d <= 10000L).take(5).toSeq}")
  }

  test("pipeline consumes the live generator end to end") {
    // 2 s of simulated time per row × 1000 rows/s = 2000× real time: the
    // 1-min windows + 10-min join bound + watermark flush in wall-seconds
    val (impressions, clicks) = StreamingEventGenerator.events(
      spark, rowsPerSecond = 1000, startMs = 3600000L, campaigns = 3,
      simMsPerRow = 2000L)
    val joined = StreamingPipelines.joinedStream(
      impressions, clicks, watermarkDelay = "2 seconds")
    val q = StreamingPipelines.ctrByCampaign(joined)
      .writeStream.format("memory").queryName("gen_ctr")
      .outputMode("append").start()
    try {
      assert(awaitOrTimeout(60000L)(spark.table("gen_ctr").count() > 0),
        "no windows emitted from the live generator in 60 s")
    } finally q.stop()
  }
}
