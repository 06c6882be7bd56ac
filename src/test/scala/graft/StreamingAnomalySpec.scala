package graft

import graft.fixtures.AdEventGenerator
import graft.ops.EventTime
import graft.pipelines.AdPipelines
import graft.schema.AdModel.CtrResult
import graft.streaming.StreamingAnomaly
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/**
 * Streaming LAG parity (SURVEY §7.5): `StreamingAnomaly.alerts` run as a
 * streaming query over the golden scenario's ctr series — split across
 * micro-batches so the per-campaign state genuinely carries (window_end,
 * ctr) between batches — must emit exactly the alerts of the batch
 * `AnomalyDetect.alerts` window-function form (flink/anomaly_job.sql:45-84).
 */
class StreamingAnomalySpec extends SparkSpec {
  import spark.implicits._

  private def goldenCtr(): Seq[CtrResult] = {
    val ev = AdEventGenerator.generate(startMs = 3600000L, minutes = 20,
      impressionsPerMinutePerCampaign = 50, campaigns = 3)
    val i = EventTime.withEventTime(ev.impressions.toDF())
    val c = EventTime.withEventTime(ev.clicks.toDF())
    AdPipelines.ctrByCampaign(AdPipelines.joined(i, c))
      .as[CtrResult].collect().toIndexedSeq.sortBy(_.window_end.getTime)
  }

  test("flatMapGroupsWithState LAG emits the batch alerts across micro-batches") {
    val ctr = goldenCtr()
    val want = AdPipelines.anomalyAlerts(
      spark.createDataset(ctr).toDF()).collect().map(_.toSeq).toSet
    assert(want.nonEmpty, "golden scenario must produce alerts")

    val stream = MemoryStream[CtrResult](spark)
    val q = StreamingAnomaly.alerts(stream.toDF())
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      // three arbitrary time-ordered chunks: state must carry across them
      val cut1 = ctr.length / 3
      val cut2 = 2 * ctr.length / 3
      stream.addData(ctr.slice(0, cut1)); q.processAllAvailable()
      stream.addData(ctr.slice(cut1, cut2)); q.processAllAvailable()
      stream.addData(ctr.slice(cut2, ctr.length)); q.processAllAvailable()

      val got = spark.table("anomaly_stream").collect().map(_.toSeq).toSet
      assert(got == want,
        s"alert mismatch: only-streaming=${got -- want}, only-batch=${want -- got}")
    } finally q.stop()
  }

  test("batch execution of the state operator matches the window-function form") {
    val ctr = goldenCtr()
    val df = spark.createDataset(ctr).toDF()
    val got = StreamingAnomaly.alerts(df).toDF().collect().map(_.toSeq).toSet
    val want = AdPipelines.anomalyAlerts(df).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("frozen-baseline MAD detector: stateless on a stream, batch-formula " +
    "parity at the same statistics, unseen keys and warm-up never alert") {
    import graft.ops.AnomalyDetect
    // landed series: camp-1 daily volumes around 100 ± 1 (8 points)
    val landed = (0 until 8).map(d =>
      ("camp-1", new Timestamp(d * 86400000L), 100.0 + d % 2))
      .toDF("campaign_id", "window_end", "v")
    val baseline = AnomalyDetect.madBaseline(landed, valueCol = "v")
    // arrivals: one normal window, one outlier vs the LANDED baseline,
    // one window from a key with no baseline, one from a short key
    val shortBaseline = AnomalyDetect.madBaseline(
      Seq(("camp-9", new Timestamp(0L), 50.0),
        ("camp-9", new Timestamp(86400000L), 51.0))
        .toDF("campaign_id", "window_end", "v"), valueCol = "v")
    val allBase = baseline.unionByName(shortBaseline)
    val arrivals = Seq(
      ("camp-1", new Timestamp(30L * 86400000L), 101.0),
      ("camp-1", new Timestamp(31L * 86400000L), 900.0),
      ("camp-7", new Timestamp(32L * 86400000L), 900.0),
      ("camp-9", new Timestamp(33L * 86400000L), 900.0))
    val stream = MemoryStream[(String, Timestamp, Double)](spark)
    val out = AnomalyDetect.madAlertsStream(
      stream.toDF().toDF("campaign_id", "window_end", "v"), allBase,
      valueCol = "v")
    stream.addData(arrivals: _*)
    val q = out.writeStream.format("memory").queryName("smad")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("smad").collect()
        .map(r => (r.getAs[String]("campaign_id"),
          r.getAs[Double]("current_value"), r.getAs[String]("alert_type"),
          r.getAs[Double]("robust_z")))
      // only the camp-1 outlier alerts: camp-7 has no baseline, camp-9
      // is under the warm-up floor, 101.0 is within threshold
      assert(got.length == 1 && got.head._1 == "camp-1" &&
        got.head._2 == 900.0 && got.head._3 == "HIGH")
      // formula parity: the batch detector's statistic over the landed
      // series + the arrival equals the frozen form's z up to the
      // leave-one-in-vs-frozen baseline difference — at 8 near-constant
      // landed points the median/MAD are IDENTICAL (one extra point
      // moves a 9-point median to the same 100.5/0.5), so z matches the
      // hand value exactly
      val z = got.head._4
      assert(math.abs(z - 0.6745 * (900.0 - 100.5) / 0.5) < 1e-3, s"z=$z")
    } finally q.stop()
  }

  test("alert predicate edge cases match the reference guards") {
    // SPIKE needs prev > 0; DROP has no guard (x -> 0 IS a drop)
    assert(StreamingAnomaly.alertType(current = 0.5, previous = 0.0).isEmpty)
    assert(StreamingAnomaly.alertType(current = 0.0, previous = 0.2).contains("DROP"))
    assert(StreamingAnomaly.alertType(current = 0.41, previous = 0.2).contains("SPIKE"))
    assert(StreamingAnomaly.alertType(current = 0.4, previous = 0.2).isEmpty)
    assert(StreamingAnomaly.alertType(current = 0.1, previous = 0.2).isEmpty)
    assert(StreamingAnomaly.alertType(current = 0.099, previous = 0.2).contains("DROP"))
  }
}
