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
