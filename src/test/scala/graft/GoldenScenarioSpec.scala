package graft

import graft.fixtures.AdEventGenerator
import graft.ops.EventTime
import graft.pipelines.AdPipelines

import java.sql.Timestamp

/**
 * FIXTURES.md §2 golden scenario: the reference generator's 4-phase boost
 * schedule for camp-1 (generate_events.py:108-121) replayed through the
 * full batch pipeline chain P1 → P2. Deterministic mode makes per-window
 * CTR exactly equal the phase click probability, so the alert sequence is
 * certain: DROP at the 5-min edge, SPIKE at 10, DROP at 15; no other
 * campaign ever alerts.
 */
class GoldenScenarioSpec extends SparkSpec {
  import spark.implicits._

  test("4-phase replay: camp-1 alerts DROP@5, SPIKE@10, DROP@15; others never") {
    val ev = AdEventGenerator.generate(startMs = 0L, minutes = 20,
      impressionsPerMinutePerCampaign = 100, campaigns = 3)
    val i = EventTime.withEventTime(ev.impressions.toDF())
    val c = EventTime.withEventTime(ev.clicks.toDF())
    val j = AdPipelines.joined(i, c)

    val ctr = AdPipelines.ctrByCampaign(j)
    val camp1 = ctr.filter($"campaign_id" === "camp-1")
      .orderBy("window_start").collect()
    assert(camp1.length == 20)
    val ctrSeries = camp1.map(_.getAs[Double]("ctr")).toSeq
    // generator emits exactly round(n*p) clicks per window, so expected ctr
    // is that integer ratio (not p itself — 0.1*0.1 != 1.0/100 in doubles)
    val expected = (0 until 20).map { m =>
      val p = AdEventGenerator.clickProb("camp-1", m.toLong)
      math.round(100 * p).toDouble / 100.0
    }
    assert(ctrSeries == expected, s"ctr series $ctrSeries != $expected")

    val alerts = AdPipelines.anomalyAlerts(ctr).collect()
    val camp1Alerts = alerts.filter(_.getAs[String]("campaign_id") == "camp-1")
      .sortBy(_.getAs[Timestamp]("alert_time").getTime)
    assert(camp1Alerts.map(_.getAs[String]("alert_type")).toSeq ==
      Seq("DROP", "SPIKE", "DROP"))
    // alert_time = window_end of the first window of each new phase
    assert(camp1Alerts.map(_.getAs[Timestamp]("alert_time").getTime / 60000L).toSeq ==
      Seq(6L, 11L, 16L))
    assert(alerts.forall(_.getAs[String]("campaign_id") == "camp-1"),
      "non-target campaigns must never alert")
  }

  test("click_count <= impression_count and ctr in [0,1] across the run") {
    val ev = AdEventGenerator.generate(startMs = 0L, minutes = 10,
      impressionsPerMinutePerCampaign = 50, campaigns = 5,
      deterministic = false, seed = 7L, nullDeviceEvery = 13)
    val i = EventTime.withEventTime(ev.impressions.toDF())
    val c = EventTime.withEventTime(ev.clicks.toDF())
    val j = AdPipelines.joined(i, c)
    val rows = AdPipelines.ctrByCampaign(j).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("click_count") <= r.getAs[Long]("impression_count"))
      val ctr = r.getAs[Double]("ctr")
      assert(ctr >= 0.0 && ctr <= 1.0)
    }
    // engagement partitions the same impressions: totals must agree
    val eng = AdPipelines.engagementByDevice(j).collect()
    assert(eng.map(_.getAs[Long]("impression_count")).sum ==
      rows.map(_.getAs[Long]("impression_count")).sum)
  }
}
