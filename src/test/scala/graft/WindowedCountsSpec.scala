package graft

import graft.ops.{EventTime, WindowedCounts}
import graft.pipelines.AdPipelines
import graft.schema.AdModel.{Click, Impression}
import org.apache.spark.sql.DataFrame

/**
 * FIXTURES.md §3 aggregation micro-fixtures over the real Q1/Q2 pipelines:
 * distinct-count fan-out defense (README.md:127), zero-click CTR guard
 * (flink/flink_job.sql:87-90), NULL device → 'Unknown' (flink_job.sql:106),
 * 60 s window alignment.
 */
class WindowedCountsSpec extends SparkSpec {
  import spark.implicits._

  private def imp(id: String, ts: Long, device: String = "mobile") =
    Impression(id, "user-1", "camp-1", "ad-1", device, "chrome", ts,
      new java.math.BigDecimal("0.10"))

  private def run(imps: Seq[Impression], clks: Seq[Click]): (DataFrame, DataFrame) = {
    val i = EventTime.withEventTime(imps.toDF())
    val c = EventTime.withEventTime(clks.toDF())
    val j = AdPipelines.joined(i, c)
    (AdPipelines.ctrByCampaign(j), AdPipelines.engagementByDevice(j))
  }

  test("fan-out: 1 impression, 3 click rows of which 2 share click_id → counts (1, 2)") {
    val (ctr, _) = run(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 61000L),
        Click("c1", "a", "user-1", 62000L), // duplicate click_id
        Click("c2", "a", "user-1", 63000L)))
    val r = ctr.collect().head
    assert(r.getAs[Long]("impression_count") == 1L)
    assert(r.getAs[Long]("click_count") == 2L)
    assert(r.getAs[Double]("ctr") == 2.0)
  }

  test("zero-click window → click_count 0, ctr 0.0 via CASE guard") {
    val (ctr, _) = run(Seq(imp("a", 60000L), imp("b", 61000L)), Seq.empty)
    val r = ctr.collect().head
    assert(r.getAs[Long]("impression_count") == 2L)
    assert(r.getAs[Long]("click_count") == 0L)
    assert(r.getAs[Double]("ctr") == 0.0)
  }

  test("windows are 60 s epoch-aligned, half-open, keyed by impression time") {
    // impressions at 59_999 and 60_000 land in different windows; the click
    // at 125_000 (window 2 by its own time) counts toward window 1's
    // impression because window assignment uses impression event time.
    val (ctr, _) = run(Seq(imp("a", 59999L), imp("b", 60000L)),
      Seq(Click("c1", "b", "user-1", 125000L)))
    val rows = ctr.collect()
    assert(rows.length == 2)
    val byStart = rows.map(r =>
      r.getAs[java.sql.Timestamp]("window_start").getTime -> r).toMap
    assert(byStart.keySet == Set(0L, 60000L))
    assert(byStart(60000L).getAs[Long]("click_count") == 1L)
    rows.foreach { r =>
      val s = r.getAs[java.sql.Timestamp]("window_start").getTime
      val e = r.getAs[java.sql.Timestamp]("window_end").getTime
      assert(s % 60000L == 0 && e == s + 60000L)
    }
  }

  test("NULL device_type groups under 'Unknown'") {
    val (_, eng) = run(
      Seq(imp("a", 1000L, device = null), imp("b", 2000L, device = "mobile")),
      Seq.empty)
    val devices = eng.collect().map(_.getAs[String]("device_type")).toSet
    assert(devices == Set("Unknown", "mobile"))
  }

  test("engagement output has no ctr column (flink_job.sql:59-71)") {
    val (_, eng) = run(Seq(imp("a", 1000L)), Seq.empty)
    assert(!eng.columns.contains("ctr"))
    assert(eng.columns.toSeq == Seq("window_start", "window_end",
      "device_type", "impression_count", "click_count"))
  }

  test("HLL approx twin matches exact counts on the golden scenario") {
    import graft.fixtures.AdEventGenerator
    import graft.ops.{EventTime, WindowedCounts}
    import graft.pipelines.AdPipelines
    import org.apache.spark.sql.functions.col
    val ev = AdEventGenerator.generate(startMs = 0L, minutes = 10,
      impressionsPerMinutePerCampaign = 60, campaigns = 3)
    val j = AdPipelines.joined(
      EventTime.withEventTime(ev.impressions.toDF()),
      EventTime.withEventTime(ev.clicks.toDF()))
    val exact = AdPipelines.ctrByCampaign(j).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("campaign_id")) ->
        (r.getAs[Long]("impression_count"), r.getAs[Long]("click_count"))).toMap
    val approx = WindowedCounts.ctrAggApprox(j,
      groupKey = col("i.campaign_id"), keyOut = "campaign_id",
      timeCol = col("i.event_time"), windowLength = "1 minute",
      distinctA = col("i.impression_id"), distinctB = col("c.click_id"),
      withRatio = true).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val key = (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("campaign_id"))
      val (ei, ec) = exact(key)
      val (ai, ac) = (r.getAs[Long]("impression_count"), r.getAs[Long]("click_count"))
      // rsd=0.01 with per-window cardinalities ≤ 60: HLL++ sparse mode is
      // exact here; allow a 5% slack so the test documents the contract,
      // not the implementation detail
      assert(math.abs(ai - ei) <= math.max(1L, (ei * 0.05).toLong), s"$key impressions $ai vs $ei")
      assert(math.abs(ac - ec) <= math.max(1L, (ec * 0.05).toLong), s"$key clicks $ac vs $ec")
    }
  }

  test("hopping windows: every impression covered by exactly length/slide " +
    "overlapping windows, each window's counts equal its own span's") {
    import org.apache.spark.sql.functions.col
    // impressions at 59_999 / 60_000 / 90_000 ms; 2-min windows sliding
    // every 1 min. 59_999 → windows starting at -60_000 and 0;
    // 60_000 and 90_000 → windows at 0 and 60_000.
    val i = EventTime.withEventTime(Seq(
      imp("a", 59999L), imp("b", 60000L), imp("c", 90000L)).toDF())
    val c = EventTime.withEventTime(
      Seq(Click("c1", "a", "user-1", 61000L)).toDF())
    val j = AdPipelines.joined(i, c)
    val hop = WindowedCounts.ctrAggHopping(j,
      groupKey = col("i.campaign_id"), keyOut = "campaign_id",
      timeCol = col("i.event_time"), windowLength = "120 seconds",
      slide = "60 seconds",
      distinctA = col("i.impression_id"), distinctB = col("c.click_id"),
      withRatio = true).collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime ->
        (r.getAs[Long]("impression_count"), r.getAs[Long]("click_count"))).toMap
    assert(hop == Map(
      -60000L -> (1L, 1L),     // covers only a (and a's click)
      0L -> (3L, 1L),          // covers a, b, c
      60000L -> (2L, 0L)))     // covers b, c — a (and its click) aged out
    // every impression appears in exactly windowLength/slide = 2 windows
    assert(hop.values.map(_._1).sum == 3 * 2)
    // sanity: window spans are length-wide, slide-spaced
    assert(hop.keySet.toSeq.sorted == Seq(-60000L, 0L, 60000L))
  }
}
