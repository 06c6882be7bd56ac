package graft

import graft.ops.AnomalyDetect

import java.sql.Timestamp

/**
 * FIXTURES.md §3 LAG-chain fixture + the reference's exact guard semantics
 * (flink/anomaly_job.sql:62-84): SPIKE needs previous_ctr > 0; DROP does
 * not; first row per campaign never alerts.
 */
class AnomalyDetectSpec extends SparkSpec {
  import spark.implicits._

  private def ctrFrame(series: Seq[(String, Long, Double)]) =
    series.map { case (camp, minute, ctr) =>
      (new Timestamp(minute * 60000L), new Timestamp((minute + 1) * 60000L),
        camp, 100L, (ctr * 100).toLong, ctr)
    }.toDF("window_start", "window_end", "campaign_id",
      "impression_count", "click_count", "ctr")

  test("LAG chain [0.10, 0.10, 0.04, 0.40, 0.10] → [none, none, DROP, SPIKE, DROP]") {
    val alerts = AnomalyDetect.alerts(ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-1", 1, 0.10), ("camp-1", 2, 0.04),
      ("camp-1", 3, 0.40), ("camp-1", 4, 0.10))))
      .orderBy("alert_time").collect()
    assert(alerts.map(_.getAs[String]("alert_type")).toSeq ==
      Seq("DROP", "SPIKE", "DROP"))
    assert(alerts.map(_.getAs[Timestamp]("alert_time").getTime / 60000L).toSeq ==
      Seq(3L, 4L, 5L)) // alert_time = window_end of windows 2, 3, 4
  }

  test("first row per campaign never alerts (LAG NULL filtered)") {
    val alerts = AnomalyDetect.alerts(ctrFrame(Seq(
      ("camp-1", 0, 0.90), ("camp-2", 0, 0.0)))).collect()
    assert(alerts.isEmpty)
  }

  test("0 → positive is NOT a spike (previous_ctr > 0 guard)") {
    val alerts = AnomalyDetect.alerts(ctrFrame(Seq(
      ("camp-1", 0, 0.0), ("camp-1", 1, 0.5)))).collect()
    assert(alerts.isEmpty)
  }

  test("positive → 0 IS a drop (no guard on the DROP arm)") {
    val alerts = AnomalyDetect.alerts(ctrFrame(Seq(
      ("camp-1", 0, 0.2), ("camp-1", 1, 0.0)))).collect()
    assert(alerts.map(_.getAs[String]("alert_type")).toSeq == Seq("DROP"))
  }

  test("exact 2x is not a spike; exact 0.5x is not a drop (strict inequalities)") {
    val alerts = AnomalyDetect.alerts(ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-1", 1, 0.20), ("camp-1", 2, 0.10)))).collect()
    assert(alerts.isEmpty)
  }

  test("minImpressions noise filter drops low-traffic windows BEFORE the LAG") {
    // the reference's optional filter (flink/anomaly_job.sql:59-60) sits
    // in the view, so the LAG chains ACROSS a removed window
    val series = Seq(
      (ts(0), ts(1), "camp-1", 100L, 10L, 0.10),
      (ts(1), ts(2), "camp-1", 5L, 4L, 0.90), // low traffic: 5 impressions
      (ts(2), ts(3), "camp-1", 100L, 10L, 0.10))
      .toDF("window_start", "window_end", "campaign_id",
        "impression_count", "click_count", "ctr")
    // default (off): the noisy window both SPIKEs and then DROPs
    assert(AnomalyDetect.alerts(series).collect()
      .map(_.getAs[String]("alert_type")).sorted.toSeq == Seq("DROP", "SPIKE"))
    // threshold 10: window 1 is gone, LAG sees 0.10 → 0.10 — silence
    assert(AnomalyDetect.alerts(series, minImpressions = 10L).collect().isEmpty)
    // streaming twin, batch-executed: same fixture, same silence
    assert(graft.streaming.StreamingAnomaly.alerts(series, minImpressions = 10L)
      .collect().isEmpty)
    assert(graft.streaming.StreamingAnomaly.alerts(series)
      .collect().map(_.alert_type).sorted.toSeq == Seq("DROP", "SPIKE"))
  }

  private def ts(minute: Long) = new Timestamp(minute * 60000L)

  test("zscore: outlier vs noisy baseline alerts HIGH; baseline rows stay quiet") {
    // baseline ~0.10 with spread, then a clear outlier at minute 6
    val frame = ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-1", 1, 0.12), ("camp-1", 2, 0.09),
      ("camp-1", 3, 0.11), ("camp-1", 4, 0.10), ("camp-1", 5, 0.12),
      ("camp-1", 6, 0.50)))
    val alerts = AnomalyDetect.zscoreAlerts(frame).collect()
    assert(alerts.length == 1)
    assert(alerts.head.getAs[String]("alert_type") == "HIGH")
    assert(alerts.head.getAs[Timestamp]("alert_time").getTime / 60000L == 7L)
    // z = (0.50 - mean(prior 6)) / stddev_samp(prior 6), both rounded
    val prior = Seq(0.10, 0.12, 0.09, 0.11, 0.10, 0.12)
    val mu = prior.sum / prior.size
    val sd = math.sqrt(prior.map(x => (x - mu) * (x - mu)).sum / (prior.size - 1))
    assert(alerts.head.getAs[Double]("mean_value") ==
      BigDecimal(mu).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(alerts.head.getAs[Double]("zscore") - (0.50 - mu) / sd) < 1e-5)
  }

  test("zscore: low outlier alerts LOW") {
    val alerts = AnomalyDetect.zscoreAlerts(ctrFrame(Seq(
      ("camp-1", 0, 0.50), ("camp-1", 1, 0.52), ("camp-1", 2, 0.49),
      ("camp-1", 3, 0.51), ("camp-1", 4, 0.01)))).collect()
    assert(alerts.map(_.getAs[String]("alert_type")).toSeq == Seq("LOW"))
  }

  test("zscore: warm-up gate — no alert until minPoints prior windows") {
    // second row is wildly off but has only 1 prior point
    val alerts = AnomalyDetect.zscoreAlerts(ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-1", 1, 0.90), ("camp-1", 2, 0.10)))).collect()
    assert(alerts.isEmpty)
  }

  test("zscore: zero-variance baseline never alerts (flat-then-jump is the LAG rule's case)") {
    val alerts = AnomalyDetect.zscoreAlerts(ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-1", 1, 0.10), ("camp-1", 2, 0.10),
      ("camp-1", 3, 0.10), ("camp-1", 4, 0.90)))).collect()
    assert(alerts.isEmpty)
  }

  test("zscore: lookback bounds the baseline frame") {
    // early regime is wild (0.10/0.50 swings), recent regime is tight
    // (~0.30-0.31); current 0.40 is an outlier ONLY against the tight
    // recent frame — a short lookback fires, the default-8 frame still
    // contains the wild era's spread and stays quiet
    val series = ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-1", 1, 0.50), ("camp-1", 2, 0.10),
      ("camp-1", 3, 0.30), ("camp-1", 4, 0.31), ("camp-1", 5, 0.30),
      ("camp-1", 6, 0.31), ("camp-1", 7, 0.40)))
    val short = AnomalyDetect.zscoreAlerts(series, lookback = 3).collect()
    assert(short.map(r => (r.getAs[Timestamp]("alert_time").getTime / 60000L,
      r.getAs[String]("alert_type"))).toSeq == Seq((8L, "HIGH")))
    assert(AnomalyDetect.zscoreAlerts(series).collect().isEmpty)
  }

  // (campaign, day, hour-of-day, value) → hourly series frame
  private def hourFrame(rows: Seq[(String, Int, Int, Double)]) =
    rows.map { case (c, d, h, v) =>
      (new Timestamp((d * 24L + h) * 3600000L), c, v)
    }.toDF("window_end", "campaign_id", "v")

  test("seasonal: outlier alerts against its own hour-of-day cell only") {
    // 8 days, two active hours: hod 0 ~100, hod 12 ~50, both with ±1
    // alternation; day 2's hod-0 window spikes to 500
    val rows = (0 until 8).flatMap { d =>
      Seq(("camp-1", d, 0, if (d == 2) 500.0 else 100.0 + (d % 2)),
        ("camp-1", d, 12, 50.0 + (d % 2)))
    }
    val alerts = AnomalyDetect.seasonalAlerts(hourFrame(rows), valueCol = "v")
      .collect()
    assert(alerts.length == 1)
    assert(alerts.head.getAs[String]("alert_type") == "HIGH")
    assert(alerts.head.getAs[Int]("hour_of_day") == 0)
    assert(alerts.head.getAs[Timestamp]("alert_time").getTime ==
      2L * 24 * 3600000L)
  }

  test("seasonal: strict daily periodicity is NOT an anomaly (zero-variance cells)") {
    val rows = (0 until 8).flatMap { d =>
      Seq(("camp-1", d, 0, 100.0), ("camp-1", d, 12, 50.0))
    }
    assert(AnomalyDetect.seasonalAlerts(hourFrame(rows), valueCol = "v")
      .collect().isEmpty)
  }

  test("seasonal: warm-up gate — cells under minPoints never alert") {
    // 3 days < default minPoints 4, outlier included
    val rows = (0 until 3).flatMap { d =>
      Seq(("camp-1", d, 0, if (d == 2) 500.0 else 100.0 + (d % 2)))
    }
    assert(AnomalyDetect.seasonalAlerts(hourFrame(rows), valueCol = "v")
      .collect().isEmpty)
  }

  test("seasonal: cells are per-campaign — another campaign's outlier can't leak") {
    val rows = (0 until 8).flatMap { d =>
      Seq(("camp-1", d, 0, 100.0 + (d % 2)),
        ("camp-2", d, 0, if (d == 2) 500.0 else 100.0 + (d % 2)))
    }
    val alerts = AnomalyDetect.seasonalAlerts(hourFrame(rows), valueCol = "v")
      .collect()
    assert(alerts.map(_.getAs[String]("campaign_id")).toSeq == Seq("camp-2"))
  }

  test("MAD: an extreme point that MASKS itself from the mean/std " +
    "baseline still alerts against the median/MAD baseline") {
    // 11 near-constant windows (100 ± 1) + one 10× spike. The spike
    // inflates the series stddev so much its own z-score stays under
    // threshold (self-masking — the classic robust-statistics case);
    // the median/MAD baseline moves by at most one rank, so the
    // modified z-score flags it hard.
    val rows = (0 until 11).map(h => ("camp-1", 0, h, 100.0 + (h % 2))) :+
      (("camp-1", 0, 11, 1000.0))
    val df = hourFrame(rows)
    val mad = AnomalyDetect.madAlerts(df, valueCol = "v").collect()
    assert(mad.length == 1)
    assert(mad.head.getAs[Double]("current_value") == 1000.0)
    assert(mad.head.getAs[String]("alert_type") == "HIGH")
    // the seasonal mean/std detector on the same single-cell shape
    // misses it: z = (1000-175)/260 ≈ 3.2... with leave-one-in stddev
    // inflation the z stays under a 3.5-grade bar while the modified
    // z-score is ≈ 12× the 3.5 cutoff
    assert(math.abs(mad.head.getAs[Double]("robust_z")) > 3.5 * 10)
    // zero-MAD guard: a majority-constant series never alerts
    val flat = (0 until 11).map(h => ("camp-1", 0, h, 100.0)) :+
      (("camp-1", 0, 11, 1000.0))
    assert(AnomalyDetect.madAlerts(hourFrame(flat), valueCol = "v")
      .collect().isEmpty)
    // warm-up: under minPoints never alerts
    val short = Seq(("camp-1", 0, 0, 100.0), ("camp-1", 0, 1, 101.0),
      ("camp-1", 0, 2, 1000.0))
    assert(AnomalyDetect.madAlerts(hourFrame(short), valueCol = "v")
      .collect().isEmpty)
  }

  test("partitions are independent per campaign") {
    val alerts = AnomalyDetect.alerts(ctrFrame(Seq(
      ("camp-1", 0, 0.10), ("camp-2", 1, 0.50), ("camp-1", 2, 0.10)))).collect()
    assert(alerts.isEmpty) // camp-2's 0.50 must not read camp-1's 0.10 as prev
  }
}
