package graft.fixtures

import graft.schema.AdModel.{Click, Impression}

import scala.util.Random

/**
 * Deterministic port of the reference's event generator semantics
 * (data-generator/generate_events.py) — the repo's only "golden scenario"
 * (SURVEY §2.7, FIXTURES.md §2). Test fixture, not an engine operator.
 *
 * Reference semantics reproduced:
 *  - keyspace: camp-{1..10}, ad-{1..100}, user-{1..10000}, devices
 *    mobile/desktop/tablet, browsers chrome/safari/firefox/edge
 *    (generate_events.py:25-29)
 *  - camp-1 is the anomaly target (generate_events.py:32) with boost
 *    phases by elapsed minutes: 1.0 @ 0-5, 0.1 @ 5-10 (→ DROP),
 *    4.0 @ 10-15 (→ SPIKE), 1.0 after (generate_events.py:108-121)
 *  - click probability = min(MAX_CTR_CAP=0.6, CLICK_RATIO=0.1 × boost)
 *    (generate_events.py:19,22,137)
 *  - click delay: impression ts + uniform(500, 10000) ms
 *    (generate_events.py:145,150); ≤1 click per impression (:143)
 *
 * Two modes:
 *  - `deterministic = true`: exactly round(n×p) clicks per (campaign,
 *    minute window), spread evenly, so per-window CTR equals the phase
 *    probability exactly and the expected alert sequence
 *    (DROP @ min 5, SPIKE @ min 10, DROP @ min 15) is certain.
 *  - `deterministic = false`: seeded Bernoulli draws like the original.
 */
object AdEventGenerator {

  final case class Events(impressions: Seq[Impression], clicks: Seq[Click])

  val devices = Vector("mobile", "desktop", "tablet")
  val browsers = Vector("chrome", "safari", "firefox", "edge")

  /** Boost schedule for camp-1 by elapsed minute (generate_events.py:108-121). */
  def boost(campaign: String, minute: Long): Double =
    if (campaign != "camp-1") 1.0
    else if (minute < 5) 1.0
    else if (minute < 10) 0.1
    else if (minute < 15) 4.0
    else 1.0

  def clickProb(campaign: String, minute: Long,
                clickRatio: Double = 0.1, ctrCap: Double = 0.6): Double =
    math.min(ctrCap, clickRatio * boost(campaign, minute))

  /**
   * @param startMs epoch-ms of the first minute window (must be minute-aligned)
   * @param minutes simulated duration
   * @param impressionsPerMinutePerCampaign events per campaign per window
   * @param campaigns number of campaigns (camp-1..camp-n)
   * @param nullDeviceEvery every k-th impression has NULL device_type
   *                        (exercises COALESCE→'Unknown', flink_job.sql:106)
   */
  def generate(startMs: Long, minutes: Int,
               impressionsPerMinutePerCampaign: Int = 100,
               campaigns: Int = 10,
               deterministic: Boolean = true,
               seed: Long = 42L,
               nullDeviceEvery: Int = 0): Events = {
    val rnd = new Random(seed)
    val imps = Vector.newBuilder[Impression]
    val clks = Vector.newBuilder[Click]
    var i = 0L
    for (minute <- 0 until minutes; c <- 1 to campaigns) {
      val campaign = s"camp-$c"
      val p = clickProb(campaign, minute.toLong)
      val n = impressionsPerMinutePerCampaign
      val targetClicks = math.round(n * p).toInt
      for (k <- 0 until n) {
        val ts = startMs + minute * 60000L + (k * 60000L / n)
        val id = s"imp-$i"
        val device =
          if (nullDeviceEvery > 0 && i % nullDeviceEvery == 0) null
          else devices((i % devices.size).toInt)
        imps += Impression(id, s"user-${(i % 10000) + 1}", campaign,
          s"ad-${(i % 100) + 1}", device, browsers((i % browsers.size).toInt),
          ts, new java.math.BigDecimal("0.25"))
        val clicked =
          if (deterministic) {
            // even spread: k-th impression clicks iff its index falls on a
            // stride hitting exactly targetClicks of n — keeps per-window
            // CTR == p exactly.
            targetClicks > 0 && (k * targetClicks / n) != ((k + 1) * targetClicks / n)
          } else rnd.nextDouble() < p
        if (clicked) {
          val delay = if (deterministic) 500L + (i % 9500L)
                      else 500L + rnd.nextLong(9501L)
          clks += Click(s"clk-$i", id, s"user-${(i % 10000) + 1}", ts + delay)
        }
        i += 1
      }
    }
    Events(imps.result(), clks.result())
  }
}
