package graft

import graft.ops.EventTime
import graft.pipelines.AdPipelines
import graft.schema.AdModel.{Click, Impression}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * SURVEY §5 property-based invariants over randomized event sets:
 * 0 <= ctr <= 1, click_count <= impression_count, 60 s window alignment —
 * the invariants the reference states in prose (README.md:127) but never
 * tests.
 *
 * Uses plain ScalaCheck `Gen` with fixed seeds (no scalatestplus bridge —
 * the offline artifact cache doesn't carry it), so each sampled event set
 * is deterministic across runs.
 */
class PipelinePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val eventSetGen: Gen[(List[Impression], List[Click])] = for {
    nImp <- Gen.choose(1, 40)
    imps <- Gen.listOfN(nImp, for {
      id <- Gen.uuid.map(_.toString)
      camp <- Gen.choose(1, 4).map(c => s"camp-$c")
      device <- Gen.oneOf("mobile", "desktop", "tablet", null)
      ts <- Gen.choose(0L, 5 * 60000L)
    } yield Impression(id, "user-1", camp, "ad-1", device, "chrome", ts,
      new java.math.BigDecimal("0.10")))
    clicks <- Gen.listOf(for {
      cid <- Gen.uuid.map(_.toString)
      imp <- Gen.oneOf(imps)
      delay <- Gen.choose(-1000L, 11 * 60000L) // some out-of-range on purpose
    } yield Click(cid, imp.impression_id, imp.user_id,
      imp.event_timestamp + delay))
  } yield (imps, clicks)

  test("invariants hold for arbitrary event sets") {
    (1 to 10).foreach { i =>
      val (imps, clicks) = eventSetGen(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator produced no sample for seed ${42L + i}"))
      val j = AdPipelines.joined(
        EventTime.withEventTime(imps.toDF()),
        EventTime.withEventTime(clicks.toDF()))
      val rows = AdPipelines.ctrByCampaign(j).collect()
      val totalImpressions = rows.map(_.getAs[Long]("impression_count")).sum
      assert(totalImpressions == imps.map(_.impression_id).distinct.size)
      rows.foreach { r =>
        assert(r.getAs[Long]("click_count") <= clicks.size)
        val ctr = r.getAs[Double]("ctr")
        assert(ctr >= 0.0)
        assert(r.getAs[java.sql.Timestamp]("window_start").getTime % 60000L == 0)
      }
    }
  }
}
