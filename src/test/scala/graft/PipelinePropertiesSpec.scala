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

  test("winnowing guarantee: docs sharing a long run always share a pick") {
    // MOSS guarantee: any common run of >= window + shingleWidth - 1 = 6
    // tokens forces at least one common window-min hash
    import graft.text.TextAnalysis
    val word = Gen.choose('a', 'z').map(c => s"w$c")
    val docPair = for {
      shared <- Gen.listOfN(8, word) // 8-token shared run > 6 guarantee bound
      pre1 <- Gen.listOfN(5, word)
      post1 <- Gen.listOfN(5, word)
      pre2 <- Gen.listOfN(7, word)
      post2 <- Gen.listOfN(3, word)
    } yield (
      (pre1 ++ shared ++ post1).mkString(" "),
      (pre2 ++ shared ++ post2).mkString(" "))
    (1 to 8).foreach { i =>
      val (t1, t2) = docPair(Gen.Parameters.default, Seed(7L * i))
        .getOrElse(fail(s"no sample for seed ${7 * i}"))
      val picks = TextAnalysis.winnowingPicks(
        Seq((1L, t1), (2L, t2)).toDF("doc_id", "text"))
        .collect().groupBy(_.getAs[Long]("doc_id"))
        .view.mapValues(_.map(_.getAs[String]("wmin")).toSet).toMap
      assert((picks(1L) & picks(2L)).nonEmpty,
        s"no shared pick for seed ${7 * i}: '$t1' vs '$t2'")
    }
  }

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
