package graft

import graft.ops.{EventTime, IntervalJoin}
import graft.schema.AdModel.{Click, Impression}

/**
 * FIXTURES.md §3 join-bound micro-fixtures: the reference's BETWEEN is
 * inclusive on both ends (flink/flink_job.sql:95) and unmatched
 * impressions survive with NULL click columns (LEFT OUTER).
 */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def imp(id: String, ts: Long) =
    Impression(id, "user-1", "camp-1", "ad-1", "mobile", "chrome", ts,
      new java.math.BigDecimal("0.10"))

  private def joined(imps: Seq[Impression], clks: Seq[Click]) = {
    val i = EventTime.withEventTime(imps.toDF())
    val c = EventTime.withEventTime(clks.toDF())
    IntervalJoin.leftOuterWithin(i, c,
      "impression_id", "impression_id", "event_time", "event_time",
      "INTERVAL 10 MINUTES")
  }

  test("click at +0 ms joins (inclusive lower bound)") {
    val rows = joined(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 60000L))).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("click_id") == "c1")
  }

  test("click at exactly +10 min joins (inclusive upper bound)") {
    val rows = joined(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 60000L + 600000L))).collect()
    assert(rows.head.getAs[String]("click_id") == "c1")
  }

  test("click at +10 min + 1 ms does NOT join; impression survives with NULL") {
    val rows = joined(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 60000L + 600001L))).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("click_id") == null)
  }

  test("click before the impression does NOT join") {
    val rows = joined(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 59999L))).collect()
    assert(rows.head.getAs[String]("click_id") == null)
  }

  test("equi key mismatch does NOT join even inside the interval") {
    val rows = joined(Seq(imp("a", 60000L)),
      Seq(Click("c1", "OTHER", "user-1", 61000L))).collect()
    assert(rows.head.getAs[String]("click_id") == null)
  }

  test("one impression fanning out to multiple clicks yields multiple rows") {
    val rows = joined(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 61000L),
        Click("c2", "a", "user-1", 62000L))).collect()
    assert(rows.length == 2)
  }

  private def joinedBucketed(imps: Seq[Impression], clks: Seq[Click]) = {
    val i = EventTime.withEventTime(imps.toDF())
    val c = EventTime.withEventTime(clks.toDF())
    IntervalJoin.leftOuterWithinBucketed(i, c,
      "impression_id", "impression_id", "event_time", "event_time",
      intervalMs = 600000L)
  }

  test("bucketed join: click crossing a bucket boundary still joins") {
    // impression at 9:59 of its 10-min bucket; click 2 min later lands in
    // the NEXT bucket — only reachable via the right side's bucket-1 copy.
    val rows = joinedBucketed(Seq(imp("a", 599000L)),
      Seq(Click("c1", "a", "user-1", 719000L))).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("click_id") == "c1")
  }

  test("bucketed join: same-bucket pair emitted exactly once, not twice") {
    val rows = joinedBucketed(Seq(imp("a", 60000L)),
      Seq(Click("c1", "a", "user-1", 61000L))).collect()
    assert(rows.length == 1)
  }

  test("bucketed join matches plain interval join on a randomized set") {
    val rnd = new scala.util.Random(7)
    val imps = (1 to 50).map(i => imp(s"i$i", rnd.nextLong(30 * 60000L)))
    val clks = (1 to 120).map { i =>
      val target = imps(rnd.nextInt(imps.length))
      Click(s"c$i", target.impression_id, "user-1",
        target.event_timestamp + rnd.nextLong(15 * 60000L) - 2 * 60000L)
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("impression_id"), r.getAs[String]("click_id"))
    val plain = joined(imps, clks).collect().map(key).sortBy(_.toString)
    val bucketed = joinedBucketed(imps, clks).collect().map(key).sortBy(_.toString)
    assert(plain.length == bucketed.length)
    assert(plain.sameElements(bucketed))
  }
}
