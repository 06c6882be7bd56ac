package graft

import graft.ops.TemporalSplit
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Purged temporal split: fraction lands where the percentile says, the
  * embargo band separates train from test by at least the gap, and the
  * assignment is a pure function of the timestamp (rerun-identical). */
class TemporalSplitSpec extends SparkSpec {
  import spark.implicits._

  private def frame(ms: Seq[Long]) =
    ms.zipWithIndex.map { case (m, i) =>
      (i.toLong, 7L, new Timestamp(m))
    }.toDF("event_id", "user_id", "ts")

  test("train fraction, embargo band, and ordering invariant") {
    // 100 events, one per minute
    val df = frame((0 until 100).map(_ * 60000L))
    val out = TemporalSplit.splitByTime(df, trainFrac = 0.8,
      embargoMs = 5 * 60000L).collect()
      .map(r => (r.getAs[Long]("event_id"),
        r.getAs[Timestamp]("ts").getTime, r.getAs[String]("split")))
    val byLabel = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    // exact percentile of 100 evenly spaced points at 0.8 = the value at
    // index 79.2 → floor lands inside minute 79: 80 train rows
    assert(byLabel("train").length == 80)
    // embargo = 5 minutes after the cut
    assert(byLabel("embargo").length == 5)
    assert(byLabel("test").length == 15)
    // the invariant the split exists for: no train sample within the
    // embargo horizon of any test sample
    assert(byLabel("test").min - byLabel("train").max >= 5 * 60000L)
    // deterministic: rerun identical
    val again = TemporalSplit.splitByTime(df, trainFrac = 0.8,
      embargoMs = 5 * 60000L).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("split"))).toSet
    assert(again == out.map(t => (t._1, t._3)).toSet)
  }

  test("bursty feed: the cut tracks ROW mass, not the calendar span") {
    // 90 events in the first hour, 10 spread over the next week: the
    // 80th-percentile cut must land inside the burst, not at 80% of the
    // calendar range
    val burst = (0 until 90).map(_ * 40000L)
    val tail = (1 to 10).map(d => 3600000L + d * 86400000L)
    val out = TemporalSplit.splitByTime(frame(burst ++ tail),
      trainFrac = 0.8, embargoMs = 0L)
    val trainMax = out.filter(col("split") === "train")
      .agg(max(unix_millis(col("ts")))).head().getLong(0)
    assert(trainMax < 3600000L, s"cut escaped the burst: $trainMax")
    // zero embargo → nothing labeled embargo
    assert(out.filter(col("split") === "embargo").count() == 0)
  }

  test("null event time lands in 'unsplit', never on the eval side, and " +
    "does not move the cutoff") {
    val timed = (0 until 10).map(_ * 60000L)
    val withNulls = timed.zipWithIndex.map { case (m, i) =>
        (i.toLong, 7L, new Timestamp(m): Timestamp)
      } ++ Seq((100L, 7L, null.asInstanceOf[Timestamp]),
               (101L, 7L, null.asInstanceOf[Timestamp]))
    val df = withNulls.toDF("event_id", "user_id", "ts")
    val out = TemporalSplit.splitByTime(df, trainFrac = 0.8, embargoMs = 0L)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("split")))
    assert(out.count(_._2 == "unsplit") == 2)
    assert(out.filter(t => t._1 >= 100L).forall(_._2 == "unsplit"))
    // the cutoff ignores nulls: same labels as the null-free frame
    val clean = TemporalSplit.splitByTime(
        frame(timed), trainFrac = 0.8, embargoMs = 0L)
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[String]("split")))
      .toSet
    assert(out.filter(_._1 < 100L).toSet == clean)
  }

  test("empty input yields an empty frame with the split column") {
    val out = TemporalSplit.splitByTime(frame(Seq.empty))
    assert(out.columns.contains("split") && out.count() == 0)
  }
}
