package graft

import graft.ops.DenseSeries

import java.sql.Timestamp

/** Gap-fill semantics: dense axis per key, zero-fill, null-marker gap
  * flag, per-key bounds independence. */
class DenseSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def hr(h: Long) = new Timestamp(h * 3600000L)

  private def counts(rows: Seq[(String, Long, Long)]) =
    rows.map { case (k, h, n) => (k, hr(h), n) }
      .toDF("campaign_id", "window_start", "n")

  private def filled(rows: Seq[(String, Long, Long)]) =
    DenseSeries.fill(counts(rows), "campaign_id", "window_start", "n",
      "interval 1 hour")
      .collect()
      .map(r => (r.getAs[String]("campaign_id"),
        r.getAs[Timestamp]("window_start").getTime / 3600000L,
        r.getAs[Long]("n"), r.getAs[Boolean]("is_gap")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("holes between first and last active hour are zero-filled and flagged") {
    assert(filled(Seq(("a", 0L, 5L), ("a", 3L, 7L))) == Seq(
      ("a", 0L, 5L, false), ("a", 1L, 0L, true),
      ("a", 2L, 0L, true), ("a", 3L, 7L, false)))
  }

  test("bounds are per-key — keys don't inherit each other's range") {
    assert(filled(Seq(("a", 0L, 1L), ("a", 2L, 1L), ("b", 10L, 9L))) == Seq(
      ("a", 0L, 1L, false), ("a", 1L, 0L, true), ("a", 2L, 1L, false),
      ("b", 10L, 9L, false)))
  }

  test("single-window key emits exactly one row, no gaps") {
    assert(filled(Seq(("a", 42L, 3L))) == Seq(("a", 42L, 3L, false)))
  }

  test("an observed zero-count row is NOT a gap (null marker, not n == 0)") {
    assert(filled(Seq(("a", 0L, 0L), ("a", 1L, 2L))) == Seq(
      ("a", 0L, 0L, false), ("a", 1L, 2L, false)))
  }

  test("empty input yields empty output") {
    assert(filled(Seq.empty) == Seq.empty)
  }

  private def runs(rows: Seq[(String, Long, Long)], minLen: Int = 1) =
    DenseSeries.gapRuns(
      DenseSeries.fill(counts(rows), "campaign_id", "window_start", "n",
        "interval 1 hour"),
      "campaign_id", "window_start", 3600L, minLen)
      .collect()
      .map(r => (r.getAs[String]("campaign_id"),
        r.getAs[Timestamp]("run_start").getTime / 3600000L,
        r.getAs[Timestamp]("run_end").getTime / 3600000L,
        r.getAs[Long]("run_len")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("gapRuns: two separate holes collapse to two maximal runs") {
    // active 0, gap 1-2, active 3, gap 4, active 5
    assert(runs(Seq(("a", 0L, 1L), ("a", 3L, 1L), ("a", 5L, 1L))) == Seq(
      ("a", 1L, 2L, 2L), ("a", 4L, 4L, 1L)))
  }

  test("gapRuns: minLen filters short runs") {
    assert(runs(Seq(("a", 0L, 1L), ("a", 3L, 1L), ("a", 5L, 1L)), minLen = 2) ==
      Seq(("a", 1L, 2L, 2L)))
  }

  test("gapRuns: runs never span keys") {
    // a: gap at 1; b: gap at 2 — adjacent in time but different keys
    assert(runs(Seq(("a", 0L, 1L), ("a", 2L, 1L), ("b", 1L, 1L), ("b", 3L, 1L)))
      == Seq(("a", 1L, 1L, 1L), ("b", 2L, 2L, 1L)))
  }

  test("gapRuns: gapless series yields no runs") {
    assert(runs(Seq(("a", 0L, 1L), ("a", 1L, 1L))) == Seq.empty)
  }
}
