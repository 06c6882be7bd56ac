package graft

import graft.ops.AsOfJoin

import java.sql.Timestamp

/**
 * AsOfJoin tie policy and null handling, exactly as documented
 * (AsOfJoin.scala scaladoc) and replicated by the `asof_join` oracle:
 * at-or-before visibility, largest-leftId-wins among equal-ts left rows,
 * null-leftId rows dropped, unmatched rights carry nulls.
 */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def frame(rows: Seq[(java.lang.Long, Long, Long)]) =
    rows.map { case (id, user, sec) => (id, user, ts(sec)) }
      .toDF("event_id", "user_id", "ts")

  private def run(left: Seq[(java.lang.Long, Long, Long)],
                  right: Seq[(java.lang.Long, Long, Long)]) =
    AsOfJoin.lastBefore(frame(left), frame(right),
      key = "user_id", ts = "ts", leftId = "event_id", rightId = "event_id")
      .orderBy("ts")
      .collect()

  test("each right row matches the most recent left row at or before it") {
    val out = run(
      left = Seq((1L: java.lang.Long, 7L, 10L), (2L: java.lang.Long, 7L, 20L)),
      right = Seq((100L: java.lang.Long, 7L, 15L), (101L: java.lang.Long, 7L, 25L)))
    assert(out.map(r => (r.getAs[Long]("event_id"),
      r.getAs[Long]("matched_event_id"), r.getAs[Long]("lag_ms"))).toSeq ==
      Seq((100L, 1L, 5000L), (101L, 2L, 5000L)))
  }

  test("a left row at EXACTLY the right row's ts is visible (at-or-before)") {
    val out = run(
      left = Seq((1L: java.lang.Long, 7L, 10L)),
      right = Seq((100L: java.lang.Long, 7L, 10L)))
    assert(out.length == 1)
    assert(out.head.getAs[Long]("matched_event_id") == 1L)
    assert(out.head.getAs[Long]("lag_ms") == 0L)
  }

  test("among equal-ts left rows the largest leftId wins") {
    val out = run(
      left = Seq((3L: java.lang.Long, 7L, 10L), (9L: java.lang.Long, 7L, 10L),
        (5L: java.lang.Long, 7L, 10L)),
      right = Seq((100L: java.lang.Long, 7L, 11L)))
    assert(out.head.getAs[Long]("matched_event_id") == 9L)
  }

  test("a right row before any left row gets null match, null ts, null lag") {
    val out = run(
      left = Seq((1L: java.lang.Long, 7L, 50L)),
      right = Seq((100L: java.lang.Long, 7L, 10L)))
    assert(out.head.isNullAt(out.head.fieldIndex("matched_event_id")))
    assert(out.head.isNullAt(out.head.fieldIndex("matched_ts")))
    assert(out.head.isNullAt(out.head.fieldIndex("lag_ms")))
  }

  test("keys never cross: a user only sees their own left rows") {
    val out = run(
      left = Seq((1L: java.lang.Long, 7L, 10L)),
      right = Seq((100L: java.lang.Long, 8L, 20L)))
    assert(out.head.isNullAt(out.head.fieldIndex("matched_event_id")))
  }

  test("null-leftId rows are dropped: id and timestamp never disagree") {
    // ADVICE r7: an un-filtered null-id left row at t=20 would advance the
    // carried ts past the row the carried id (ignoreNulls) skipped,
    // pairing id=1 (t=10) with matched_ts=20
    val out = run(
      left = Seq((1L: java.lang.Long, 7L, 10L), (null: java.lang.Long, 7L, 20L)),
      right = Seq((100L: java.lang.Long, 7L, 30L)))
    assert(out.head.getAs[Long]("matched_event_id") == 1L)
    assert(out.head.getAs[Timestamp]("matched_ts") == ts(10L))
    assert(out.head.getAs[Long]("lag_ms") == 20000L)
  }

  test("every right row is emitted exactly once") {
    val out = run(
      left = Seq((1L: java.lang.Long, 7L, 10L), (2L: java.lang.Long, 7L, 12L)),
      right = Seq((100L: java.lang.Long, 7L, 15L), (101L: java.lang.Long, 8L, 15L)))
    assert(out.map(_.getAs[Long]("event_id")).sorted.toSeq == Seq(100L, 101L))
  }
}
