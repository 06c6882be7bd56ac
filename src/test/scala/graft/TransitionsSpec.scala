package graft

import graft.ops.Transitions

import java.sql.Timestamp

/**
 * Transition-matrix semantics as documented (Transitions.scala scaladoc)
 * and replicated by the `event_transitions` oracle: per-user ordering by
 * (ts, event_id), the synthetic `__start` entry state, per-prev-state
 * probability normalization, and user isolation (the last event of one
 * user never chains into the first of another).
 */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def events(rows: (Long, Long, Long, String)*) =
    rows.map { case (user, sec, id, typ) => (user, ts(sec), id, typ) }
      .toDF("user_id", "ts", "event_id", "event_type")

  private def matrix(rows: (Long, Long, Long, String)*) =
    Transitions.matrix(events(rows: _*))
      .orderBy("prev_type", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("counts hops in (ts, event_id) order with a __start entry state") {
    val out = matrix(
      (1L, 100L, 1L, "view"), (1L, 200L, 2L, "click"), (1L, 300L, 3L, "purchase"))
    assert(out.toSet == Set(
      ("__start", "view", 1L, 1.0),
      ("view", "click", 1L, 1.0),
      ("click", "purchase", 1L, 1.0)))
  }

  test("probabilities normalize per prev state") {
    val out = matrix(
      (1L, 100L, 1L, "view"), (1L, 200L, 2L, "click"),
      (2L, 100L, 3L, "view"), (2L, 200L, 4L, "view"),
      (3L, 100L, 5L, "view"), (3L, 200L, 6L, "purchase"))
    // from "view": click 1, view 1, purchase 1 → 1/3 each
    val fromView = out.filter(_._1 == "view")
    assert(fromView.map(_._3).sum == 3L)
    assert(fromView.forall(t => math.abs(t._4 - 0.333333) < 1e-9))
    // entries: 3 users all enter at "view"
    assert(out.filter(_._1 == "__start").toSeq == Seq(("__start", "view", 3L, 1.0)))
  }

  test("equal timestamps break ties by event_id, deterministically") {
    val out = matrix(
      (1L, 100L, 2L, "click"), (1L, 100L, 1L, "view"), (1L, 100L, 3L, "purchase"))
    assert(out.toSet == Set(
      ("__start", "view", 1L, 1.0),
      ("view", "click", 1L, 1.0),
      ("click", "purchase", 1L, 1.0)))
  }

  test("users never chain into each other") {
    val out = matrix((1L, 100L, 1L, "view"), (2L, 200L, 2L, "click"))
    assert(out.toSet == Set(
      ("__start", "view", 1L, 0.5), ("__start", "click", 1L, 0.5)))
  }
}
