package graft

import graft.ops.Sessionize

import java.sql.Timestamp

/**
 * Sessionize window semantics, exactly as documented (Sessionize.scala
 * scaladoc) and replicated by the `user_sessions` gaps-and-islands
 * oracle: [first, last + gap) bounds, at-or-before extension (Spark
 * merges boundary-adjacent windows, so an event at exactly prev + gap
 * EXTENDS the session; only strictly past it starts a new one),
 * per-user isolation, and the single-gap span correction in
 * sessionStats.
 */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 60L // seconds, for readable fixtures

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def events(rows: (Long, Long, String, Double)*) =
    rows.map { case (user, sec, typ, v) => (user, ts(sec), typ, v) }
      .toDF("user_id", "ts", "event_type", "value")

  private def sessions(rows: (Long, Long, String, Double)*) =
    Sessionize.userSessions(events(rows: _*), gap)
      .orderBy("user_id", "session_start").collect()

  test("events closer than the gap merge; session spans [first, last + gap)") {
    val out = sessions((7L, 100L, "view", 1.0), (7L, 130L, "click", 2.0),
      (7L, 150L, "purchase", 3.0))
    assert(out.length == 1)
    val s = out.head
    assert(s.getAs[Timestamp]("session_start") == ts(100L))
    assert(s.getAs[Timestamp]("session_end") == ts(150L + gap))
    assert(s.getAs[Long]("n_events") == 3L)
    assert(s.getAs[Long]("n_purchases") == 1L)
    assert(s.getAs[Double]("total_value") == 6.0)
  }

  test("an event at EXACTLY prev + gap extends the session (adjacent merge)") {
    val out = sessions((7L, 100L, "view", 1.0), (7L, 100L + gap, "view", 1.0))
    assert(out.length == 1)
    assert(out.head.getAs[Timestamp]("session_end") == ts(100L + gap + gap))
  }

  test("an event strictly past prev + gap starts a new session") {
    val out = sessions((7L, 100L, "view", 1.0), (7L, 100L + gap + 1, "view", 1.0))
    assert(out.length == 2)
    assert(out.map(_.getAs[Timestamp]("session_start")).toSeq ==
      Seq(ts(100L), ts(100L + gap + 1)))
  }

  test("users never share sessions") {
    val out = sessions((7L, 100L, "view", 1.0), (8L, 110L, "view", 1.0))
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("user_id")).sorted.toSeq == Seq(7L, 8L))
  }

  test("sessionStats span subtracts the SAME gap: single-event span is 0") {
    val stats = Sessionize.sessionStats(
      Sessionize.userSessions(events((7L, 100L, "view", 1.0)), gap), gap)
      .collect()
    assert(stats.length == 1)
    assert(stats.head.getAs[Int]("n_events_bucket") == 1)
    assert(stats.head.getAs[Double]("mean_span_sec") == 0.0)
    assert(stats.head.getAs[Double]("max_span_sec") == 0.0)
  }

  test("cohortMatrix: users bucket by first-active day, offsets count returns") {
    import graft.ops.Retention
    val day = 86400L
    // u1 first active day 0, returns day 1 and day 3 (two events day 1 —
    // distinct-day dedup); u2 first day 0 only; u3 first day 1, returns day 3
    val df = events(
      (1L, 10L, "view", 1.0), (1L, day + 5L, "view", 1.0),
      (1L, day + 9L, "click", 1.0), (1L, 3 * day + 1L, "view", 1.0),
      (2L, 20L, "view", 1.0),
      (3L, day + 50L, "view", 1.0), (3L, 3 * day + 2L, "view", 1.0))
    val got = Retention.cohortMatrix(df).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      ("1970-01-01", 0, 2L), // u1, u2 on their first day
      ("1970-01-01", 1, 1L), // u1 back on day 1
      ("1970-01-01", 3, 1L), // u1 back on day 3
      ("1970-01-02", 0, 1L), // u3's cohort
      ("1970-01-02", 2, 1L)  // u3 back two days after ITS first day
    ), s"got $got")
  }

  test("profile: per-column rows/nulls/distinct, exact and approx agree here") {
    import graft.ops.Profile
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a")))
      .toDF("k", "s")
    val got = Profile.columns(df, Seq("k", "s")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("k", 4L, 1L, 2L), ("s", 4L, 1L, 2L)))
    // the HLL form keeps the shape; tiny cardinalities are exact in HLL++
    val approx = Profile.columns(df, Seq("k", "s"), exact = false).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    assert(approx == Set(("k", 2L), ("s", 2L)))
  }

  test("funnel stages: order matters, ties qualify, lags average the hops") {
    import graft.ops.Funnel
    val df = events(
      // u1 completes in order: view@10 click@40 purchase@100
      (1L, 10L, "view", 1.0), (1L, 40L, "click", 1.0), (1L, 100L, "purchase", 1.0),
      // u2: click BEFORE first view never counts; no click after → stage 1 only
      (2L, 50L, "view", 1.0), (2L, 20L, "click", 1.0),
      // u3: click ties the view timestamp (>= qualifies), no purchase
      (3L, 30L, "view", 1.0), (3L, 30L, "click", 1.0),
      // u4: purchase before click → stops at stage 2
      (4L, 10L, "view", 1.0), (4L, 90L, "click", 1.0), (4L, 60L, "purchase", 1.0),
      // u5: never views — invisible to the funnel
      (5L, 10L, "click", 1.0), (5L, 20L, "purchase", 1.0))
    val got = Funnel.stages(df, Seq("view", "click", "purchase")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "view", 4L, None),                       // u1-u4
      (2, "click", 3L, // u1, u3, u4 — 6-dp rounded mean of the hops
        Some(math.rint((30000.0 + 0.0 + 80000.0) / 3 * 1e6) / 1e6)),
      (3, "purchase", 1L, Some(60000.0))))         // u1 only
  }

  test("sessionStats buckets cap at 5 and spans are event spans") {
    val manyEvents = (0L until 7L).map(i => (7L, 100L + i * 10L, "view", 1.0))
    val twoEvents = Seq((8L, 100L, "view", 1.0), (8L, 130L, "purchase", 2.0))
    val stats = Sessionize.sessionStats(
      Sessionize.userSessions(events(manyEvents ++ twoEvents: _*), gap), gap)
      .orderBy("n_events_bucket").collect()
    assert(stats.map(r => (r.getAs[Int]("n_events_bucket"),
      r.getAs[Long]("n_sessions"), r.getAs[Double]("max_span_sec"),
      r.getAs[Long]("n_purchases"))).toSeq ==
      Seq((2, 1L, 30.0, 1L), (5, 1L, 60.0, 0L)))
  }
}
