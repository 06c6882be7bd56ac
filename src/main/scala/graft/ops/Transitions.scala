package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * First-order Markov transition matrix over per-user event sequences —
 * the clickstream "what follows what" rollup that complements the funnel
 * ([[Funnel]] pins one canonical path; this measures ALL observed
 * hops). Rows are `(prev_type, event_type)` pairs with their count and
 * the row-normalized transition probability; a synthetic `__start`
 * prev-state captures each user's entry distribution.
 *
 * Ordering inside a user is `(ts, event_id)` — the unique id breaks
 * equal-timestamp ties so the lag, and therefore every count, is
 * deterministic (same pin as [[graft.ops.AsOfJoin]]'s tie policy).
 *
 * Scale shape: ONE window pass partitioned by `user_id` (millions of
 * small partitions — no skew beyond the hottest user's event count,
 * the same budget as sessionization), then a `(prev, cur)` groupBy
 * whose output is O(|event types|²) — tiny. The probability
 * normalization is a second aggregation over that tiny frame, not
 * over the events.
 */
object Transitions {

  /** `(prev_type, event_type, n_transitions, p_transition)` — counts of
    * each observed hop and the probability of `event_type` given
    * `prev_type` (rounded to 6 places: the count ratio is exact in
    * doubles at any realistic scale, but the oracle compare wants a
    * pinned precision). */
  def matrix(events: DataFrame, tsCol: String = "ts",
             userCol: String = "user_id", typeCol: String = "event_type",
             idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val hops = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("prev_type",
        coalesce(lag(col(typeCol), 1).over(w), lit("__start")))
      .groupBy(col("prev_type"), col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = Window.partitionBy(col("prev_type"))
    hops.withColumn("p_transition",
      round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(totals), 6))
  }

  /** Scala twin of the window-lag hop extraction, shared with
    * [[graft.streaming.StreamingTransitions]]: one finalized user
    * buffer `(tsMs, event_id, event_type)` → its `(prev_type,
    * event_type, tsMs)` hops under the same `(ts, event_id)` tie
    * order and `__start` entry state. Sorting makes it
    * arrival-order-insensitive by construction. */
  def hopSeq(buf: Seq[(Long, Long, String)]): Seq[(String, String, Long)] = {
    val sorted = buf.sortBy(e => (e._1, e._2))
    sorted.zip("__start" +: sorted.map(_._3))
      .map { case ((ts, _, cur), prev) => (prev, cur, ts) }
  }
}
