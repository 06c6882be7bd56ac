package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * LEFT OUTER event-time interval join (SURVEY §2.3 J1).
 *
 * Reference: `impressions i LEFT JOIN clicks c ON i.impression_id =
 * c.impression_id AND c.event_time BETWEEN i.event_time AND i.event_time +
 * INTERVAL '10' MINUTE` (flink/flink_job.sql:91-95, repeated :111-115).
 * Unmatched impressions survive with NULL click columns; BETWEEN is
 * inclusive on both ends.
 *
 * Spark-first scale notes:
 *  - The join condition keeps the **equi key first** so Catalyst plans a
 *    hash/sort-merge join on the key with the time range as a residual
 *    post-join filter. Writing it as a pure range condition would force a
 *    broadcast-nested-loop (cartesian-class) join — a scale-killer at
 *    100 TB. `.explain` must show SortMergeJoin/ShuffledHashJoin keyed on
 *    the equi column.
 *  - In streaming both sides must be watermarked; the time-range bound is
 *    what lets `StreamingSymmetricHashJoinExec` GC its state (keep ~10 min
 *    + watermark per key) and emit NULL-padded rows once the watermark
 *    passes the upper bound.
 */
object IntervalJoin {

  /**
   * @param left        left (probe/outer) side, e.g. impressions
   * @param right       right side, e.g. clicks
   * @param leftKey     equi-join key column on the left
   * @param rightKey    equi-join key column on the right
   * @param leftTime    event-time column on the left
   * @param rightTime   event-time column on the right
   * @param interval    SQL interval literal body, e.g. "INTERVAL 10 MINUTES"
   */
  def leftOuterWithin(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String,
                      leftTime: String, rightTime: String,
                      interval: String,
                      leftAlias: String = "i", rightAlias: String = "c"): DataFrame = {
    val l = left.alias(leftAlias)
    val r = right.alias(rightAlias)
    val cond: Column =
      col(s"$leftAlias.$leftKey") === col(s"$rightAlias.$rightKey") &&
        col(s"$rightAlias.$rightTime") >= col(s"$leftAlias.$leftTime") &&
        col(s"$rightAlias.$rightTime") <= col(s"$leftAlias.$leftTime") + expr(interval)
    l.join(r, cond, "left_outer")
  }

  /**
   * Bucketed variant of [[leftOuterWithin]] for NON-unique equi keys.
   *
   * With a unique key (the reference's `impression_id`) the plain
   * SortMergeJoin is optimal. With a hot key (e.g. `user_id`, up to
   * thousands of events per user at 100 TB) SMJ first emits ALL per-key
   * pairs and only then applies the time range — per-key work grows
   * quadratically with scale. The standard fix: fold the coarse time
   * bucket into the equi key. Left rows keep their own bucket
   * `floor(t / interval)`; each right row is duplicated into its own
   * bucket and the previous one, which together cover every left row whose
   * `[t, t+interval]` window can contain it. Buckets are disjoint, so no
   * pair is produced twice; the exact `BETWEEN` stays as the residual
   * filter. Cost: 2x the right-side shuffle volume — linear, not
   * quadratic. Same semantics as [[leftOuterWithin]], bit-for-bit.
   *
   * @param intervalMs window length in milliseconds; also the bucket width
   */
  def leftOuterWithinBucketed(left: DataFrame, right: DataFrame,
                              leftKey: String, rightKey: String,
                              leftTime: String, rightTime: String,
                              intervalMs: Long,
                              leftAlias: String = "i", rightAlias: String = "c"): DataFrame = {
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    def bucket(t: Column): Column = floor(unix_millis(t) / lit(intervalMs))
    val l = left.withColumn("__ibucket", bucket(col(leftTime))).alias(leftAlias)
    val r = right
      .withColumn("__cbucket",
        explode(array(bucket(col(rightTime)), bucket(col(rightTime)) - 1)))
      .alias(rightAlias)
    val cond: Column =
      col(s"$leftAlias.$leftKey") === col(s"$rightAlias.$rightKey") &&
        col(s"$leftAlias.__ibucket") === col(s"$rightAlias.__cbucket") &&
        col(s"$rightAlias.$rightTime") >= col(s"$leftAlias.$leftTime") &&
        col(s"$rightAlias.$rightTime") <=
          col(s"$leftAlias.$leftTime") + expr(s"INTERVAL $intervalMs MILLISECONDS")
    l.join(r, cond, "left_outer").drop("__ibucket", "__cbucket")
  }
}
