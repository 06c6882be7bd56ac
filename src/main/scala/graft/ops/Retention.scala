package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention over the event stream — the user-lifecycle rollup
 * that sits next to sessionization ([[Sessionize]]) in any analytics
 * surface: bucket every user by their first-active day (the cohort) and
 * count how many of them return N days later.
 *
 * Scale shape: activity first collapses to distinct (user, day) — one
 * hash shuffle with map-side partials, the grain everything downstream
 * reads — then the first-day frame and the cohort rollup are two more
 * bounded aggregations (cohort output is O(days²), tiny). No windows,
 * no per-user state, AQE-coalescible throughout.
 */
object Retention {

  /** `(cohort_day, day_offset, n_users)`: of the users whose first
    * active day is `cohort_day`, `n_users` were active again
    * `day_offset` days later (offset 0 = the cohort's size on day one,
    * since first day is itself an active day). */
  def cohortMatrix(events: DataFrame, tsCol: String = "ts",
                   userCol: String = "user_id"): DataFrame = {
    val activity = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val first = activity.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }
}
