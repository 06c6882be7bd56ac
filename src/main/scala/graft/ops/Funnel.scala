package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered conversion funnel over the event stream — the sequential
 * companion to [[Retention]]: how many users progress through a stage
 * sequence (e.g. view → click → purchase) IN ORDER, and how long each
 * hop takes. A user reaches stage N at the earliest event of that type
 * at-or-after their stage-N−1 time (the standard first-touch funnel).
 *
 * Scale shape: one filtered min-aggregation per stage, each chained to
 * the previous stage's user-grain frame by an equi join on the user key
 * — co-partitioned hash joins, no windows, no per-user event ordering
 * in memory. Stage frames shrink monotonically (each is a subset of the
 * previous), so later hops cost less, and the final rollup is one row
 * per stage.
 */
object Funnel {

  /** The stage chain as frames: frame i holds (user_id, t1..t_{i+1})
    * for users who reached stage i+1 — each step one equi join + one
    * min-aggregation on the shrinking user set. */
  private def stageFrames(events: DataFrame, stageTypes: Seq[String],
                          tsCol: String, userCol: String,
                          typeCol: String): Seq[DataFrame] = {
    require(stageTypes.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stageTypes.head)
      .groupBy(col(userCol).as("user_id"))
      .agg(min(col(tsCol)).as("t1"))
    stageTypes.zipWithIndex.drop(1)
      .scanLeft(first) { case (prev, (typ, i)) =>
        events.filter(col(typeCol) === typ)
          .select(col(userCol).as("user_id"), col(tsCol).as("__t"))
          .join(prev, Seq("user_id"))
          .filter(col("__t") >= col(s"t$i"))
          .groupBy((col("user_id") +: (1 to i).map(j => col(s"t$j"))): _*)
          .agg(min(col("__t")).as(s"t${i + 1}"))
      }
  }

  /** Per-user stage arrivals `(user_id, stage, stage_name, stage_ts)` —
    * one row per stage the user reached, in order. The frame the
    * streaming twin ([[graft.streaming.StreamingFunnel]]) reproduces
    * row-for-row once its watermark finalizes each user. */
  def userStages(events: DataFrame, stageTypes: Seq[String],
                 tsCol: String = "ts", userCol: String = "user_id",
                 typeCol: String = "event_type"): DataFrame =
    stageFrames(events, stageTypes, tsCol, userCol, typeCol).zipWithIndex
      .map { case (f, i) =>
        f.select(col("user_id"), lit(i + 1).as("stage"),
          lit(stageTypes(i)).as("stage_name"),
          col(s"t${i + 1}").as("stage_ts"))
      }.reduce(_ unionAll _)

  /** `(stage, stage_name, n_users, mean_lag_ms)`: users reaching each
    * stage in order, with the mean milliseconds from the previous
    * stage's qualifying event (null for stage 1). Ties at the same
    * timestamp count as in-order (>=): a click logged the same ms as
    * the view qualifies, matching at-or-after event-time semantics. */
  def stages(events: DataFrame, stageTypes: Seq[String],
             tsCol: String = "ts", userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame =
    stageFrames(events, stageTypes, tsCol, userCol, typeCol).zipWithIndex
      .map { case (f, i) =>
        val lag =
          if (i == 0) lit(null).cast("double")
          else round(avg(unix_millis(col(s"t${i + 1}"))
            - unix_millis(col(s"t$i"))), 6)
        f.agg(count(lit(1)).as("n_users"), lag.as("mean_lag_ms"))
          .select(lit(i + 1).as("stage"), lit(stageTypes(i)).as("stage_name"),
            col("n_users"), col("mean_lag_ms"))
      }.reduce(_ unionAll _)

  /** Scala reference of the per-user chain for one user's events —
    * shared by the streaming finalizer (exactly this fold over the
    * buffered, ts-sorted events) and property tests. Returns the
    * stage-arrival epoch-ms times, one per reached stage. */
  def chainTimes(sorted: Seq[(Long, String)],
                 stageTypes: Seq[String]): Seq[Long] = {
    val times = Array.fill[Option[Long]](stageTypes.length)(None)
    // min per stage with the at-or-after rule, computed exactly as the
    // batch chain: t_i = min ts of type_i with ts >= t_{i-1}
    for ((i, typ) <- stageTypes.indices.zip(stageTypes)) {
      val floor = if (i == 0) Some(Long.MinValue) else times(i - 1)
      times(i) = floor.flatMap { f =>
        val q = sorted.collect { case (t, ty) if ty == typ && t >= f => t }
        if (q.isEmpty) None else Some(q.min)
      }
    }
    times.takeWhile(_.isDefined).flatten.toSeq
  }
}
