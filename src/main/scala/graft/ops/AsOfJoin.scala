package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — "for each right-side event, the most recent left-side
 * event by the same key at or before it" — the attribution primitive
 * (click → last view, trade → last quote) that Spark has no native
 * operator for.
 *
 * The naive formulation (equi-join on the key + `l.ts <= r.ts` range +
 * per-pair max) explodes quadratically per key: a user with n views and
 * m clicks materializes n·m rows before pruning. This implementation is
 * the UNION-SCAN rewrite: tag both sides, union them, and run one
 * `last(..., ignoreNulls)` window pass ordered by time — each right row
 * picks up the latest preceding left row in O(n + m) per key, ONE
 * shuffle on the key, no pairwise blowup at any scale. Matching window
 * frames with `last(ignoreNulls)` read consecutive columns from the same
 * carried row, so id and timestamp can never disagree.
 *
 * Tie policy (asserted in AsOfJoinSpec and replicated by the registered
 * `asof_join` DuckDB oracle): "at or before" — a left row with ts equal
 * to the right row's ts IS visible (left rows sort before right rows at
 * equal ts); among equal-ts left rows the largest `leftId` wins (final
 * order key). Left rows with a NULL `leftId` are dropped from the input:
 * they are unattributable, and letting them through would advance the
 * carried timestamp past a row the carried id skipped (`ignoreNulls`),
 * pairing an older matched id with a newer matched_ts.
 */
object AsOfJoin {

  /**
   * @param left    frame providing the carried columns
   * @param right   frame whose every row is emitted once
   * @param key     equi key column name (both sides)
   * @param ts      event-time column name (both sides)
   * @param leftId  left row id carried onto matches (null if no match)
   * @param rightId right row id preserved in the output
   * @return one row per right row: (rightId, key, right ts as `ts`,
   *         leftId as `matched_<leftId>`, left ts as `matched_ts`,
   *         lag in milliseconds)
   */
  /**
   * The per-key matching chain as plain Scala, shared verbatim by the
   * streaming twin ([[graft.streaming.StreamingAsOfJoin]]) so batch and
   * stream can never diverge on sort or tie rules: sort one key's
   * buffered events by the batch window's exact order key — (ts asc,
   * left-before-right at equal ts, left id asc so the LARGEST equal-ts
   * left id is carried last) — then one linear scan carries the latest
   * left row onto each right row. Input tuples are (epoch-ms ts, isLeft,
   * id); left rows with a null id must be dropped BEFORE buffering, as
   * [[lastBefore]] drops them before the window. Returns one
   * (rightId, rightTsMs, Option[(leftId, leftTsMs)]) per right row.
   * Arrival-order insensitivity and equivalence to [[lastBefore]] are
   * pinned in AsOfJoinSpec.
   */
  def matchSeq(buf: Seq[(Long, Boolean, Long)])
      : Seq[(Long, Long, Option[(Long, Long)])] = {
    val sorted = buf.sortBy { case (t, isL, id) => (t, if (isL) 0 else 1, id) }
    var carry: Option[(Long, Long)] = None
    val out = Seq.newBuilder[(Long, Long, Option[(Long, Long)])]
    sorted.foreach { case (t, isL, id) =>
      if (isL) carry = Some((id, t)) else out += ((id, t, carry))
    }
    out.result()
  }

  def lastBefore(left: DataFrame, right: DataFrame, key: String, ts: String,
                 leftId: String, rightId: String): DataFrame = {
    val tagged = left.filter(col(leftId).isNotNull).select(col(key), col(ts),
        lit(1).as("__isl"), col(leftId).as("__lid"), lit(null).cast("long").as("__rid"))
      .unionByName(right.select(col(key), col(ts),
        lit(0).as("__isl"), lit(null).cast("long").as("__lid"), col(rightId).as("__rid")))
    // left rows first at equal ts (__isl desc), then __lid so the largest
    // left id wins among equal-ts left rows; frame = everything up to and
    // including the current row
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__isl").desc, col("__lid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carryId: Column = last(when(col("__isl") === 1, col("__lid")), ignoreNulls = true).over(w)
    val carryTs: Column = last(when(col("__isl") === 1, col(ts)), ignoreNulls = true).over(w)
    tagged
      .select(col(key), col(ts), col("__isl"), col("__rid"),
        carryId.as("__mid"), carryTs.as("__mts"))
      .filter(col("__isl") === 0)
      .select(
        col("__rid").as(rightId), col(key), col(ts),
        col("__mid").as(s"matched_$leftId"), col("__mts").as("matched_ts"),
        ((unix_millis(col(ts))) - unix_millis(col("__mts"))).as("lag_ms"))
  }
}
