package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Gap-filling for windowed per-key series: expand each key's observed
 * window range to a DENSE axis (every step between its first and last
 * active window) and mark the windows with no data.
 *
 * Why an engine needs this: every windowed aggregate in the engine —
 * the reference's tumbling ctr windows (flink/flink_job.sql:96-98)
 * included — emits rows ONLY for windows that contained events, so a
 * downstream detector reading the series never sees the silence. A
 * dropped pipeline (traffic → zero) is invisible to both the LAG-ratio
 * rule and the z-score rule because the zero-windows simply aren't rows.
 * Gap-filling turns absence into data.
 *
 * Shape, built for scale:
 *  1. per-key bounds: one map-side-partial `groupBy(key).agg(min,max)` —
 *     output is |keys| rows, tiny;
 *  2. axis: `explode(sequence(min, max, step))` over the bounds frame —
 *     the generated axis is |keys| x span/step rows and never touches
 *     the input again;
 *  3. one LEFT equi-join (key, window_start) axis-to-observed.
 * Nothing is driver-side. Caveat for extreme spans: `sequence()`
 * materializes one array per key before the explode, so a multi-year
 * span at second grain (~10^8 elements) should be generated in two
 * levels (sequence at day grain, then explode each day into steps);
 * at hour/minute grain over months the single-level form is right.
 *
 * `is_gap` is defined as "axis window had NO observed row" (left-join
 * null marker), not `n == 0` — an observed zero-count row, if a source
 * ever emits one, stays `is_gap = false`.
 */
object DenseSeries {

  /**
   * @param counts    observed windows: one row per (key, windowStart)
   * @param stepExpr  SQL interval expression for the axis step, e.g.
   *                  `"interval 1 hour"` — must equal the tumble grain
   *                  that produced `counts`
   * @param valueCol  metric column in `counts` to carry (filled with 0
   *                  on gap windows)
   */
  /**
   * Maximal silence runs over a [[fill]]ed series: consecutive `is_gap`
   * windows collapsed to one row per run — the "this campaign went dark
   * for 6 hours" alert the per-window detectors can't express.
   *
   * Gaps-and-islands on a REGULAR axis: because `fill` emits one row per
   * `step`, the island id is `window_index - row_number()` over the gap
   * rows alone (no LAG chain, no self-join) — one window shuffle on the
   * key, then one map-side-partial aggregate per (key, island).
   *
   * @param stepSeconds the axis step of the `fill` that produced `dense`
   * @param minLen      emit only runs of at least this many windows
   */
  def gapRuns(dense: DataFrame, keyCol: String, timeCol: String,
              stepSeconds: Long, minLen: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
    dense.filter(col("is_gap"))
      .select(col(keyCol), col(timeCol))
      // integer floor-division: (t0 + k*step) div step == (t0 div step) + k
      // exactly, for ANY axis offset — a double `/` here would hash-split
      // islands on the last-ulp jitter of ts/step
      .withColumn("__island",
        expr(s"CAST($timeCol AS LONG) DIV $stepSeconds") -
          row_number().over(w))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(timeCol)).as("run_start"), max(col(timeCol)).as("run_end"),
        count(lit(1)).as("run_len"))
      .filter(col("run_len") >= minLen)
      .select(col(keyCol), col("run_start"), col("run_end"), col("run_len"))
  }

  def fill(counts: DataFrame, keyCol: String, timeCol: String,
           valueCol: String, stepExpr: String): DataFrame = {
    val bounds = counts.groupBy(col(keyCol))
      .agg(min(col(timeCol)).as("__mn"), max(col(timeCol)).as("__mx"))
    val axis = bounds.select(col(keyCol),
      explode(expr(s"sequence(__mn, __mx, $stepExpr)")).as(timeCol))
    axis.join(counts.select(col(keyCol), col(timeCol), col(valueCol)),
        Seq(keyCol, timeCol), "left")
      .select(col(keyCol), col(timeCol),
        coalesce(col(valueCol), lit(0L)).as(valueCol),
        col(valueCol).isNull.as("is_gap"))
  }
}
