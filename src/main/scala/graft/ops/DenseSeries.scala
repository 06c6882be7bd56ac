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
