package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Column profiling — the ingest-health audit run before any pipeline
 * trusts a new feed: per column, row count, null count, and distinct
 * cardinality. A feed whose `user_id` cardinality collapses or whose
 * `props` null rate spikes is broken upstream; this surfaces it as one
 * tiny report row per column.
 *
 * Scale shape: one aggregation pass per column batched into a single
 * plan — `count` and `count(col)` are map-side partials; the exact
 * distinct counts expand per column, so the whole profile is one
 * expanded aggregation (Spark rewrites multi-distinct via expand, cost
 * ≈ one shuffle × #columns). At 100 TB swap `exact = false` to HLL
 * (`approx_count_distinct`) for fixed-size partials — same report
 * shape, sketch-grade cardinalities (not oracle-replicable, so the
 * registered query keeps the exact form).
 */
object Profile {

  /** `(column, n_rows, n_nulls, n_distinct)`, one row per requested
    * column, in requested order (stage index carried for determinism). */
  def columns(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"))
    }
    // ONE aggregation, then the single wide row explodes into the
    // per-column report — a per-column union of selects would re-run
    // the whole aggregation once per column
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(s"__n_$c").as("n_rows"),
          col(s"__nulls_$c").as("n_nulls"),
          col(s"__dist_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }

  /** Per-group quantile profile of one numeric column: `(group, n_rows,
    * mean, p10, p25, ...)` — the length/score-distribution audit run per
    * source before mixing a corpus. Exact linear-interpolated
    * `percentile` (same definition as DuckDB `quantile_cont`, so the
    * oracle replicates it value-for-value); ONE hash shuffle on the
    * group key with per-group sorted-buffer percentiles. `exact = false`
    * IS the 100 TB escape hatch: `percentile_approx` (Greenwald-Khanna
    * fixed-size partials, rank error ≤ 1/`accuracy`) — same report
    * shape, tolerance-grade values, per-group memory bounded by the
    * sketch instead of the group (registered as the
    * `doc_length_quantiles_approx` bench row; tolerance vs exact pinned
    * in TextAnalysisSpec). */
  def quantiles(df: DataFrame, valueCol: String, groupCol: String,
                probs: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
                exact: Boolean = true, accuracy: Int = 10000)
      : DataFrame = {
    require(probs.nonEmpty, "quantile profile needs at least one prob")
    def label(p: Double) = s"p${math.round(p * 100)}"
    def pct(p: Double): Column =
      if (exact) percentile(col(valueCol), lit(p))
      else percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .cast("double")
    val aggs = round(avg(col(valueCol)), 6).as("mean") +:
      probs.map(p => round(pct(p), 6).as(label(p)))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
