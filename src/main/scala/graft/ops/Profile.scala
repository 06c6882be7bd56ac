package graft.ops

import org.apache.spark.sql.DataFrame
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
}
