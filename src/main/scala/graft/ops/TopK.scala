package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Grouped top-k — "the k best rows per group" (top documents per
 * source, top talkers per campaign), the selection primitive between
 * the global top-k (`ORDER BY LIMIT k`, planned TakeOrdered) and a full
 * per-group sort.
 *
 * Declared as `row_number` over a (group, order) window + `rank <= k`
 * filter — NOT because Spark sorts each group, but because Catalyst
 * rewrites exactly this shape: the rank filter is pushed into a
 * `WindowGroupLimit` that runs map-side BEFORE the shuffle (each input
 * partition keeps at most k rows per group, via per-group limiting over
 * a partial sort), so the exchange moves O(partitions · k · groups)
 * rows, not the corpus. The pushdown is asserted in PlanShapeSpec —
 * if a Spark upgrade or an ordering-expression change ever breaks the
 * rewrite, the plan silently degrades to a full per-group sort, which
 * is the regression the assertion exists to catch.
 *
 * `row_number` (not `rank`) + a total order (caller supplies a unique
 * tie-break column) keeps the selected set deterministic — `rank` with
 * ties would emit a data-dependent row count.
 */
object TopK {

  /** The input columns plus `rank` (1-based), at most `k` rows per
    * group. `order` must be a TOTAL order (include a unique tie-break,
    * e.g. the row id) or the selection is nondeterministic. */
  def perGroup(df: DataFrame, groupCol: String, order: Seq[Column],
               k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
