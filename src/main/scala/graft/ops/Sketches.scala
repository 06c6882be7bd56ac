package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable sketch aggregates over the event stream — the fixed-size
 * summaries a 100 TB pipeline keeps when exact per-key state would be
 * unbounded. First member: a count-min sketch (Cormode & Muthukrishnan
 * 2005) for heavy-hitter ("top talker") detection, the same role the
 * reference's windowed COUNT(DISTINCT) plays for cardinality
 * (flink/flink_job.sql:83-85) but for FREQUENCY.
 *
 * Scale shape: the sketch is `depth × width` counters built by ONE
 * map-side-partial groupBy — per-partition cells combine before the
 * shuffle, so executor state and shuffle volume are O(depth·width)
 * regardless of input size, and cells merge by addition (the property
 * that makes the sketch streamable and cluster-mergeable). Estimation
 * broadcasts the tiny cell table; nothing driver-side.
 *
 * The salted-md5 hash family ([[graft.text.TextOps.saltedHash]] style)
 * keeps every cell and every estimate replicable in DuckDB oracle SQL.
 */
object Sketches {

  /** Row-`r` bucket of `item` in a width-`width` CMS row: independent
    * hash per row via the salt prefix, portable across engines. */
  private def bucket(r: Int, item: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$r:"), item.cast("string"))), 1, 8),
      16, 10).cast("long") % width

  /** Per-input-row exploded `(r, b)` hash pairs with the source columns
    * retained — shared by the batch aggregation below and the windowed
    * streaming twin
    * ([[graft.streaming.StreamingCuration.countMinCellsStream]], which
    * needs the event-time column to survive into its window group). */
  def explodedCells(rows: DataFrame, item: Column,
                    depth: Int = 4, width: Int = 64): DataFrame =
    rows
      .select(col("*"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), bucket(r, item, width).as("b"))): _*)).as("rb"))
      .select(col("*"), col("rb.r").as("r"), col("rb.b").as("b"))
      .drop("rb")

  /** The sketch itself: `(r, b, c)` cell counts, `depth × width` rows.
    * One exploded pass over the input, partial-aggregated map-side. */
  def countMinCells(rows: DataFrame, item: Column,
                    depth: Int = 4, width: Int = 64): DataFrame =
    explodedCells(rows, item, depth, width)
      .groupBy(col("r"), col("b"))
      .agg(count(lit(1)).as("c"))

  /**
   * Heavy-hitter audit: the top-`k` items by EXACT count, each with its
   * CMS estimate and the collision overestimate — the report that
   * decides whether a given `(depth, width)` is trustworthy before the
   * exact path is dropped at scale (same audit-first design as
   * `dedup_lsh_audit`). CMS guarantees estimate >= exact; the gap is
   * the audit signal. Ties at the top-k boundary break by item so the
   * result set is deterministic. Output: `(item, exact_count,
   * cms_estimate, overestimate)`.
   */
  def heavyHittersAudit(rows: DataFrame, item: Column, k: Int = 20,
                        depth: Int = 4, width: Int = 64): DataFrame = {
    val cells = countMinCells(rows, item, depth, width)
    rows
      .groupBy(item.as("item")).agg(count(lit(1)).as("exact_count"))
      .select(col("item"), col("exact_count"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"), bucket(r, col("item"), width).as("b"))): _*))
          .as("rb"))
      .join(broadcast(cells),
        col("rb.r") === col("r") && col("rb.b") === col("b"))
      .groupBy(col("item"), col("exact_count"))
      .agg(min(col("c")).as("cms_estimate"))
      .withColumn("overestimate", col("cms_estimate") - col("exact_count"))
      .orderBy(col("exact_count").desc, col("item"))
      .limit(k)
  }
}
