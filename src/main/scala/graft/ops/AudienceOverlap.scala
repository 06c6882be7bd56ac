package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise audience overlap between segments: for every unordered pair
 * of segments, the number of shared members and the Jaccard similarity
 * of their member sets — the "how incremental is this segment" question
 * every ad platform asks of the reference's campaign/device dimensions
 * (flink/flink_job.sql:98,106).
 *
 * Shape, built for scale: the (segment, member) incidence is distinct-
 * reduced FIRST (one shuffle on the pair — map-side partial), then
 * self-joined on `member` alone. Each member contributes at most
 * C(k, 2) pair rows where k = segments that member belongs to — with a
 * bounded segment vocabulary (devices, campaigns, countries) that's a
 * constant, so the join output is LINEAR in members, never |A| x |B|.
 * Segment sizes are a |segments|-row aggregate, attached by broadcast
 * join. Nothing driver-side.
 *
 * For an UNBOUNDED segment axis (e.g. per-URL audiences) the per-member
 * fan-out is C(k,2) in that member's degree — cap with a degree filter
 * before calling, the same hot-key discipline as the LSH band joins
 * (text/Dedup.scala bucket caps).
 */
object AudienceOverlap {

  /**
   * @param incidence frame with (segCol, memberCol) rows, duplicates OK
   * @return (seg_a, seg_b, size_a, size_b, n_common, jaccard) with
   *         seg_a < seg_b; pairs with empty intersection are absent
   *         (their Jaccard is 0 and their count is |pairs| x |segments|²
   *         of noise at scale)
   */
  def jaccard(incidence: DataFrame, segCol: String, memberCol: String): DataFrame = {
    val distinctInc = incidence.select(col(segCol).as("seg"),
      col(memberCol).as("member")).distinct()
    val sizes = distinctInc.groupBy(col("seg")).agg(count(lit(1)).as("size"))
    val common = distinctInc.as("a")
      .join(distinctInc.as("b"),
        col("a.member") === col("b.member") && col("a.seg") < col("b.seg"))
      .groupBy(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(sizes.withColumnRenamed("seg", "seg_a")
        .withColumnRenamed("size", "size_a")), Seq("seg_a"))
      .join(broadcast(sizes.withColumnRenamed("seg", "seg_b")
        .withColumnRenamed("size", "size_b")), Seq("seg_b"))
      .select(col("seg_a"), col("seg_b"), col("size_a"), col("size_b"),
        col("n_common"),
        round(col("n_common").cast("double") /
          (col("size_a") + col("size_b") - col("n_common")), 6).as("jaccard"))
  }
}
