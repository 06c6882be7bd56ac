package graft

import graft.queries.{DataPipelineQueries, EventQueries}
import org.apache.spark.sql.DataFrame

/**
 * Physical-plan regression guard: the queries whose joins must stay
 * equi-keyed (SMJ/ShuffledHash/BroadcastHash) may never silently degrade
 * to a cartesian-class join — e.g. by a condition reordering that drops
 * the equi conjunct, or a bucket key becoming non-deterministic. The two
 * INTENTIONAL BroadcastNestedLoopJoins (brute-force top-k's broadcast
 * query set, IVF's broadcast centroid probe) are excluded by design —
 * see graft.Explain's scaladoc.
 */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    // collect() executes df's OWN QueryExecution (count() would build and
    // run a different one), finalizing the AdaptiveSparkPlanExec in place
    // so the string below is AQE's FINAL plan, not the initial guess
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def assertNoCartesian(name: String, df: DataFrame): Unit = {
    val plan = finalPlan(df)
    assert(!plan.contains("CartesianProduct"),
      s"$name plan contains a CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$name plan contains a BroadcastNestedLoopJoin:\n$plan")
  }

  test("event pipeline joins stay equi-keyed (no cartesian-class join)") {
    assertNoCartesian("ctr_by_campaign", EventQueries.ctrByCampaign(spark, sf))
    assertNoCartesian("engagement_by_device", EventQueries.engagementByDevice(spark, sf))
    assertNoCartesian("anomaly_alerts", EventQueries.anomalyAlerts(spark, sf))
  }

  test("dedup/similarity candidate joins stay equi-keyed (no cartesian-class join)") {
    assertNoCartesian("dedup_minhash", DataPipelineQueries.dedupMinhash(spark, sf))
    assertNoCartesian("dedup_jaccard", DataPipelineQueries.dedupJaccard(spark, sf))
    assertNoCartesian("dedup_embedding", DataPipelineQueries.dedupEmbedding(spark, sf))
    assertNoCartesian("dedup_decontaminate", DataPipelineQueries.dedupDecontaminate(spark, sf))
    assertNoCartesian("similarity_ann", DataPipelineQueries.similarityAnn(spark, sf))
  }
}
