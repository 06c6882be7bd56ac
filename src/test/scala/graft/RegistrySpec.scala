package graft

import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Contract guards for the driver-facing registry and the raw scan path. */
class RegistrySpec extends SparkSpec {

  test("every registered query has an oracle, except the documented IVF exception") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // similarity_ivf's k-means centroids are learned, not SQL-expressible;
    // its recall is pinned by SimilaritySpec instead
    assert(noOracle == Set("similarity_ivf"), s"oracle-less queries: $noOracle")
  }

  test("oracle SQL references only tables the driver provides") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // FROM/JOIN targets that are not CTE names must be driver tables
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val ctes = "(?i)([a-z_0-9]+)\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val targets = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z_0-9]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = targets -- ctes -- tables
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("builders that persist internal frames are memoized per (session, sfDir)") {
    // repeated invocation — the bench warmup + timed reps — must return
    // the SAME frame so the internal LSH/band caches are built once, not
    // stacked per call (round-5 advice: persist leak)
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("dedup_minhash", "text_simhash_pairs", "dedup_embedding",
      "similarity_ann", "dedup_clusters")) {
      val fn = SparkEntry.queries(name)
      assert(fn(spark, dir) eq fn(spark, dir),
        s"$name rebuilds its frame (and its internal persists) per call")
    }
  }

  test("raw parquet scans push filters down (events by event_type)") {
    // the registry serves cached spread frames; the RAW path — what a
    // 100 TB deployment reads — must push the predicate into the scan
    val plan = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "view")
      .select(col("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushdown section:\n$plan")
    assert(plan.contains("EqualTo(event_type,view)"),
      s"event_type filter not pushed:\n$plan")
  }
}
