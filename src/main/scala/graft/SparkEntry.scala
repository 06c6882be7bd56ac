package graft

import graft.queries.{DataPipelineQueries, EventQueries, NamedQuery}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All registered queries, each with its DuckDB oracle when expressible. */
  private def registry: Seq[NamedQuery] =
    EventQueries.all ++ DataPipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q1 of the reference (flink/flink_job.sql:76-98): LEFT interval join +
    * 1-minute tumble + COUNT(DISTINCT) x2 + guarded ctr. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.ctrByCampaign(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Insertion-
    * ordered (ListMap) so iteration follows pipeline order — e.g. the
    * anomaly query runs after the ctr query whose shared frame it chains
    * off, exactly like the reference's job order (main job feeds the
    * anomaly job through the ctr_results topic). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(registry.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
