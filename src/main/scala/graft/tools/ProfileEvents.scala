package graft.tools

import graft.queries.{EventQueries, Tables}
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing for the events (ctr/engagement/anomaly) pipeline. */
object ProfileEvents {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(spark.range(1000).selectExpr("sum(id)").count())
    time("events scan")(Tables.events(spark, sfDir).count())
    time("impressions")(EventQueries.impressions(spark, sfDir).count())
    time("clicks")(EventQueries.clicks(spark, sfDir).count())
    time("joined build+persist")(EventQueries.joined(spark, sfDir).count())
    time("joined 2nd")(EventQueries.joined(spark, sfDir).count())
    time("ctr build+persist")(EventQueries.ctrByCampaign(spark, sfDir).count())
    time("ctr 2nd")(EventQueries.ctrByCampaign(spark, sfDir).count())
    time("engagement")(EventQueries.engagementByDevice(spark, sfDir).count())
    time("anomaly")(EventQueries.anomalyAlerts(spark, sfDir).count())
    spark.stop()
  }
}
