package graft.tools

import graft.queries.Tables
import graft.sources.TableLayout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Layout receipts for BASELINE.md: pruned-vs-full scan cost over the
 * date-partitioned events layout, and bucketed-vs-plain join cost, at
 * the given scale dir. Scan-side evidence (files/bytes read) comes from
 * the executed plan's scan metrics — the quantities that keep scaling
 * when wall-clock differences at local SFs are noise.
 */
object ProfileLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("layout_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.3f s"); (r, s)
    }

    def scanMetrics(df: DataFrame, label: String): Unit = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      df.collect()
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val through = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        p +: through.flatMap(walk)
      }
      walk(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
        .foreach { f =>
          val m = f.metrics
          def v(k: String) = m.get(k).map(_.value).getOrElse(-1L)
          println(s"$label scan: files=${v("numFiles")} " +
            s"bytes=${v("filesSize")} partitions=${v("numPartitions")}")
        }
    }

    spark.range(1000).selectExpr("sum(id)").count()

    // ---- partition pruning: one week of 30 days ----
    val part = TableLayout.eventsDatePartitioned(spark, sfDir)
    part.count() // warm listing + footers
    val weekPart = part
      .filter(col("event_date").between("2024-01-08", "2024-01-14"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    val raw = Tables.events(spark, sfDir)
    raw.count()
    val weekRaw = raw
      .filter(to_date(col("ts")).between("2024-01-08", "2024-01-14"))
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    time("pruned week rollup (partitioned layout)")(weekPart.collect())
    scanMetrics(weekPart, "pruned")
    time("same rollup (raw single parquet)")(weekRaw.collect())
    scanMetrics(weekRaw, "raw")

    // ---- bucketing: join events to a per-user dim on user_id ----
    val work = java.nio.file.Files.createTempDirectory("layout_prof").toString
    val events = Tables.events(spark, sfDir)
    val perUser = events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    time("bucketed write (events, 16 buckets)")(
      TableLayout.writeBucketed(events, "prof_ev", s"$work/ev", "user_id", 16,
        Seq("user_id", "ts")))
    time("bucketed write (per-user dim)")(
      TableLayout.writeBucketed(perUser, "prof_usr", s"$work/usr", "user_id", 16))
    val bucketed = spark.table("prof_ev").join(spark.table("prof_usr"), "user_id")
    val plainEv = spark.read.parquet(s"$work/ev")
    val plainUsr = spark.read.parquet(s"$work/usr")
    val plain = plainEv.join(plainUsr, "user_id")
    // disable broadcast so both plans exercise the shuffle-vs-bucket path
    // (the dim is tiny at local SFs; at 100 TB neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("bucketed join (no exchange)")(bucketed.count())
    time("bucketed join 2nd")(bucketed.count())
    time("plain join (shuffles both sides)")(plain.count())
    time("plain join 2nd")(plain.count())
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS prof_ev")
    spark.sql("DROP TABLE IF EXISTS prof_usr")
    spark.stop()
  }
}
