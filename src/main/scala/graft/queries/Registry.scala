package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A driver-checkable query: a Spark builder plus (when SQL-expressible) a
 * semantically identical DuckDB oracle over the same parquet tables. The
 * driver hash-compares both results with columns sorted by name, so every
 * computed column is aliased identically on both sides.
 */
final case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Read one driver-provided testdata table (TESTDATA.md). */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Memoized base table, spread to full parallelism: a small
    * single-row-group parquet arrives as ONE scan split, which would
    * otherwise run every narrow phase of every consumer query on one
    * core; the repartition costs one tiny shuffle, the cache build
    * parallelizes, and all registry queries over the table share one
    * scan (what a production pipeline does with a staging table).
    * Persistence follows the same test: ONLY the repartitioned
    * small-input frame is cached — at real scale the scan already yields
    * >= defaultParallelism splits, the repartition short-circuits, and
    * the frame stays uncached so each consumer keeps per-query parquet
    * pushdown/pruning instead of pinning the corpus in executor
    * storage. */
  def spread(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spreadMemo(spark, sfDir, s"$name-spread", table(spark, sfDir, name))

  /** `events` (ts-normalized, see [[events]]) spread the same way. */
  def eventsSpread(spark: SparkSession, sfDir: String): DataFrame =
    spreadMemo(spark, sfDir, "events-spread", events(spark, sfDir))

  private def spreadMemo(spark: SparkSession, sfDir: String, tag: String,
                         d: => DataFrame): DataFrame =
    // the whole decision lives inside the by-name build so the parquet
    // read and the physical-planning probe run once per (session, sfDir,
    // tag), not on every registry call
    SharedFrames.memo(spark, sfDir, tag, persist = false) {
      val frame = d
      val par = spark.sparkContext.defaultParallelism
      if (frame.rdd.getNumPartitions < par)
        frame.repartition(par)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else frame
    }

  /**
   * `events` with `ts` normalized to epoch-millisecond precision — the same
   * grain as the reference's BIGINT epoch-ms inputs (flink/flink_job.sql:12,
   * 14). The driver's parquet stores TIMESTAMP(NANOS), which Spark only
   * reads via the legacy nanos-as-long mode; oracle side uses
   * `make_timestamp(epoch_ms(ts)*1000)` for the identical truncation.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      // nanos-as-long: integer-divide (not double-divide — 2024 epoch-ns
      // exceeds double's 53-bit exact range) down to millis.
      case LongType => df.withColumn("ts", timestamp_millis(expr("ts div 1000000")))
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", date_trunc("millisecond", col("ts")))
      case other => df
    }
  }
}
