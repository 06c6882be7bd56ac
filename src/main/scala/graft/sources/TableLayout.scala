package graft.sources

import graft.queries.{SharedFrames, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Physical table layout for scan-time pruning — the storage half of the
 * 100 TB design that query plans alone cannot deliver. The reference
 * consumes append-only Kafka topics and leaves at-rest layout to the
 * lake writer; an engine that also OWNS the landed tables must write
 * them so that the dominant access patterns never touch most of the
 * data:
 *
 *  - **Date partitioning** (`writeDatePartitioned`): one directory per
 *    calendar day of the event-time column. A time-bounded query reads
 *    only its days' directories — partition pruning happens at FILE
 *    LISTING, before any I/O, so a 7-day window over a year-long 100 TB
 *    table lists ~2% of it. Spark plans this automatically from a
 *    filter on the partition column (`PartitionFilters` in the scan
 *    node; asserted in TableLayoutSpec).
 *  - **Sort-within-files** (`sortCols`): rows inside each file are
 *    clustered on the given keys, so parquet row-group min/max stats
 *    make selective non-partition predicates (e.g. one user's events)
 *    skip most row groups of the already-pruned days.
 *  - **Bucketing** (`writeBucketed`): pre-shuffled at-rest layout for
 *    the JOIN/AGGREGATE key. Two tables bucketed on the same key with
 *    the same bucket count join with ZERO Exchange on either side —
 *    the shuffle was paid once at write time and amortizes over every
 *    subsequent join (asserted shuffle-free in TableLayoutSpec).
 *
 * File-count control: a day of a 100 TB/year table is ~280 GB — one
 * file per day is unwritable (one task) and unreadable (one split per
 * reader thread at listing grain). `filesPerPartition` splits each date
 * directory into that many files by hashing `spreadCol` (default: the
 * first sort key, so file-level clustering survives), sized so each
 * file lands near the scan's split size (`maxPartitionBytes`, 128 MB
 * default — ~2000 files/day for 280 GB). Local scale factors use small
 * values; the knob is the design point.
 */
object TableLayout {

  /** Partition-column name added by [[writeDatePartitioned]]. */
  val dateCol = "event_date"

  /**
   * Write `df` date-partitioned on `tsCol`'s calendar date,
   * `filesPerPartition` files per date directory, rows within each file
   * sorted on `sortCols`. One shuffle (the write-time clustering the
   * reads then never pay); the sort is per-file, not global.
   */
  def writeDatePartitioned(df: DataFrame, outDir: String,
                           tsCol: String = "ts",
                           sortCols: Seq[String] = Seq("user_id", "ts"),
                           filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition > 0, "filesPerPartition must be positive")
    val dated = df.withColumn(dateCol, to_date(col(tsCol)))
    // write parallelism = one task per (date, spread) value — hash
    // repartitioning needs at least that many target partitions or
    // distinct spread values collide into one task and the knob
    // silently degrades to fewer, larger files. One cheap distinct-count
    // of the date column (a column-pruned scan) sizes the shuffle; with
    // filesPerPartition=1 the default shuffle sizing is fine.
    val clustered =
      if (filesPerPartition == 1) dated.repartition(col(dateCol))
      else {
        val nDates = dated.select(col(dateCol)).distinct().count().toInt.max(1)
        dated.repartition(nDates * filesPerPartition * 2, col(dateCol),
          pmod(hash(col(sortCols.head)), lit(filesPerPartition)))
      }
    clustered
      .sortWithinPartitions((dateCol +: sortCols).map(col): _*)
      .write.partitionBy(dateCol).mode("overwrite").parquet(outDir)
  }

  /** Read a [[writeDatePartitioned]] layout back; `event_date` returns
    * as a DATE partition column — filter on it for listing-time pruning. */
  def readDatePartitioned(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /**
   * The driver-testdata `events` table in the date-partitioned layout,
   * built at most once per (sfDir) — the layout is content-addressed by
   * source directory and reused across sessions and JVMs (Verify and
   * Bench both consume it; the write happens on whichever ran first).
   * Concurrent builders race benignly: each writes to a private temp
   * dir and the loser of the atomic rename discards its copy.
   */
  def eventsDatePartitioned(spark: SparkSession, sfDir: String): DataFrame =
    SharedFrames.memo(spark, sfDir, "events-by-date", persist = false) {
      val base = Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_layout", sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      val dst = base.resolve("events_by_date")
      if (!Files.exists(dst.resolve("_SUCCESS"))) {
        val tmp = base.resolve(s"events_by_date.tmp-${java.util.UUID.randomUUID()}")
        Files.createDirectories(base)
        writeDatePartitioned(Tables.events(spark, sfDir), tmp.toString)
        try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileSystemException =>
          // another builder won the rename; its layout is equivalent
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
      }
      readDatePartitioned(spark, dst.toString)
    }

  /**
   * Write `df` as a bucketed+sorted catalog table: `nBuckets` buckets on
   * `bucketCol`, each bucket file sorted on `sortCols` (default: the
   * bucket key, which lets a same-key sort-merge join skip its Sort
   * nodes too). Parquet files land under `path`; the bucketing spec
   * lives in the session catalog, which is what lets the planner elide
   * the Exchange for joins/aggregations keyed on `bucketCol`.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int,
                    sortCols: Seq[String] = Seq.empty): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.write.format("parquet").option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
