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
    * as a DATE partition column — filter on it for listing-time pruning.
    *
    * Reads the partition DIRECTORIES (one root listing + basePath), not the root:
    * the directory tree is the single source of truth. A root read of a
    * [[streamToDatePartitioned]]-landed layout would instead consult
    * the sink's `_spark_metadata` file log — which a maintenance
    * rewrite ([[compactDatePartitions]]/[[upsertDatePartitions]])
    * deliberately invalidates. Under directory-as-truth the sink log
    * governs only the sink's own append recovery (its exactly-once
    * contract), and maintenance passes own the files. */
  def readDatePartitioned(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val parts =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(s"$dateCol="))
        .map(_.getPath.toString).sorted
    if (parts.isEmpty) spark.read.parquet(dir)
    else spark.read.option("basePath", dir).parquet(parts.toIndexedSeq: _*)
  }

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
   * Land a STREAM into the date-partitioned layout: the streaming side
   * of [[writeDatePartitioned]], so ingest lands directly in the form
   * time-bounded readers prune. Append-mode file sink with a checkpoint
   * (exactly-once across restarts); each microbatch writes only the
   * date directories its rows touch. Microbatch-sized files are the
   * cost of streaming landing — [[compactDatePartitions]] is the
   * matching maintenance pass (run it on CLOSED dates: past the
   * watermark horizon no new rows can arrive for a day, so compaction
   * never races an appending writer).
   */
  def streamToDatePartitioned(df: DataFrame, dir: String, checkpoint: String,
                              tsCol: String = "ts")
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.withColumn(dateCol, to_date(col(tsCol)))
      .writeStream.format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpoint)
      .partitionBy(dateCol)
      .outputMode("append")
      .start()

  /**
   * Compact the small files of selected date partitions into
   * `filesPerPartition` sorted files each — the maintenance pass that
   * keeps a streaming-landed or incrementally-appended layout readable
   * (a 100 TB table accreting microbatch files degrades to
   * listing-bound scans; per-file row-group clustering also decays when
   * every file holds a minute of data). Rewrites ONLY the partitions
   * `predicate` selects — dynamic partition overwrite leaves every
   * other date directory untouched (byte-identical files, asserted in
   * TableLayoutSpec) — so the pass is O(touched days), never O(table).
   *
   * Run on closed (past-watermark) dates; the rewrite of a partition is
   * atomic at commit but readers racing a compaction of a STILL-OPEN
   * partition could see a day twice or not at all.
   */
  def compactDatePartitions(spark: SparkSession, dir: String,
                            predicate: Column,
                            sortCols: Seq[String] = Seq("user_id", "ts"),
                            filesPerPartition: Int = 1): Unit = {
    val touched = readDatePartitioned(spark, dir).filter(predicate)
    val spread: Column =
      if (filesPerPartition == 1) lit(0)
      else pmod(hash(col(sortCols.head)), lit(filesPerPartition))
    rewritePartitions(spark, dir,
      touched.repartition(col(dateCol), spread), sortCols)
  }

  /**
   * Upsert a batch of rows into the date-partitioned layout at DAY
   * grain: every date the updates touch is rewritten as
   * merge(existing rows not replaced, updates), all other dates'
   * files stay untouched on disk (dynamic partition overwrite). This
   * is the lakehouse `replaceWhere`-merge shape without a table
   * format: corrections, late backfills, and GDPR deletes arrive as a
   * small batch and cost O(touched days' bytes), not O(table).
   *
   * @param updates new/replacement rows (same schema as the layout's
   *                data columns; `tsCol` decides the target partition)
   * @param keyCols row identity — an existing row matching an update on
   *                `keyCols` is replaced; everything else is kept
   */
  def upsertDatePartitions(spark: SparkSession, dir: String,
                           updates: DataFrame, keyCols: Seq[String],
                           tsCol: String = "ts",
                           sortCols: Seq[String] = Seq("user_id", "ts")): Unit = {
    val dated = updates.withColumn(dateCol, to_date(col(tsCol)))
    // day-grain: only partitions holding an update participate
    val touchedDates = dated.select(col(dateCol)).distinct()
    val existing = readDatePartitioned(spark, dir)
      .join(broadcast(touchedDates), Seq(dateCol), "left_semi")
    val kept = existing.join(broadcast(dated.select(keyCols.map(col): _*)),
      keyCols, "left_anti")
    val merged = kept.unionByName(dated.select(kept.columns.map(col): _*))
      .repartition(col(dateCol))
    rewritePartitions(spark, dir, merged, sortCols)
  }

  /**
   * Rewrite only the date partitions present in `frame`: stage the
   * whole frame as a partitioned write to a sibling temp directory
   * (fully distributed — the staging write is the only data motion),
   * then swap each staged `event_date=` directory into the layout with
   * two directory renames (metadata ops). Spark refuses to overwrite a
   * path a plan is reading, and dynamic partition overwrite into the
   * source would hit exactly that — staging sidesteps it and keeps each
   * partition's swap near-atomic. Untouched partitions' files are never
   * opened, let alone rewritten (byte-identity asserted in
   * TableLayoutSpec).
   */
  private def rewritePartitions(spark: SparkSession, dir: String,
                                frame: DataFrame,
                                sortCols: Seq[String]): Unit = {
    val target = Paths.get(dir)
    val staging = target.resolveSibling(
      s"${target.getFileName}.staging-${java.util.UUID.randomUUID()}")
    frame
      .sortWithinPartitions((dateCol +: sortCols).map(col): _*)
      .write.partitionBy(dateCol).mode("overwrite").parquet(staging.toString)
    try {
      val stagedParts = {
        val s = Files.list(staging)
        try {
          val it = s.iterator()
          val buf = scala.collection.mutable.ListBuffer.empty[java.nio.file.Path]
          while (it.hasNext) buf += it.next()
          buf.toList
        } finally s.close()
      }
      stagedParts
        .filter(_.getFileName.toString.startsWith(s"$dateCol="))
        .foreach { staged =>
          val dst = target.resolve(staged.getFileName.toString)
          val retired = target.resolve(s".${staged.getFileName}.retired")
          if (Files.exists(dst)) Files.move(dst, retired)
          Files.move(staged, dst)
          if (Files.exists(retired))
            org.apache.commons.io.FileUtils.deleteDirectory(retired.toFile)
        }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(staging.toFile)
  }

  /**
   * Z-order (Morton) clustering value over `zCols` — multi-key file
   * clustering for tables read selectively on MORE THAN ONE key, where
   * a single-key sort gives perfect skipping on that key and none on
   * any other. Each column is min/max-scaled to a `bits`-wide integer
   * cell (two scalar aggregates → plan literals) and the cells'
   * bits interleave into one long; sorting on it keeps every file's
   * min/max box TIGHT on all z-keys simultaneously, so a selective
   * filter on ANY of them intersects few files (file-grain receipt in
   * TableLayoutSpec; on plain parquet the same clustering prunes at
   * ROW-GROUP grain via pushed-down min/max stats — file-grain skipping
   * additionally needs a stats-carrying table format or a
   * per-file-stats planner, which is exactly what the spec's
   * input_file_name audit computes).
   *
   * Built from codegen'd built-ins (shift/and/or fold — 2·bits terms),
   * no UDF. Linear min/max scaling keeps the cell math plan-literal;
   * heavily skewed keys would want rank-based cells (a range-partitioner
   * boundary collect) — same interleave, different scaling.
   */
  def zOrderValue(df: DataFrame, zCols: Seq[String], bits: Int = 12): Column = {
    require(zCols.nonEmpty && zCols.size * bits <= 62,
      s"zCols*bits = ${zCols.size * bits} must fit a long")
    val aggs = zCols.flatMap(c => Seq(min(col(c).cast("double")),
      max(col(c).cast("double"))))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val cellMax = (1L << bits) - 1
    val cells = zCols.zipWithIndex.map { case (c, i) =>
      val (lo, hi) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
      if (hi <= lo) lit(0L)
      else least(lit(cellMax), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(cellMax.toDouble))
          .cast("long")))
    }
    // interleave: output bit (k*nCols + j) takes cell j's bit k
    val n = zCols.size
    (0 until bits).flatMap { k =>
      cells.zipWithIndex.map { case (cell, j) =>
        shiftleft(shiftright(cell, k).bitwiseAND(lit(1L)), k * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /**
   * Write `df` Z-order-clustered on `zCols` into `numFiles` files:
   * range-repartition on the z-value (contiguous z-ranges per file →
   * tight per-file boxes), sort within each file on it (row-group-grain
   * clustering inside the file), then drop the helper column.
   */
  def writeZOrdered(df: DataFrame, outDir: String, zCols: Seq[String],
                    numFiles: Int, bits: Int = 12): Unit =
    df.withColumn("__z", zOrderValue(df, zCols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /**
   * Per-file min/max stats manifest over a layout — the catalog half of
   * file-grain data skipping on plain parquet (what Delta/Iceberg carry
   * in their metadata layers): one row per data file with (path, rows,
   * per-column min/max). Built with ONE distributed pass grouped by
   * `input_file_name()` — O(files) output rows, written next to the
   * layout as `_graft_stats`. Rebuild after a maintenance pass
   * ([[compactDatePartitions]]/[[upsertDatePartitions]]) the same way —
   * the build cost is one scan of the touched table, the benefit is
   * every subsequent selective read opening only intersecting files.
   */
  def buildFileStats(spark: SparkSession, dir: String,
                     statsCols: Seq[String]): Unit = {
    val data = spark.read.parquet(dataFilePaths(spark, dir): _*)
    val aggs = count(lit(1)).as("rows") +: statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    data.groupBy(input_file_name().as("path"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_graft_stats")
  }

  /**
   * Stats-pruned read: `bounds` are (column, lo, hi) inclusive ranges;
   * only files whose manifest box intersects EVERY bound are opened
   * (the manifest is O(files) rows — a driver-side collect of the
   * surviving paths, the same listing-grain work a table format's
   * planner does). The predicate itself still applies row-level — stats
   * pruning is a superset guarantee, never a filter. Combined with
   * [[writeZOrdered]] this gives selective multi-key reads on plain
   * parquet; on a single-key-sorted layout it prunes that key alone.
   */
  def readStatsPruned(spark: SparkSession, dir: String,
                      bounds: Seq[(String, Any, Any)]): DataFrame = {
    val manifest = spark.read.parquet(s"$dir/_graft_stats")
    val keep = bounds.foldLeft(manifest) { case (m, (c, lo, hi)) =>
      m.filter(col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))
    }
    val paths = keep.select(col("path")).collect().map(_.getString(0))
    val pred = bounds.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (paths.isEmpty)
      spark.read.parquet(dataFilePaths(spark, dir): _*).filter(pred)
        .limit(0)
    else spark.read.parquet(paths.toIndexedSeq: _*).filter(pred)
  }

  /**
   * Incremental manifest maintenance after a layout change
   * ([[compactDatePartitions]], [[upsertDatePartitions]], a streaming
   * landing, a plain append): every rewrite produces NEW file names, so
   * a path diff against the manifest identifies exactly the touched
   * files — dead manifest rows drop, only files the manifest has never
   * seen are scanned. Cost is O(new files) data read + O(manifest)
   * bookkeeping, never a full-table rescan; the refreshed manifest is
   * byte-equivalent to a from-scratch [[buildFileStats]] (spec-pinned).
   * Returns (files added, files dropped) for the caller's bookkeeping.
   * The manifest rewrite stages and swaps (a read path cannot be
   * overwritten in the same plan).
   */
  def refreshFileStats(spark: SparkSession, dir: String,
                       statsCols: Seq[String]): (Long, Long) = {
    val statsDir = s"$dir/_graft_stats"
    val statsPath = new org.apache.hadoop.fs.Path(statsDir)
    val fs = statsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(statsPath)) {
      buildFileStats(spark, dir, statsCols)
      return (dataFilePaths(spark, dir).size.toLong, 0L)
    }
    // input_file_name() and FileSystem.listStatus render the same file
    // in different URI forms (file:///x vs file:/x) — compare through
    // Path normalization, keep the manifest's own raw strings for reads
    def norm(s: String) = new org.apache.hadoop.fs.Path(s).toString
    val current = dataFilePaths(spark, dir)
    val currentSet = current.map(norm).toSet
    val manifest = spark.read.parquet(statsDir)
    val rawKnown = manifest.select(col("path")).collect().map(_.getString(0))
    val known = rawKnown.map(norm).toSet
    val newPaths = current.filterNot(p => known(norm(p)))
    val keptRaw = rawKnown.filter(p => currentSet(norm(p)))
    val dropped = (rawKnown.length - keptRaw.length).toLong
    val kept = manifest.filter(col("path").isin(keptRaw.toIndexedSeq: _*))
    val merged =
      if (newPaths.isEmpty) kept
      else {
        val aggs = count(lit(1)).as("rows") +: statsCols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        kept.unionByName(spark.read.parquet(newPaths.toIndexedSeq: _*)
          .groupBy(input_file_name().as("path"))
          .agg(aggs.head, aggs.tail: _*))
      }
    val staging = s"$dir/.graft_stats.staging-${java.util.UUID.randomUUID()}"
    merged.coalesce(1).write.mode("overwrite").parquet(staging)
    fs.delete(statsPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), statsPath)
    (newPaths.size.toLong, dropped)
  }

  /** All parquet data files under `dir` (recursive), excluding the
    * `_graft_stats` manifest and hidden/metadata entries. */
  private def dataFilePaths(spark: SparkSession, dir: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val out = scala.collection.mutable.ListBuffer.empty[String]
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { s =>
        val name = s.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) ()
        else if (s.isDirectory) walk(s.getPath)
        else if (name.endsWith(".parquet")) out += s.getPath.toString
      }
    walk(root)
    out.toList
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
