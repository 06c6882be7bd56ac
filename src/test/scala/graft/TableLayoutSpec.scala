package graft

import graft.queries.{EventQueries, Tables}
import graft.sources.TableLayout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/**
 * Physical-layout guarantees: date partitioning prunes at file listing,
 * sort-within-files clusters rows, bucketing elides the join shuffle —
 * and none of it changes a single value.
 */
class TableLayoutSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // AQE query stages are LEAF nodes wrapping their real plan — recurse
  // through QueryStageExec.plan by hand (the PlanShapeSpec walk)
  private def walk(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: through.flatMap(walk)
  }

  private def scanNodes(df: DataFrame): Seq[FileSourceScanExec] =
    walk(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }

  test("date-partitioned layout: the week filter prunes 7 of 30 date " +
    "directories at listing time and values match the raw table") {
    val pruned = EventQueries.eventsLayoutPruneQ(spark, sfDir)
    val rows = pruned.collect()

    // plan carries the partition filter, not a post-scan predicate
    val scans = scanNodes(pruned)
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    // listing-time pruning: only the 7 selected date directories' files
    // are read (one file per date at the default filesPerPartition=1)
    assert(scan.metrics("numFiles").value == 7, scan.metrics("numFiles"))

    // values identical to the raw-table rollup
    val raw = Tables.events(spark, sfDir)
      .filter(to_date(col("ts")).between("2024-01-08", "2024-01-14"))
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("event_date"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 1e6).cast("long")) / 1e6).as("sum_value"))
      .collect()
    assert(rows.map(_.toSeq).toSet == raw.map(_.toSeq).toSet)
    assert(rows.length == 7 * 5) // 7 days x 5 event types
  }

  test("sort-within-files clusters rows on (user_id, ts) for row-group " +
    "stat pruning") {
    val part = TableLayout.eventsDatePartitioned(spark, sfDir)
    val oneDay = part.filter(col("event_date") === "2024-01-03")
    // within the single file of that date, rows must be non-decreasing
    // on user_id (the clustering key row-group stats prune on)
    val ids = oneDay.select(col("user_id")).collect().map(_.getLong(0))
    assert(ids.length > 10)
    assert(ids.sameElements(ids.sorted), "rows not clustered by user_id")
  }

  test("filesPerPartition spreads each date directory into hash-split " +
    "files without changing the data") {
    val out = Files.createTempDirectory("layout_spread").toString
    TableLayout.writeDatePartitioned(
      Tables.events(spark, sfDir), out, filesPerPartition = 3)
    val dayDir = Paths.get(out, "event_date=2024-01-03")
    val nFiles = Files.list(dayDir).filter(_.toString.endsWith(".parquet")).count()
    assert(nFiles >= 2 && nFiles <= 3, s"expected 2-3 files, got $nFiles")
    val readBack = TableLayout.readDatePartitioned(spark, out)
    assert(readBack.count() == Tables.events(spark, sfDir).count())
  }

  // ---- layout maintenance: streaming landing, compaction, upsert ----

  private def mkEvents(rows: Seq[(Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("value"))
  }

  /** (relative path -> content hash) of every data file outside `except`. */
  private def fileHashes(dir: String, except: Set[String]): Map[String, Int] = {
    val base = Paths.get(dir)
    val s = Files.walk(base)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.Map.empty[String, Int]
      while (it.hasNext) {
        val p = it.next()
        val rel = base.relativize(p).toString
        if (Files.isRegularFile(p) && rel.endsWith(".parquet") &&
            !except.exists(rel.startsWith))
          buf(rel) = java.util.Arrays.hashCode(Files.readAllBytes(p))
      }
      buf.toMap
    } finally s.close()
  }

  test("streaming landing writes the pruning layout; compaction merges a " +
    "closed date's microbatch files without touching other dates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val work = Files.createTempDirectory("layout_stream").toString
    val dir = s"$work/events"
    val stream = MemoryStream[(Long, String, Long, Double)](spark)
    val landed = stream.toDF().toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("value"))
    val q = TableLayout.streamToDatePartitioned(landed, dir, s"$work/ckpt")
    try {
      // two microbatches over the same dates -> >=2 files per date dir
      stream.addData((0L until 20L).map(i =>
        (i, s"2024-02-0${1 + (i % 2)} 12:00:00", i % 5, i * 1.0)))
      q.processAllAvailable()
      stream.addData((20L until 40L).map(i =>
        (i, s"2024-02-0${1 + (i % 2)} 13:00:00", i % 5, i * 1.0)))
      q.processAllAvailable()
    } finally q.stop()

    def dataFiles(date: String): Seq[String] = {
      val p = Paths.get(dir, s"event_date=$date")
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val buf = scala.collection.mutable.ListBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next().getFileName.toString
          if (f.endsWith(".parquet")) buf += f
        }
        buf.toList
      } finally s.close()
    }
    assert(dataFiles("2024-02-01").size >= 2, "expected microbatch files")
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 40)

    // compact ONLY 2024-02-01; 2024-02-02's files must stay byte-identical
    val before = fileHashes(dir, except = Set("event_date=2024-02-01"))
    TableLayout.compactDatePartitions(spark, dir,
      col(TableLayout.dateCol) === "2024-02-01")
    assert(dataFiles("2024-02-01").size == 1, "compaction must merge files")
    assert(fileHashes(dir, except = Set("event_date=2024-02-01")) == before,
      "untouched partitions were rewritten")
    val readBack = TableLayout.readDatePartitioned(spark, dir)
    assert(readBack.count() == 40)
    // compacted file is clustered on the sort key
    val ids = readBack.filter(col("event_date") === "2024-02-01")
      .select("user_id").collect().map(_.getLong(0))
    assert(ids.sameElements(ids.sorted))
  }

  test("upsert rewrites only the touched dates: replaced keys, kept " +
    "rows, new partition; others byte-identical") {
    val work = Files.createTempDirectory("layout_upsert").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents((0L until 30L).map(i =>
        (i, s"2024-03-${"%02d".format(1 + (i % 3).toInt)} 10:00:00",
          i % 7, 1.0))),
      dir)

    // replace event 3 (lands on 2024-03-01), add event 100 on 03-01 and
    // event 101 on a brand-new date 03-09
    val updates = mkEvents(Seq(
      (3L, "2024-03-01 10:00:00", 3L, 99.0),
      (100L, "2024-03-01 11:00:00", 1L, 50.0),
      (101L, "2024-03-09 11:00:00", 2L, 60.0)))
    val before = fileHashes(dir,
      except = Set("event_date=2024-03-01", "event_date=2024-03-09"))
    TableLayout.upsertDatePartitions(spark, dir, updates, Seq("event_id"))

    val after = TableLayout.readDatePartitioned(spark, dir)
    assert(after.count() == 32) // 30 existing - 1 replaced + 3 upserts... = 32
    assert(after.filter(col("event_id") === 3L).select("value")
      .collect().map(_.getDouble(0)).toSeq == Seq(99.0))
    assert(after.filter(col("event_date") === "2024-03-09").count() == 1)
    // a key NOT in the updates on a touched date survives the rewrite
    assert(after.filter(col("event_id") === 0L).count() == 1)
    assert(fileHashes(dir,
      except = Set("event_date=2024-03-01", "event_date=2024-03-09")) == before,
      "untouched partitions were rewritten")
  }

  test("upsert replaces a key GLOBALLY: a row whose event time moves to " +
    "a different day loses its old copy in the old partition") {
    val work = Files.createTempDirectory("layout_move").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents(Seq(
        (1L, "2024-06-01 10:00:00", 1L, 1.0),
        (2L, "2024-06-01 11:00:00", 2L, 1.0),
        (3L, "2024-06-02 10:00:00", 3L, 1.0),
        (4L, "2024-06-03 10:00:00", 4L, 1.0))),
      dir)
    // event 3 moves from 06-02 (its ONLY row — the partition must
    // disappear) to 06-01; 06-03 is untouched
    val before = fileHashes(dir,
      except = Set("event_date=2024-06-01", "event_date=2024-06-02"))
    TableLayout.upsertDatePartitions(spark, dir,
      mkEvents(Seq((3L, "2024-06-01 12:00:00", 3L, 7.0))), Seq("event_id"))
    val after = TableLayout.readDatePartitioned(spark, dir)
    assert(after.count() == 4)
    val e3 = after.filter(col("event_id") === 3L).collect()
    assert(e3.length == 1, "moved key must exist exactly once")
    assert(e3.head.getAs[java.sql.Date]("event_date").toString == "2024-06-01")
    assert(!Files.exists(Paths.get(dir, "event_date=2024-06-02")),
      "emptied partition directory must be retired")
    assert(fileHashes(dir,
      except = Set("event_date=2024-06-01", "event_date=2024-06-02")) == before,
      "untouched partitions were rewritten")
  }

  test("keysSpanDates=false skips the probe scan: target dates only are " +
    "touched, and a date-moving update's old copy survives (the " +
    "documented trade)") {
    val work = Files.createTempDirectory("layout_daygrain").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents(Seq(
        (1L, "2024-06-10 10:00:00", 1L, 1.0),
        (2L, "2024-06-11 10:00:00", 2L, 1.0))),
      dir)
    val before = fileHashes(dir, except = Set("event_date=2024-06-10"))
    // event 2 "moves" to 06-10, but the caller promised no day moves
    TableLayout.upsertDatePartitions(spark, dir,
      mkEvents(Seq((2L, "2024-06-10 12:00:00", 2L, 9.0))), Seq("event_id"),
      keysSpanDates = false)
    val after = TableLayout.readDatePartitioned(spark, dir)
    // the old 06-11 copy is still alive — day-grain semantics, not a bug
    assert(after.filter(col("event_id") === 2L).count() == 2)
    assert(fileHashes(dir, except = Set("event_date=2024-06-10")) == before,
      "only the update's target date may be rewritten")
    // same-day correction under the knob is exact
    TableLayout.upsertDatePartitions(spark, dir,
      mkEvents(Seq((1L, "2024-06-10 10:00:00", 1L, 5.0))), Seq("event_id"),
      keysSpanDates = false)
    assert(TableLayout.readDatePartitioned(spark, dir)
      .filter(col("event_id") === 1L)
      .select("value").head().getDouble(0) == 5.0)
  }

  test("deleteDateKeys removes matching rows everywhere, retires emptied " +
    "partitions, and leaves untouched dates byte-identical") {
    val work = Files.createTempDirectory("layout_delete").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents((0L until 20L).map(i =>
        (i, s"2024-07-${"%02d".format(1 + (i % 4).toInt)} 10:00:00",
          i % 3, 1.0))),
      dir)
    import spark.implicits._
    // user 0's rows span several dates; delete them all (the GDPR shape)
    val doomed = mkEvents((0L until 20L).filter(_ % 3 == 0).map(i =>
      (i, s"2024-07-${"%02d".format(1 + (i % 4).toInt)} 10:00:00", 0L, 1.0)))
      .select("event_id")
    TableLayout.deleteDateKeys(spark, dir, doomed, Seq("event_id"))
    val after = TableLayout.readDatePartitioned(spark, dir)
    assert(after.count() == 20 - 7)
    assert(after.filter(col("user_id") === 0L).count() == 0)
    // idempotent: deleting the same keys again is a no-op
    TableLayout.deleteDateKeys(spark, dir, doomed, Seq("event_id"))
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 13)
    // empty delete set touches nothing
    TableLayout.deleteDateKeys(spark, dir, doomed.limit(0), Seq("event_id"))
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 13)
    // deleting a date's every remaining row retires its directory
    val date4 = mkEvents(Seq(7L, 11L, 19L).map(i =>
      (i, "2024-07-04 10:00:00", i % 3, 1.0))).select("event_id")
    TableLayout.deleteDateKeys(spark, dir, date4, Seq("event_id"))
    assert(!Files.exists(Paths.get(dir, "event_date=2024-07-04")),
      "fully-deleted partition directory must be retired")
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 10)
  }

  test("a crashed partition swap self-heals on the next maintenance " +
    "entry instead of wedging or hiding the day") {
    val work = Files.createTempDirectory("layout_heal").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents(Seq(
        (1L, "2024-08-01 10:00:00", 1L, 1.0),
        (2L, "2024-08-02 10:00:00", 2L, 1.0))),
      dir)
    val day = Paths.get(dir, "event_date=2024-08-01")
    // simulate a crash BETWEEN the two moves: the live dir was retired,
    // the staged one never arrived — readers would see the day vanish
    val retired = Paths.get(dir, ".event_date=2024-08-01.retired-deadbeef")
    Files.move(day, retired)
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 1)
    // any maintenance pass heals it (here: a compaction of the OTHER day)
    TableLayout.compactDatePartitions(spark, dir,
      col(TableLayout.dateCol) === "2024-08-02")
    assert(Files.isDirectory(day), "vanished day must be restored")
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 2)
    // post-swap garbage (live dir present + leftover retired) just drops
    val garbage = Paths.get(dir, ".event_date=2024-08-02.retired-cafe")
    Files.createDirectories(garbage)
    TableLayout.compactDatePartitions(spark, dir,
      col(TableLayout.dateCol) === "2024-08-02")
    assert(!Files.exists(garbage), "stale retired dir must be cleaned")
    assert(TableLayout.readDatePartitioned(spark, dir).count() == 2)
  }

  test("upsert merge plans no forced broadcast: with broadcast disabled " +
    "the anti join degrades to a shuffled join, never a driver-sized " +
    "broadcast") {
    val work = Files.createTempDirectory("layout_nobcast").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents((0L until 10L).map(i =>
        (i, "2024-09-01 10:00:00", i % 3, 1.0))), dir)
    val updates = mkEvents(Seq((1L, "2024-09-01 11:00:00", 1L, 9.0)))
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val (merged, _) =
        TableLayout.upsertMergedFrame(spark, dir, updates, Seq("event_id"))
      merged.collect()
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      val bcasts = walk(merged.queryExecution.executedPlan)
        .count(_.isInstanceOf[BroadcastExchangeExec])
      assert(bcasts == 0,
        s"upsert merge forced $bcasts broadcast(s):\n" +
          merged.queryExecution.executedPlan)
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-order clustering keeps per-file boxes tight on BOTH keys; a " +
    "single-key sort skips only its own key") {
    val n = 100L
    // uniform n x n grid, order destroyed
    val grid = spark.range(n * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).as("y"))
      .repartition(8)
    val work = Files.createTempDirectory("layout_zorder").toString
    val xDir = s"$work/x_sorted"
    val zDir = s"$work/z_ordered"
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(xDir)
    TableLayout.writeZOrdered(grid, zDir, Seq("x", "y"), numFiles = 16)

    // file-grain min/max audit: how many files would a stats-carrying
    // planner have to open for a 5%-band filter on each key?
    def filesIntersecting(dir: String, c: String, lo: Long, hi: Long)
        : (Long, Long) = {
      val byFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      (byFile.filter(col("hi") >= lo && col("lo") <= hi).count(),
        byFile.count())
    }
    val (xFilesOnY, xTotal) = filesIntersecting(xDir, "y", 40, 44)
    val (zFilesOnY, zTotal) = filesIntersecting(zDir, "y", 40, 44)
    val (zFilesOnX, _) = filesIntersecting(zDir, "x", 40, 44)
    assert(xTotal == 16 && zTotal == 16)
    // x-sorted: every file spans the full y range — zero skipping
    assert(xFilesOnY == 16)
    // z-ordered: the band touches ~4 Morton blocks per key, plus up to
    // one range-boundary-jitter file per block edge — selective on
    // EITHER key, where the single-key sort can never skip on y. The
    // bound carries one extra file of slack: repartitionByRange SAMPLES
    // its boundaries with an RDD-id-derived seed, so on the shared
    // session the file cut points wobble ±1 file run to run (observed
    // 8 and 9 at the same commit) — 9/16 vs the control's 16/16 still
    // proves the clustering claim
    assert(zFilesOnY <= 9, s"y-band intersects $zFilesOnY of 16 z-files")
    assert(zFilesOnX <= 9, s"x-band intersects $zFilesOnX of 16 z-files")
    // clustering moved bytes, not values
    assert(spark.read.parquet(zDir).count() == n * n)
    assert(spark.read.parquet(zDir)
      .filter(col("y").between(40, 44)).count() == 5 * n)
  }

  test("ranked z-order cells survive heavy key skew where linear " +
    "min/max scaling prunes nothing") {
    // x: 97% of rows in [0, 9], 3% stretched out to ~1e9 — linear
    // scaling maps 97% of the table into cell 0 of 256, so x stops
    // contributing order and per-file boxes all span the dense region.
    // y uniform. The probe is a selective band INSIDE the dense region.
    val n = 10000L
    val skewed = spark.range(n).select(
      when(col("id") % 100 < 97, col("id") % 10)
        .otherwise((col("id") % 30) * 33333333L + 10L).as("x"),
      (col("id") % 100).as("y"))
      .repartition(8)
    val work = Files.createTempDirectory("layout_rank").toString
    val linDir = s"$work/linear"
    val rankDir = s"$work/ranked"
    TableLayout.writeZOrdered(skewed, linDir, Seq("x", "y"), numFiles = 16)
    TableLayout.writeZOrdered(skewed, rankDir, Seq("x", "y"), numFiles = 16,
      ranked = true)

    def filesIntersecting(dir: String, c: String, lo: Long, hi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .filter(col("hi") >= lo && col("lo") <= hi).count()

    // dense-region band x in [2, 3] (20% of rows): linear z cannot
    // separate it — every file's x-box covers cell 0 — while ranked
    // cells keep the bound the uniform-grid spec pins
    val linFiles = filesIntersecting(linDir, "x", 2, 3)
    val rankFiles = filesIntersecting(rankDir, "x", 2, 3)
    // the range partitioner's reservoir sampling gives the NEGATIVE
    // control a couple of files of run-to-run slack (a 13/16 reading
    // appeared under a loaded box); the claim is the CONTRAST: linear
    // boxes blanket the dense region, ranked cells stay selective
    assert(linFiles >= 12, s"expected linear collapse, got $linFiles/16")
    assert(linFiles > rankFiles + 3,
      s"no contrast: linear $linFiles vs ranked $rankFiles")
    // same ±1-file range-sampling slack as the uniform-grid spec above
    assert(rankFiles <= 9, s"ranked x-band intersects $rankFiles of 16")
    // and the ranked layout still skips on the OTHER key
    assert(filesIntersecting(rankDir, "y", 40, 44) <= 9)
    // clustering moved bytes, not values
    assert(spark.read.parquet(rankDir).count() == n)
    assert(spark.read.parquet(rankDir)
      .filter(col("x").between(2, 3)).count() ==
      skewed.filter(col("x").between(2, 3)).count())
  }

  test("events_zorder_box: the registered stats-pruned rollup opens " +
    "only manifest-intersecting files and matches the raw table") {
    val dir = TableLayout.eventsZOrdered(spark, sfDir)
    val pruned = TableLayout.readStatsPruned(spark, dir,
      Seq(("user_id", 3L, 5L), ("value", 40.0, 90.0)))
    pruned.collect()
    val opened = scanNodes(pruned).map(_.metrics("numFiles").value).sum
    assert(opened <= 8, s"two-key box opened $opened of 16 files")
    // the registered query's values match the raw-table rollup
    val got = EventQueries.eventsZorderBoxQ(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val want = Tables.events(spark, sfDir)
      .filter(col("user_id").between(3, 5) && col("value").between(40.0, 90.0))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 1e6).cast("long")) / 1e6).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("documents by-source layout: the source filter prunes whole " +
    "source directories at listing time; the n_chars band opens only " +
    "manifest-intersecting files; both match the raw table") {
    val pruned = graft.queries.DataPipelineQueries.docsLayoutPrune(spark, sfDir)
    val scans = scanNodes(pruned)
    assert(scans.nonEmpty)
    assert(scans.head.partitionFilters.nonEmpty, scans.head.toString)
    pruned.collect()
    // 3 of 20 source dirs at filesPerSource=2, +1 slack per dir for a
    // range task straddling a source boundary
    val opened = scans.head.metrics("numFiles").value
    assert(opened <= 9, s"source pruning opened $opened files")
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src3", "src7", "src11"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    assert(pruned.collect().map(_.toSeq).toSet == raw.collect().map(_.toSeq).toSet)

    val dir = TableLayout.documentsSourcePartitioned(spark, sfDir)
    val total = Files.walk(java.nio.file.Paths.get(dir)).iterator()
    val nFiles = {
      var n = 0
      while (total.hasNext) {
        val f = total.next()
        val name = f.getFileName.toString
        if (name.endsWith(".parquet") && !f.toString.contains("_graft_stats"))
          n += 1
      }
      n
    }
    val box = TableLayout.readStatsPruned(spark, dir,
      Seq(("n_chars", 250, 350)))
    box.collect()
    val boxScanned = scanNodes(box).map(_.metrics("numFiles").value).sum
    assert(boxScanned < nFiles,
      s"stats band opened all $nFiles files — manifest skipped nothing")
    // partition column survives the file-list read (basePath) and the
    // rollup equals the raw-table filter
    val boxRoll = graft.queries.DataPipelineQueries.docsStatsBox(spark, sfDir)
    val rawBox = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("n_chars").between(250, 350))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    assert(boxRoll.collect().map(_.toSeq).toSet ==
      rawBox.collect().map(_.toSeq).toSet)
  }

  test("streamToSourcePartitioned: a documents stream lands in source= " +
    "directories exactly once, and the landed read prunes on source") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val work = Files.createTempDirectory("docs_land").toString
    val stream = MemoryStream[(Long, String, String, String, Long)](spark)
    val q = TableLayout.streamToSourcePartitioned(
      stream.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      s"$work/landed", s"$work/ck")
    try {
      stream.addData((1L, "a", "en", "srcA", 1L), (2L, "b", "en", "srcB", 1L))
      q.processAllAvailable()
      stream.addData((3L, "c", "de", "srcA", 1L))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(s"$work/landed")
    assert(landed.count() == 3)
    assert(Files.isDirectory(Paths.get(s"$work/landed/source=srcA")))
    assert(Files.isDirectory(Paths.get(s"$work/landed/source=srcB")))
    val pruned = landed.filter(col("source") === "srcA")
    assert(pruned.collect().map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
    val scan = scanNodes(pruned)
    assert(scan.nonEmpty && scan.head.partitionFilters.nonEmpty)
  }

  test("deleteDocIds takedown: doomed ids vanish everywhere, untouched " +
    "source dirs are byte-identical, a fully-purged source retires, and " +
    "the pass is idempotent") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val work = Files.createTempDirectory("docs_takedown").toString
    val dir = s"$work/layout"
    TableLayout.writeDocumentsSourcePartitioned(spark, docs, dir)
    val n0 = spark.read.parquet(dir).count()

    // doomed: two ids from src2, one from src5, one nonexistent
    val doomedIds = Seq(2L, 42L, 5L, 999999L)
    val before = fileHashes(dir, except = Set("_graft_stats"))
    TableLayout.deleteDocIds(spark,
      dir, doomedIds.toDF("doc_id"))
    val after = spark.read.parquet(dir)
    assert(after.filter(col("doc_id").isin(doomedIds: _*)).count() == 0)
    assert(after.count() == n0 - 3, "exactly the existing doomed ids leave")
    // untouched sources (everything but src2/src5) byte-identical
    val hashesAfter = fileHashes(dir, except = Set("_graft_stats"))
    val touched = Set("source=src2", "source=src5")
    before.foreach { case (rel, h) =>
      if (!touched.exists(rel.startsWith))
        assert(hashesAfter.get(rel).contains(h), s"untouched file $rel changed")
    }
    // idempotent: a second identical pass rewrites nothing at all
    val h1 = fileHashes(dir, except = Set("_graft_stats"))
    TableLayout.deleteDocIds(spark, dir, doomedIds.toDF("doc_id"))
    assert(fileHashes(dir, except = Set("_graft_stats")) == h1)
    // manifest refresh then a stats-pruned band read stays exact
    TableLayout.refreshFileStats(spark, dir, Seq("n_chars", "doc_id"))
    val band = TableLayout.readStatsPruned(spark, dir,
      Seq(("n_chars", 250, 350)))
    val want = docs.filter(!col("doc_id").isin(doomedIds: _*))
      .filter(col("n_chars").between(250, 350))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(band.select(col("doc_id")).collect().map(_.getLong(0)).toSet == want)
    // purge an entire source: its directory retires from the layout
    val allSrc7 = docs.filter(col("source") === "src7")
      .select(col("doc_id"))
    TableLayout.deleteDocIds(spark, dir, allSrc7)
    assert(!Files.isDirectory(Paths.get(dir).resolve("source=src7")))
    assert(spark.read.parquet(dir)
      .filter(col("source") === "src7").count() == 0)
  }

  test("deleteDocIds escapes partition values: a source needing path " +
    "escaping (space, colon) is purged, not silently resurrected") {
    import spark.implicits._
    // Spark's writer escapes ':' and '%' in partition paths (space is
    // written literally); a raw s"source=$value" interpolation matches
    // neither form, so the fully-purged-source retire silently skipped
    // the directory and its rows resurrected (ADVICE r12)
    val docs = Seq(
      (1L, "a", "en", "web crawl:v2", 10L),
      (2L, "b", "en", "web crawl:v2", 20L),
      (3L, "c", "en", "plain", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val work = Files.createTempDirectory("docs_escape").toString
    val dir = s"$work/layout"
    TableLayout.writeDocumentsSourcePartitioned(spark, docs, dir,
      filesPerSource = 1)
    // the layout dir really is escaped on disk — pin the premise
    val sourceDirs = Paths.get(dir).toFile.listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(sourceDirs.exists(d => d.startsWith("source=") && d != "source=plain"),
      s"expected an escaped source dir, got $sourceDirs")
    assert(!sourceDirs.contains("source=web crawl:v2"),
      "premise: Spark escapes ':' in partition dir names")
    // purge the whole escaped source: both rows gone, directory retired
    TableLayout.deleteDocIds(spark, dir, Seq(1L, 2L).toDF("doc_id"))
    val after = spark.read.parquet(dir)
    assert(after.count() == 1 && after.head().getAs[String]("source") == "plain",
      "the escaped source's rows must not resurrect")
    val dirsAfter = Paths.get(dir).toFile.listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filterNot(_.startsWith("_")).toSet
    assert(dirsAfter == Set("source=plain"), s"stale dirs: $dirsAfter")
    // partial purge of an escaped source rewrites it in place correctly
    val dir2 = s"$work/layout2"
    TableLayout.writeDocumentsSourcePartitioned(spark, docs, dir2,
      filesPerSource = 1)
    TableLayout.deleteDocIds(spark, dir2, Seq(1L).toDF("doc_id"))
    val after2 = spark.read.parquet(dir2)
    assert(after2.count() == 2)
    assert(after2.filter(col("source") === "web crawl:v2")
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("file-stats manifest: the pruned reader opens only intersecting " +
    "files and returns exactly the predicate's rows") {
    val n = 100L
    val grid = spark.range(n * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).as("y"))
      .repartition(8)
    val work = Files.createTempDirectory("layout_stats").toString
    val zDir = s"$work/z"
    TableLayout.writeZOrdered(grid, zDir, Seq("x", "y"), numFiles = 16)
    TableLayout.buildFileStats(spark, zDir, Seq("x", "y"))

    val pruned = TableLayout.readStatsPruned(spark, zDir,
      Seq(("y", 40L, 44L)))
    val rows = pruned.collect()
    assert(rows.length == 5 * n)
    assert(rows.forall(r => r.getLong(1) >= 40L && r.getLong(1) <= 44L))
    // the scan touched only the manifest-intersecting files
    val scanned = scanNodes(pruned).map(_.metrics("numFiles").value).sum
    assert(scanned <= 8, s"stats pruning opened $scanned of 16 files")

    // a two-key box prunes harder than either key alone
    val box = TableLayout.readStatsPruned(spark, zDir,
      Seq(("x", 40L, 44L), ("y", 40L, 44L)))
    assert(box.count() == 25)
    val boxScanned = scanNodes(box).map(_.metrics("numFiles").value).sum
    assert(boxScanned <= 4, s"box read opened $boxScanned of 16 files")

    // an out-of-domain range opens nothing and returns nothing
    assert(TableLayout.readStatsPruned(spark, zDir,
      Seq(("y", 1000L, 2000L))).count() == 0)
  }

  test("refreshFileStats diffs paths: scans only new files, drops dead " +
    "rows, matches a full rebuild") {
    val work = Files.createTempDirectory("layout_refresh").toString
    val dir = s"$work/events"
    TableLayout.writeDatePartitioned(
      mkEvents((0L until 60L).map(i =>
        (i, s"2024-04-${"%02d".format(1 + (i % 2).toInt)} 10:00:00",
          i % 7, 1.0))),
      dir, filesPerPartition = 3)
    TableLayout.buildFileStats(spark, dir, Seq("user_id", "value"))

    def datePartFiles(date: String): Long = {
      val s = Files.list(Paths.get(dir, s"event_date=$date"))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }
    val oldFiles = datePartFiles("2024-04-01")
    assert(oldFiles >= 2)

    TableLayout.compactDatePartitions(spark, dir,
      col(TableLayout.dateCol) === "2024-04-01")
    val (added, dropped) =
      TableLayout.refreshFileStats(spark, dir, Seq("user_id", "value"))
    assert(added == 1L, s"expected 1 new (compacted) file, got $added")
    assert(dropped == oldFiles)

    def manifestRows = spark.read.parquet(s"$dir/_graft_stats")
      .collect().map(_.toSeq).toSet
    val refreshed = manifestRows
    TableLayout.buildFileStats(spark, dir, Seq("user_id", "value"))
    assert(refreshed == manifestRows, "refresh diverged from full rebuild")
    // and the pruned reader stays correct over the refreshed manifest
    assert(TableLayout.readStatsPruned(spark, dir,
      Seq(("user_id", 3L, 3L))).count() ==
      (0L until 60L).count(_ % 7 == 3L))
  }

  test("maintenance loop under a LIVE landing stream: close date → " +
    "compact → refresh stats, pruned reads stay correct across the swap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val work = Files.createTempDirectory("layout_loop").toString
    val dir = s"$work/events"
    val stream = MemoryStream[(Long, String, Long, Double)](spark)
    val landed = stream.toDF().toDF("event_id", "ts_s", "user_id", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("user_id"), col("value"))
    val q = TableLayout.streamToDatePartitioned(landed, dir, s"$work/ckpt")
    val statsCols = Seq("user_id", "value")
    def prunedCount(u: Long): Long =
      TableLayout.readStatsPruned(spark, dir,
        Seq(("user_id", u, u))).count()
    try {
      // day 1 lands over several microbatches, day 2 opens
      stream.addData((0L until 20L).map(i =>
        (i, "2024-10-01 10:00:00", i % 5, i * 1.0)))
      q.processAllAvailable()
      stream.addData((20L until 40L).map(i =>
        (i, if (i < 30) "2024-10-01 22:00:00" else "2024-10-02 01:00:00",
          i % 5, i * 1.0)))
      q.processAllAvailable()
      TableLayout.buildFileStats(spark, dir, statsCols)
      assert(prunedCount(3L) == (0L until 40L).count(_ % 5 == 3))

      // the scheduled maintenance pass runs while the landing query is
      // LIVE: day 1 is past the horizon (closed) → compact it, refresh
      // the manifest incrementally
      assert(q.isActive)
      TableLayout.compactDatePartitions(spark, dir,
        col(TableLayout.dateCol) === "2024-10-01")
      val (added, dropped) = TableLayout.refreshFileStats(spark, dir, statsCols)
      assert(added == 1L, s"compaction should add 1 merged file, got $added")
      assert(dropped >= 2L, "the microbatch files' manifest rows must drop")
      // pruned reader correct ACROSS the swap, nothing lost or doubled
      assert(prunedCount(3L) == (0L until 40L).count(_ % 5 == 3))
      assert(TableLayout.readDatePartitioned(spark, dir).count() == 40)

      // the landing stream keeps appending to the OPEN day after the
      // swap; another refresh folds the new files in
      stream.addData((40L until 50L).map(i =>
        (i, "2024-10-02 02:00:00", i % 5, i * 1.0)))
      q.processAllAvailable()
      val (added2, dropped2) =
        TableLayout.refreshFileStats(spark, dir, statsCols)
      assert(added2 >= 1L && dropped2 == 0L)
      assert(prunedCount(3L) == (0L until 50L).count(_ % 5 == 3))
      assert(TableLayout.readDatePartitioned(spark, dir).count() == 50)
      // and the manifest equals a from-scratch rebuild (no drift)
      val refreshed = spark.read.parquet(s"$dir/_graft_stats")
        .collect().map(_.toSeq).toSet
      TableLayout.buildFileStats(spark, dir, statsCols)
      assert(spark.read.parquet(s"$dir/_graft_stats")
        .collect().map(_.toSeq).toSet == refreshed)
    } finally q.stop()
  }

  test("embeddings cell layout: the probe set prunes cell directories " +
    "at listing time and the pruned IVF equals the full-scan IVF") {
    import graft.similarity.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val layoutDir = TableLayout.embeddingsCellPartitioned(spark, sfDir)
    // all 16 cell directories exist on disk
    val cellDirs = {
      val s = Files.list(Paths.get(layoutDir))
      try s.toArray.map(_.toString).count(_.contains("cell="))
      finally s.close()
    }
    assert(cellDirs == 16, s"expected 16 cell dirs, got $cellDirs")
    val layout = spark.read.parquet(layoutDir)

    // a single query probes nProbe=4 of 16 cells: the layout scan must
    // touch at most those 4 directories
    val pruned = Similarity.ivfHashTopKPruned(emb, layout,
      nQueries = 1, k = 5)
    val full = Similarity.ivfHashTopK(emb, nQueries = 1, k = 5)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val prunedRows = rows(pruned)
    assert(prunedRows.nonEmpty && prunedRows == rows(full))
    val layoutScan = scanNodes(pruned)
      .find(_.relation.partitionSchema.fieldNames.contains("cell"))
      .getOrElse(fail("no partitioned scan over the cell layout"))
    assert(layoutScan.partitionFilters.nonEmpty, layoutScan.toString)
    assert(layoutScan.metrics("numPartitions").value <= 4,
      layoutScan.metrics("numPartitions"))

    // at the registered parameters (8 queries) the pruned form still
    // equals the full scan row-for-row — same centroids/probes/re-rank
    assert(rows(Similarity.ivfHashTopKPruned(emb, layout,
        nQueries = 8, k = 5)) ==
      rows(Similarity.ivfHashTopK(emb, nQueries = 8, k = 5)))
  }

  test("bucketed tables joined on the bucket key plan no shuffle " +
    "exchange; the unbucketed join does") {
    val work = Files.createTempDirectory("layout_bucketed").toString
    val events = Tables.events(spark, sfDir)
    val perUser = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    try {
      TableLayout.writeBucketed(events, "ev_bucketed",
        s"$work/ev", "user_id", 4, Seq("user_id", "ts"))
      TableLayout.writeBucketed(perUser, "usr_bucketed",
        s"$work/usr", "user_id", 4)

      val bucketed = spark.table("ev_bucketed")
        .join(spark.table("usr_bucketed"), "user_id")
      val got = bucketed.count()

      def shuffles(df: DataFrame): Int =
        walk(df.queryExecution.executedPlan)
          .count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles(bucketed) == 0,
        bucketed.queryExecution.executedPlan.toString)

      // the same join over plain parquet shuffles both sides — the
      // assertion above bites
      val plain = events.join(perUser, "user_id")
      assert(plain.count() == got)
      assert(shuffles(plain) > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS usr_bucketed")
    }
  }
}
