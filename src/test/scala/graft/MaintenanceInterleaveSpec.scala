package graft

import graft.sources.TableLayout
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Query × maintenance interleave, CI-sized (the measured row lives in
 * [[MaintenanceInterleaveBench]] / BASELINE.md r13): reader threads
 * hammer a date layout while a maintenance loop cycles
 * content-preserving compactions and identity upserts over two of its
 * dates. Contract under swap races:
 *
 *  - a full-table reader may catch a partition mid-swap (old, new, or
 *    absent for one rename) — it retries and must then match the
 *    constant expected checksum: ZERO exhausted retries or wrong
 *    values;
 *  - a reader of the UNTOUCHED partitions' own directories is never
 *    disturbed at all — exact on the first attempt, every iteration
 *    (file-level isolation: maintenance only moves the dirs it
 *    rewrites).
 */
class MaintenanceInterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("readers stay correct while compaction + identity upserts cycle " +
    "over the layout; untouched partitions are never disturbed") {
    val rows = for (d <- 1 to 4; u <- 0 until 30) yield
      (u.toLong, (d * 100 + u).toLong,
        java.sql.Timestamp.valueOf(f"2026-02-0$d 09:${u % 60}%02d:00"))
    val df = rows.toDF("user_id", "value", "ts")
    val work = Files.createTempDirectory("interleave").toString
    val dir = s"$work/layout"
    TableLayout.writeDatePartitioned(df, dir)
    val expectAll = (rows.size.toLong, rows.map(_._2).sum)
    val touched = Seq("2026-02-01", "2026-02-02")
    val untouchedPaths = Seq("2026-02-03", "2026-02-04")
      .map(d => s"$dir/${TableLayout.dateCol}=$d")
    val expectUntouched = (60L,
      rows.filter(r => r._2 >= 300).map(_._2).sum)
    def sums(d: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = d.agg(count(lit(1)),
        coalesce(sum(col("value")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // identity upsert: all rows of users 0-4 in the touched dates,
    // unchanged (keysSpanDates = false so untouched dates are not probed)
    val upsert = df.filter(col("user_id") < 5 &&
      to_date(col("ts")).cast("string").isin(touched: _*))

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintErr = new java.util.concurrent.atomic.AtomicReference[String](null)
    val maint = new Thread(() => {
      try {
        for (_ <- 1 to 3) {
          TableLayout.compactDatePartitions(spark, dir,
            col(TableLayout.dateCol).cast("string").isin(touched: _*))
          TableLayout.upsertDatePartitions(spark, dir, upsert,
            keyCols = Seq("user_id"), keysSpanDates = false)
        }
      } catch {
        case e: Throwable => maintErr.set(e.toString)
      } finally stop.set(true)
    })

    @volatile var failures = 0
    @volatile var untouchedMisses = 0
    var fullRetries = 0
    val readers = (0 until 2).map(_ => new Thread(() => {
      while (!stop.get()) {
        var ok = false
        var att = 0
        while (!ok && att < 8) {
          val got = try Some(sums(TableLayout.readDatePartitioned(spark, dir)))
          catch { case scala.util.control.NonFatal(_) => None }
          if (got.contains(expectAll)) ok = true
          else { att += 1; fullRetries += 1 }
        }
        if (!ok) failures += 1
        val u = try Some(sums(spark.read.option("basePath", dir)
          .parquet(untouchedPaths: _*)))
        catch { case scala.util.control.NonFatal(_) => None }
        if (!u.contains(expectUntouched)) untouchedMisses += 1
      }
    }))
    maint.start(); readers.foreach(_.start())
    maint.join(); readers.foreach(_.join())
    assert(maintErr.get() == null, s"maintenance failed: ${maintErr.get()}")
    assert(failures == 0, s"$failures full-table reads never converged")
    assert(untouchedMisses == 0,
      "a reader of untouched partition dirs was disturbed by maintenance")
    // final state content-preserved exactly
    assert(sums(spark.read.parquet(dir)) == expectAll)
  }

  test("ANN lifecycle under concurrent load: two REAL-policy retrains " +
    "fire and swap while a serve-verify loop races every phase and " +
    "query threads hammer the session — zero mixed results, zero " +
    "reader failures, zero query errors") {
    val work = Files.createTempDirectory("interleave_ann").toString
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    // background query load (CI-sized stand-in for the bench's 8-thread
    // full registry): two threads cycling real corpus aggregations
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val queryErrs = new java.util.concurrent.atomic.AtomicLong(0)
    val queryOk = new java.util.concurrent.atomic.AtomicLong(0)
    val load = (0 until 2).map(i => new Thread(() => {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      while (!stop.get()) {
        try {
          docs.groupBy(col("source")).agg(sum(col("n_chars"))).count()
          queryOk.incrementAndGet()
        } catch {
          case scala.util.control.NonFatal(_) => queryErrs.incrementAndGet()
        }
      }
    }, s"query-load-$i"))
    load.foreach(_.start())

    val stats = try
      graft.similarity.AnnLifecycleLoad.run(spark, work, emb,
        targetSwaps = 2)
    finally { stop.set(true); load.foreach(_.join()) }

    info(stats.json)
    assert(stats.error.isEmpty, s"lifecycle failed: ${stats.error}")
    assert(stats.swapsFired >= 2, s"expected >= 2 retrains: $stats")
    // compaction runs with the default reader horizon (serves race every
    // phase): pass k reclaims live(k-1), so N swaps land N-1 reclaims —
    // live(N) stays until a quiescent pass or the next swap's compaction
    assert(stats.compactions >= stats.swapsFired - 1,
      s"horizon-lagged compaction must reclaim superseded generations: $stats")
    assert(stats.mixed == 0, s"mixed-model serve results: $stats")
    assert(stats.serveErrors == 0, s"serve exceptions under load: $stats")
    assert(stats.servesValidated > 0,
      s"the verify loop must land validated serves: $stats")
    assert(queryErrs.get() == 0 && queryOk.get() > 0,
      s"background queries: ok=${queryOk.get()} errs=${queryErrs.get()}")
  }
}
