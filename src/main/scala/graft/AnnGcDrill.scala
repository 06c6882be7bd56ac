package graft

import graft.similarity.{AnnLifecycle, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/**
 * Measured receipt for the lifecycle GC (r16 verdict ask #1): serve
 * cost against the LIVE side must stay FLAT across generations under
 * the `(model_version, cell)` layout + [[AnnLifecycle.compactLive]],
 * where the r16 cell-only layout re-scans every elapsed generation's
 * dead rows on every serve, forever.
 *
 * Two arms over identical feeds, G generations each (publish v1 on the
 * base corpus, then per generation: ingest 2×-base shifted arrivals,
 * measure a serve, force the retrain+swap):
 *
 *  - `gc`: the production layout — live partitioned
 *    `(model_version, cell)`, compactLive after every swap;
 *  - `legacy`: the pre-r17 contrast — live partitioned `cell` only,
 *    model_version a data column, no compaction possible (dead rows
 *    are interleaved with live ones inside each cell directory, so
 *    nothing short of a full rewrite could reclaim them).
 *
 * The snapshot side grows identically in both arms (each swap folds the
 * arrivals into the next snapshot — real corpus growth, not GC's
 * concern); the receipt columns that matter are the LIVE-side scan
 * (files, bytes — off the executed plan's scan metrics, the same
 * listing-level evidence as the IvfWidthLadder) and live bytes on disk.
 * Expected shape: `gc` live_files/live_bytes/live_disk flat at one
 * generation's arrivals; `legacy` grows ~linearly with the generation
 * number. One JSON line per (arm, generation).
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnGcDrill"
 */
object AnnGcDrill {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "64").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_ANN_PROBE", "8").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "32").toInt
    val gens = sys.env.getOrElse("SPARK_GRAFT_ANN_GENS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBase = base.count()

    def diskBytes(dir: String): Long =
      if (!Files.isDirectory(Paths.get(dir))) 0L
      else {
        val s = Files.walk(Paths.get(dir))
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(p => p.toString.endsWith(".parquet"))
          .map(Files.size).sum
        finally s.close()
      }

    // (files, bytes) per source off the executed plan — split live vs
    // snapshot by root path, the listing-level receipt
    def scanMetrics(df: org.apache.spark.sql.DataFrame)
        : (Long, Long, Long, Long) = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val through = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case other => other.children
        }
        p +: through.flatMap(walk)
      }
      val scans = walk(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f }
      def of(pred: String => Boolean, k: String) = scans
        .filter(_.relation.location.rootPaths.exists(p => pred(p.toString)))
        .map(_.metrics.get(k).map(_.value).getOrElse(0L)).sum
      (of(_.contains("/live"), "numFiles"), of(_.contains("/live"), "filesSize"),
        of(_.contains("/layout"), "numFiles"), of(_.contains("/layout"), "filesSize"))
    }

    Seq(false, true).foreach { legacy =>
      val arm = if (legacy) "legacy" else "gc"
      val work = Files.createTempDirectory(s"graft-ann-gc-$arm").toString
      val (dir, topic, ck) = (s"$work/index", s"$work/topic", s"$work/ck")
      Files.createDirectories(Paths.get(topic))
      val cells1 = Similarity.freezeAnnIndex(base, nCells).get.cells.toArray
      AnnLifecycle.publish(spark, dir, 1, cells1, base)

      (1 to gens).foreach { g =>
        // generation g's arrivals: disjoint id range, shifted distribution
        val arrivals = AnnStaleness.freshShifted(spark, 2 * nBase)
          .select((col("vec_id") + lit(g * 10000000L)).as("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val lines = graft.streaming.JsonStreams.encode(arrivals)
          .collect().map(_.getString(0))
        Files.write(Paths.get(s"$topic/b$g.json"),
          String.join("\n", lines: _*).getBytes)
        val ingest = AnnLifecycle.runIngestGeneration(spark, dir, g, topic,
          ck, legacyCellOnlyLive = legacy)
        try ingest.processAllAvailable() finally ingest.stop()

        // measure: one warm serve, then the timed one
        def serve() = AnnLifecycle.serveTopK(spark, dir, base, nQ, 5,
          nCells, nProbe)._2
        serve().collect()
        val t0 = System.nanoTime()
        val df = serve()
        val n = df.collect().length
        val serveSec = (System.nanoTime() - t0) / 1e9
        val (lf, lb, sf, sb) = scanMetrics(df)
        val snapRows = spark.read.parquet(s"$dir/v$g/layout").count()
        println(f"""{"metric":"ann_gc","arm":"$arm","gen":$g,""" +
          f""""result_rows":$n,"snapshot_rows":$snapRows,""" +
          f""""serve_sec":$serveSec%.3f,""" +
          f""""live_files_scanned":$lf,"live_bytes_scanned":$lb,""" +
          f""""snap_files_scanned":$sf,"snap_bytes_scanned":$sb,""" +
          f""""live_disk_bytes":${diskBytes(s"$dir/live")}}""")

        if (g < gens) {
          val d = AnnLifecycle.maybeRetrainSwap(spark, dir, nCells,
            zThreshold = -1.0, shareBudget = 0.0)
          require(d.fired && d.published.exists(_.version == g + 1),
            s"swap $g->${g + 1} did not fire: $d")
          if (!legacy) {
            // readerHorizon = 0: this drill is QUIESCENT at this point
            // (ingest stopped, the measured serve already collected, no
            // concurrent reader exists), so immediate reclaim is safe
            // and keeps the per-generation receipts comparable; a store
            // with serves in flight uses the default horizon instead
            val reclaimed = AnnLifecycle.compactLive(dir, readerHorizon = 0)
            require(reclaimed == Seq(g), s"expected to reclaim gen $g: $reclaimed")
            // bound the version-tree count too: keep current + 1 pinned
            AnnLifecycle.pruneGenerations(dir, keep = 2)
          }
        }
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    }
    spark.stop()
  }
}
