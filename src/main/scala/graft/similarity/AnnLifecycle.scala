package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Drift-triggered ANN index lifecycle — the operating component the
 * r15 `graft.AnnStaleness` ladder measured but left manual: a VERSIONED
 * serving store whose index generations are immutable and whose current
 * version flips through one atomic manifest rename, plus the retrain
 * controller that watches the drift monitor and publishes the next
 * generation when the measured policy fires.
 *
 * Store layout under `dir`:
 * {{{
 *   <dir>/v<N>/centroids/          parquet (cell, centroid, nrm)
 *   <dir>/v<N>/layout/cell=<c>/…   full reassignment snapshot
 *                                  (vec_id, v, nrm) under v<N>'s cells
 *   <dir>/live/cell=<c>/…          streaming arrivals, every row
 *                                  STAMPED model_version = the
 *                                  generation whose centroids assigned
 *                                  it (ONE dir + ONE sink metadata log
 *                                  + ONE source checkpoint across all
 *                                  generations — the file sink's batch
 *                                  ids continue from the checkpoint, so
 *                                  a per-generation output dir would
 *                                  hole its metadata log)
 *   <dir>/MANIFEST                 current version, written tmp +
 *                                  ATOMIC_MOVE
 * }}}
 *
 * Serving invariant — "never a mix": a query resolves the manifest
 * ONCE, then reads `v<N>/layout ∪ live WHERE model_version = N` — every
 * candidate row assigned under v<N>'s centroids. Version directories
 * are never rewritten after publish and the version filter partitions
 * the live rows disjointly, so a swap concurrent with a running query
 * cannot splice two models into one result (StreamingAnnIngestSpec
 * races a publish against a serve loop and asserts every observed
 * result row-equals exactly one generation's expected output).
 *
 * Swap protocol (the caller owns the ingest query because Structured
 * Streaming plans freeze model literals at build — a running query
 * cannot change centroids, and a stateless assignment job restarts in
 * one trigger):
 *
 *  1. stop ingest generation N and drain its in-flight microbatch
 *     (offsets-only checkpoint — nothing else to recover);
 *  2. [[maybeRetrainSwap]]: monitor fires → freeze new centroids over
 *     snapshot<N> ∪ live(N), write `v<N+1>` (reassign EVERYTHING — the
 *     bounded full-rebuild the staleness ladder timed at ≤ 2.1 s on a
 *     4× corpus), flip MANIFEST;
 *  3. restart ingest as generation N+1 against the SAME source
 *     checkpoint and the SAME live dir (offsets and sink batch ids
 *     continue — rows already landed are not re-read; they serve from
 *     v<N+1>'s snapshot, while their old version-stamped live copies go
 *     dead and are reclaimed by the next live-dir compaction, the
 *     [[graft.sources.TableLayout.mergeCellSegments]]
 *     rebuild-and-repoint discipline).
 *
 * At 100 TB the same shape holds: the snapshot write is one
 * partitioned pass over the corpus (executor-parallel, nothing
 * corpus-sized near the driver — centroids are the only collect), the
 * manifest flip is O(1), and old generations are dropped asynchronously
 * once their readers finish.
 *
 * Reference scope: the reference engine has no vector serving at all —
 * this is part of the LLM-pipeline extension surface; the policy
 * numbers (z threshold, share budget) come from the measured
 * AnnStaleness table (BASELINE.md r15: the monitor reads z ≈ 4.2 from
 * the first genuinely-shifted batch vs < 1.4 on a same-distribution
 * split; new-query recall decays to ~0.8 frozen vs 1.0 retrained).
 */
object AnnLifecycle {

  /** One published generation's receipt. */
  final case class PublishInfo(version: Int, nVectors: Long,
                               publishSec: Double)

  /** One controller evaluation: the monitor reading, the share of
    * arrived vectors, whether the measured policy fired, and the
    * publish receipt when it did. */
  final case class Decision(driftZ: Double, newShare: Double,
                            fired: Boolean, published: Option[PublishInfo])

  private def manifestPath(dir: String): Path = Paths.get(dir, "MANIFEST")

  /** Current serving version, or None before the first publish. */
  def currentVersion(dir: String): Option[Int] = {
    val p = manifestPath(dir)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toInt)
    else None
  }

  /** Atomic manifest flip: readers see either the old version or the
    * new one, never a torn read (write-to-temp + ATOMIC_MOVE on the
    * same filesystem). */
  private def flipManifest(dir: String, version: Int): Unit = {
    val tmp = Paths.get(dir, s".MANIFEST.tmp.$version")
    Files.createDirectories(Paths.get(dir))
    Files.write(tmp, version.toString.getBytes)
    Files.move(tmp, manifestPath(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /**
   * Publish generation `version`: write the centroid table and the full
   * corpus reassignment under those centroids into the IMMUTABLE
   * `v<version>/` tree, then flip the manifest. `corpus` must be the
   * complete (vec_id, embedding) set this generation serves (previous
   * snapshot ∪ everything arrived); one partitioned write, centroid
   * literals the only driver value.
   */
  def publish(spark: SparkSession, dir: String, version: Int,
              cells: Array[(Long, Seq[Double], Double)],
              corpus: DataFrame): PublishInfo = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val vdir = s"$dir/v$version"
    cells.toSeq.toDF("cell", "centroid", "nrm")
      .coalesce(1).write.mode("overwrite").parquet(s"$vdir/centroids")
    Similarity.ivfCellAssignmentsWith(corpus, cells)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$vdir/layout")
    val n = spark.read.parquet(s"$vdir/layout").count()
    flipManifest(dir, version)
    PublishInfo(version, n, (System.nanoTime() - t0) / 1e9)
  }

  /** The frozen centroids of a published generation. */
  def loadCells(spark: SparkSession, dir: String,
                version: Int): Array[(Long, Seq[Double], Double)] =
    spark.read.parquet(s"$dir/v$version/centroids")
      .collect()
      .map(r => (r.getAs[Long]("cell"),
        r.getAs[scala.collection.Seq[Double]]("centroid").toSeq,
        r.getAs[Double]("nrm")))
      .sortBy(_._1)

  /** The shared live-arrivals dir (version-stamped rows). */
  def liveDir(dir: String): String = s"$dir/live"

  /** Live rows (vec_id, v, nrm, cell, model_version), or None before
    * the first sink commit (a streaming parquet dir does not exist
    * until then). */
  private def liveFrame(spark: SparkSession, dir: String)
      : Option[DataFrame] = {
    val d = liveDir(dir)
    val hasData = Files.exists(Paths.get(d)) && {
      val s = Files.list(Paths.get(d))
      try s.anyMatch(p => !p.getFileName.toString.startsWith("_"))
      finally s.close()
    }
    if (hasData) Some(spark.read.parquet(d)) else None
  }

  /** Generation `version`'s arrived vectors as (vec_id, embedding) —
    * empty when nothing landed under that generation yet. */
  def liveVectors(spark: SparkSession, dir: String,
                  version: Int): DataFrame =
    liveFrame(spark, dir) match {
      case Some(l) => l.filter(col("model_version") === version)
        .select(col("vec_id"), col("v").as("embedding"))
      case None =>
        spark.range(0).select(col("id").as("vec_id"),
          lit(Array.empty[Double]).as("embedding")).filter(lit(false))
    }

  /**
   * The serving read of one consistent generation: manifest resolved
   * ONCE, then `v<N>/layout ∪ live WHERE model_version = N` — every
   * candidate row assigned under the same frozen centroids. Returns
   * (version, topK frame). `queries` needs (vec_id, embedding) with
   * query ids < nQueries (the probe contract of
   * [[Similarity.ivfHashTopKPruned]]).
   */
  def serveTopK(spark: SparkSession, dir: String, queries: DataFrame,
                nQueries: Int, k: Int, nCells: Int,
                nProbe: Int): (Int, DataFrame) = {
    val v = currentVersion(dir).getOrElse(
      sys.error(s"no published index under $dir"))
    (v, serveTopKAt(spark, dir, v, queries, nQueries, k, nCells, nProbe))
  }

  /** [[serveTopK]] pinned to an explicit generation — the immutable
    * read the drill uses to compute per-version expected results after
    * a concurrent swap (a generation's snapshot never changes; its live
    * slice only grows while that generation's ingest is running, which
    * the swap protocol stops first). */
  def serveTopKAt(spark: SparkSession, dir: String, version: Int,
                  queries: DataFrame, nQueries: Int, k: Int, nCells: Int,
                  nProbe: Int): DataFrame = {
    val snapshot = spark.read.parquet(s"$dir/v$version/layout")
      .select(col("vec_id"), col("v"), col("nrm"),
        col("cell").cast("int").as("cell"))
    val layout = liveFrame(spark, dir) match {
      case Some(l) => snapshot.unionByName(
        l.filter(col("model_version") === version)
          .select(col("vec_id"), col("v"), col("nrm"),
            col("cell").cast("int").as("cell")))
      case None => snapshot
    }
    Similarity.ivfHashTopKPruned(queries, layout, nQueries, k,
      nCells = nCells, nProbe = nProbe,
      cells = Some(loadCells(spark, dir, version)))
  }

  /**
   * The retrain controller — one evaluation of the measured policy:
   * read the current generation's arrivals, compute the drift monitor's
   * max per-dim mean-shift z (snapshot corpus vs arrivals) and the
   * arrived share, and when BOTH clear their thresholds (the
   * AnnStaleness policy: the monitor alone fires from the first shifted
   * batch; the share budget keeps a handful of outliers from forcing a
   * rebuild), retrain over snapshot ∪ arrived and [[publish]] the next
   * generation. Two bounded collects (centroid freeze) + one
   * partitioned write; the caller then restarts the ingest job as the
   * next generation (see the swap protocol above).
   */
  def maybeRetrainSwap(spark: SparkSession, dir: String,
                       nCells: Int, zThreshold: Double = 3.0,
                       shareBudget: Double = 0.25,
                       ivfSalt: String = "ivf"): Decision = {
    val v = currentVersion(dir).getOrElse(
      sys.error(s"no published index under $dir"))
    val arrived = liveVectors(spark, dir, v)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nA = arrived.count()
      if (nA == 0) return Decision(0.0, 0.0, fired = false, None)
      val snap = spark.read.parquet(s"$dir/v$v/layout")
        .select(col("vec_id"), col("v").as("embedding"))
      val nB = snap.count()
      val share = nA.toDouble / math.max(nB, 1L)
      val combined = snap.withColumn("__new", lit(false))
        .unionByName(arrived.withColumn("__new", lit(true)))
      val z = Similarity.embeddingDrift(combined, col("__new"))
        .agg(max(col("mean_shift_z"))).collect()(0).getDouble(0)
      val fired = z > zThreshold && share > shareBudget
      if (!fired) return Decision(z, share, fired = false, None)
      val cells = Similarity.freezeAnnIndex(
          combined.select(col("vec_id"), col("embedding")), nCells,
          ivfSalt)
        .getOrElse(sys.error("combined corpus too small to retrain"))
        .cells.toArray
      val info = publish(spark, dir, v + 1, cells,
        combined.select(col("vec_id"), col("embedding")))
      Decision(z, share, fired = true, Some(info))
    } finally arrived.unpersist()
  }

  /**
   * Ingest generation N: arrivals from `topic` (JSON-lines
   * (vec_id, embedding)) assigned under generation N's frozen centroids
   * (plan literals — stateless projection), STAMPED
   * `model_version = N`, and landed cell-partitioned into the shared
   * live dir. Reuse ONE `checkpoint` across generations: the
   * file-source offsets and the sink's metadata-log batch ids continue,
   * so rows drained under generation N are never re-read by generation
   * N+1 (they arrive there through v<N+1>'s snapshot instead).
   */
  def runIngestGeneration(spark: SparkSession, dir: String, version: Int,
                          topic: String, checkpoint: String,
                          dim: Int = 64,
                          maxFilesPerTrigger: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(topic)
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull &&
        size(col("embedding")) === dim)
    val cells = loadCells(spark, dir, version)
    graft.sources.TableLayout.streamToCellPartitioned(
      Similarity.ivfCellAssignmentsWith(raw, cells)
        .withColumn("model_version", lit(version)),
      liveDir(dir), checkpoint)
  }
}
