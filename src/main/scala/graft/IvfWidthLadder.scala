package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * IVF width ladder to production cell counts — the r15 verdict's ask
 * #5: every recall/cost receipt so far tops out at nCells=64, while a
 * 100 TB index runs hundreds-to-thousands of cells at probe fractions
 * ≤ 1–2%. On the K-amplified embeddings corpus (the AnnScaleSmoke
 * generator — fresh ids, per-copy-scaled vectors, cosine structure
 * preserved), for nCells ∈ {64, 256, 1024}:
 *
 *  - train the coarse quantizer and build the cell-partitioned layout
 *    (build cost + file counts — the listing-overhead axis);
 *  - run the pruned top-k at a production-ish probe budget (8/64,
 *    2/256, 8/1024 — the middle rung is the verdict's "≤ 2/256
 *    probes" receipt point) and audit recall@5 against brute force
 *    over the SAME amplified corpus;
 *  - record the probed file/byte fraction (the scale-invariant
 *    pruning receipt) and the max generated-method bytecode size of
 *    the serving plan — the knob-widening JIT-ceiling rule: the r12
 *    cliff came from widening 16 centroids to 64 in a LITERAL lattice;
 *    the packed-centroid graftshim expression must stay flat at 1024.
 *
 * One JSON line per width.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_ANN_K=64 \
 *     sbt "runMain graft.IvfWidthLadder"
 */
object IvfWidthLadder {

  private def amplify(e: org.apache.spark.sql.DataFrame, k: Int) =
    (0 until k).map { i =>
      e.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + lit(i.toFloat * 0.001f))).as("embedding"))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val kAmp = sys.env.getOrElse("SPARK_GRAFT_ANN_K", "64").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = amplify(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")), kAmp)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    // ONE exact ground truth serves every width (32-query brute force
    // over the amplified corpus — the dominant fixed cost)
    val brute = Similarity.bruteForceTopK(emb, nQueries = nQ, k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    brute.count()

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    val work = java.nio.file.Files.createTempDirectory("ivf_width")
    for ((nCells, nProbe) <- Seq((64, 8), (256, 2), (1024, 8))) {
      val (tTrain, cents) = timed {
        Similarity.freezeAnnIndex(emb, nCells).get.cells.toArray
      }
      val dir = s"$work/cells_$nCells"
      val (tBuild, _) = timed {
        Similarity.ivfCellAssignmentsWith(emb, cents)
          .repartition(col("cell"))
          .write.partitionBy("cell").parquet(dir)
      }
      val layout = spark.read.parquet(dir)
      val totalFiles = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try s.toArray.map(_.toString).count(_.endsWith(".parquet"))
        finally s.close()
      }
      val totalBytes = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size).sum
        finally s.close()
      }
      val pruned = Similarity.ivfHashTopKPruned(emb, layout, nQueries = nQ,
        k = 5, nCells = nCells, nProbe = nProbe, cells = Some(cents))
      val (tServe, _) = timed { pruned.collect().length }
      // probed files/bytes off the executed plan's partitioned scan
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
      val scans = walk(pruned.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("cell") => f }
      def metric(k: String) =
        scans.map(_.metrics.get(k).map(_.value).getOrElse(0L)).sum
      val (probedFiles, probedBytes) = (metric("numFiles"), metric("filesSize"))
      val recall = {
        val r = Similarity.recallAudit(pruned, brute, 5)
          .agg(avg(col("recall_at_k"))).collect()(0)
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
      // knob-widening JIT audit on the SERVING plan at this width
      val maxCode = CodegenAudit.maxMethodCodeSize(
        pruned.queryExecution.executedPlan)
      println(f"""{"metric":"ivf_width","cells":$nCells,"probe":$nProbe,""" +
        f""""vectors":$n,"queries":$nQ,"train_sec":$tTrain%.2f,""" +
        f""""build_sec":$tBuild%.2f,"serve_sec":$tServe%.2f,""" +
        f""""recall_at_5":$recall%.3f,""" +
        f""""probed_files":$probedFiles,"total_files":$totalFiles,""" +
        f""""probed_bytes":$probedBytes,"total_bytes":$totalBytes,""" +
        f""""probed_frac":${probedBytes.toDouble / totalBytes}%.4f,""" +
        f""""max_method_bytecodes":$maxCode,""" +
        f""""over_jit_ceiling":${if (maxCode > 8000) 1 else 0}}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(work.toFile)
    spark.stop()
  }
}
