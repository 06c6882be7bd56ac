package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Production-width ANN recall FRONTIER on a non-degenerate corpus —
 * the r16 verdict's ask #3: the IvfWidthLadder's recall column was
 * self-admittedly degenerate (its K-amplified corpus's true neighbors
 * are scaled copies that share a cell, so recall@5 ≡ 1.0 at every
 * width measures cell-coherence, not a frontier). This drill generates
 * a Gaussian-mixture corpus at the same 128 k scale whose cluster
 * spread is comparable to the inter-center distance — true neighbors
 * genuinely straddle Voronoi boundaries — and measures recall@5
 * against brute force across the full knob lattice:
 *
 *  - nCells ∈ {64, 256, 1024} (the width ladder's production rungs);
 *  - init ∈ sampled (rounds = 0, the hash LIMIT-k draw), trained-hash
 *    (2 Lloyd rounds over the hash init) and trained-d2 (2 rounds over
 *    the deterministic farthest-first D² seeding);
 *  - nProbe ∈ {1, 2, 4, 8, 16} — probe fractions from 0.1% to 25%.
 *
 * Honest bounds carried in the receipt: the Lloyd training sample is
 * [[Similarity.PqTrainMaxRows]] = 4096 rows (4 rows/cell at width
 * 1024) and the D² candidate pool is [[Similarity.D2PoolRows]] = 1024
 * (at width 1024 the D² init IS the pool — seeding degenerates to the
 * hash sample's superset), so init quality differences are expected to
 * compress as width approaches the pool size. The serving plan's max
 * generated-method bytecode size is audited per width — the
 * knob-widening JIT rule (r12 cliff).
 *
 * One JSON line per (cells, init, probe).
 *
 *   sbt "runMain graft.AnnRecallFrontier"
 *
 * `SPARK_GRAFT_ANN_AUTO=1` runs the AUTO-WIDTH arm instead of the
 * explicit lattice (r18): `ivfCells(emb, AutoCells)` — width from
 * [[Similarity.scaledCells]], Lloyd sample grown to 8 rows/cell — so
 * the policy's chosen rung gets the same recall/train-cost/codegen
 * receipt as the hand-picked widths. Run it at n = 128 000 (the rung
 * the frontier recommended) and at an n that reaches the 4096 cap.
 */
object AnnRecallFrontier {

  /** Deterministic Gaussian-ish mixture: `nClusters` hash-placed
    * centers, per-vector noise whose scale rivals the center scale —
    * the spread that makes nearest neighbors cross cell boundaries
    * (the AnnStaleness.freshShifted shape, extended to a standalone
    * corpus at arbitrary cluster counts). */
  def mixture(spark: SparkSession, n: Long, dim: Int, nClusters: Int,
              centerScale: Double = 0.6,
              noiseScale: Double = 0.45): org.apache.spark.sql.DataFrame = {
    def unit(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(cols: _*), lit(2001)) - 1000).cast("double") / lit(1000.0)
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (unit(pmod(col("id"), lit(nClusters)), j, lit(23)) * lit(centerScale)
          + unit(col("id"), j, lit(41)) * lit(noiseScale)).cast("float"))
        .as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "128000").toLong
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_ANN_CLUSTERS", "512").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = mixture(spark, n, dim = 64, nClusters = nClusters)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val brute = Similarity.bruteForceTopK(emb, nQueries = nQ, k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    brute.count()

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    if (sys.env.get("SPARK_GRAFT_ANN_AUTO").contains("1")) {
      val width = Similarity.scaledCells(n)
      val (tTrain, cents) = timed(Similarity.ivfCells(emb, Similarity.AutoCells))
      require(cents.length == width,
        s"auto width mismatch: policy $width, trained ${cents.length}")
      val layout = Similarity.ivfCellAssignmentsWith(emb, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      layout.count()
      for (nProbe <- Seq(1, 2, 4, 8, 16).filter(_ <= width)) {
        val approx = Similarity.ivfHashTopKPruned(emb, layout, nQ, 5,
          nCells = width, nProbe = nProbe, cells = Some(cents))
        val (tServe, _) = timed(approx.collect().length)
        val r = Similarity.recallAudit(approx, brute, 5)
          .agg(avg(col("recall_at_k"))).collect()(0)
        val recall = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
        val maxCode = CodegenAudit.maxMethodCodeSize(
          approx.queryExecution.executedPlan)
        println(f"""{"metric":"ann_recall_frontier","n":$n,""" +
          f""""clusters":$nClusters,"cells":$width,"init":"auto",""" +
          f""""probe":$nProbe,""" +
          f""""probe_frac":${nProbe.toDouble / width}%.4f,""" +
          f""""train_sec":$tTrain%.2f,"serve_sec":$tServe%.2f,""" +
          f""""recall_at_5":$recall%.3f,""" +
          f""""max_method_bytecodes":$maxCode,""" +
          f""""over_jit_ceiling":${if (maxCode > 8000) 1 else 0}}""")
      }
      layout.unpersist()
      spark.stop()
      return
    }

    for (nCells <- Seq(64, 256, 1024)) {
      val inits = Seq(
        ("sampled", () => Similarity.ivfCells(emb, nCells, rounds = 0)),
        ("hash", () => Similarity.ivfCells(emb, nCells)),
        ("d2", () => Similarity.ivfCells(emb, nCells, d2Seed = true)))
      for ((init, train) <- inits) {
        val (tTrain, cents) = timed(train())
        val layout = Similarity.ivfCellAssignmentsWith(emb, cents)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        layout.count()
        for (nProbe <- Seq(1, 2, 4, 8, 16).filter(_ <= nCells)) {
          val approx = Similarity.ivfHashTopKPruned(emb, layout, nQ, 5,
            nCells = nCells, nProbe = nProbe, cells = Some(cents))
          val (tServe, _) = timed(approx.collect().length)
          val r = Similarity.recallAudit(approx, brute, 5)
            .agg(avg(col("recall_at_k"))).collect()(0)
          val recall = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
          val maxCode = CodegenAudit.maxMethodCodeSize(
            approx.queryExecution.executedPlan)
          println(f"""{"metric":"ann_recall_frontier","n":$n,""" +
            f""""clusters":$nClusters,"cells":$nCells,"init":"$init",""" +
            f""""probe":$nProbe,""" +
            f""""probe_frac":${nProbe.toDouble / nCells}%.4f,""" +
            f""""train_sec":$tTrain%.2f,"serve_sec":$tServe%.2f,""" +
            f""""recall_at_5":$recall%.3f,""" +
            f""""max_method_bytecodes":$maxCode,""" +
            f""""over_jit_ceiling":${if (maxCode > 8000) 1 else 0}}""")
        }
        layout.unpersist()
      }
    }
    spark.stop()
  }
}
