package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Residual-vs-absolute IVF-PQ ladder — the r19 verdict's ask #3 receipt:
 * the recall ladder showed the ABSOLUTE-encoding IVF-PQ plateauing at
 * the plain-IVF ceiling at production width, because PQ spent its codes
 * re-describing the cell layout the coarse quantizer already captured.
 * This drill measures, on the [[AnnRecallFrontier.mixture]] corpus
 * (hash-placed Gaussian-ish clusters whose spread rivals the center
 * scale — true neighbors straddle Voronoi boundaries), at EQUAL
 * (cells, probes, m, k):
 *
 *  - mean PQ reconstruction error, absolute vs residual — the direct
 *    evidence of where the codebook's resolution goes;
 *  - recall@5 vs brute force for the absolute ([[Similarity.ivfPqTopK]])
 *    and residual ([[Similarity.ivfPqResidualTopK]]) searches, and for
 *    both exact-rerank refinements at rerankDepth = 4·k;
 *  - the serving plan's max generated-method bytecode size (the
 *    knob-widening JIT rule — r12 cliff).
 *
 * One JSON line per (cells, probe, form).
 *
 *   SPARK_GRAFT_ANN_N=32000 sbt "runMain graft.ResidualPqLadder"
 */
object ResidualPqLadder {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "32000").toLong
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_ANN_CLUSTERS", "256").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = AnnRecallFrontier.mixture(spark, n, dim = 64, nClusters)
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

    for (nCells <- Seq(64, 256)) {
      val cents = Similarity.ivfCells(emb, nCells)
      // both forms share the SAME coarse quantizer — the comparison is
      // purely about what the PQ codebook encodes
      val (tFlatCb, flatCb) = timed(Similarity.codebook(emb))
      val (tResCb, resCb) = timed(
        Similarity.residualCodebook(emb, nCells = nCells, cells = Some(cents)))
      val flatCodes = Similarity.productQuantize(emb, codebook = Some(flatCb))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val resCodes = Similarity.productQuantizeResidual(emb,
          nCells = nCells, codebook = Some(resCb), cells = Some(cents))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Materialize both persisted codes frames BEFORE the probe loop
      // (ADVICE r20 #4): serve_sec must time serving only, never the
      // first-touch cache build of the corpus codes. (The recon-error
      // aggs below would also materialize them; the explicit count makes
      // the measurement contract visible rather than incidental.)
      flatCodes.count(); resCodes.count()
      val flatErr = flatCodes.agg(avg(col("recon_error"))).first().getDouble(0)
      val resErr = resCodes.agg(avg(col("recon_error"))).first().getDouble(0)
      for (nProbe <- Seq(2, 4, 8, 16).filter(_ <= nCells)) {
        def audit(name: String, df: org.apache.spark.sql.DataFrame,
                  err: Double, trainSec: Double): Unit = {
          val (tServe, _) = timed(df.collect().length)
          val r = Similarity.recallAudit(df, brute, 5)
            .agg(avg(col("recall_at_k"))).collect()(0)
          val recall = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
          val maxCode = CodegenAudit.maxMethodCodeSize(
            df.queryExecution.executedPlan)
          println(f"""{"metric":"residual_pq_ladder","n":$n,""" +
            f""""clusters":$nClusters,"cells":$nCells,"probe":$nProbe,""" +
            f""""form":"$name","mean_recon_error":$err%.4f,""" +
            f""""codebook_train_sec":$trainSec%.2f,""" +
            f""""serve_sec":$tServe%.2f,"recall_at_5":$recall%.3f,""" +
            f""""max_method_bytecodes":$maxCode,""" +
            f""""over_jit_ceiling":${if (maxCode > 8000) 1 else 0}}""")
        }
        audit("flat", Similarity.ivfPqTopK(emb, nQ, 5, nCells, nProbe,
          sharedCodes = Some(flatCodes), codebook = Some(flatCb),
          cells = Some(cents)), flatErr, tFlatCb)
        audit("residual", Similarity.ivfPqResidualTopK(emb, nQ, 5, nCells,
          nProbe, sharedCodes = Some(resCodes), codebook = Some(resCb),
          cells = Some(cents)), resErr, tResCb)
        audit("flat_rerank", Similarity.ivfPqTopKRefined(emb, nQ, 5,
          rerankDepth = 20, nCells, nProbe, sharedCodes = Some(flatCodes),
          codebook = Some(flatCb), cells = Some(cents)), flatErr, tFlatCb)
        audit("residual_rerank", Similarity.ivfPqResidualTopKRefined(emb,
          nQ, 5, rerankDepth = 20, nCells, nProbe,
          sharedCodes = Some(resCodes), codebook = Some(resCb),
          cells = Some(cents)), resErr, tResCb)
      }
      flatCodes.unpersist(); resCodes.unpersist()
    }
    spark.stop()
  }
}
