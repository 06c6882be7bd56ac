package graft

import graft.similarity.Similarity
import graft.similarity.Similarity.PqConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * PQ-configuration recall sweep — the measurement harness behind the
 * `ann_recall_audit` defaults: for each candidate (m, k, rerankDepth)
 * it reports mean recall@5 of the IVF+PQ search (raw ADC and exact
 * re-ranked) against brute force, next to the plain-IVF yardstick at
 * the SAME probes (nCells=16, nProbe=4 — the registered operating
 * point). Also times the one-off codebook/assignment build so a
 * config that wins on recall but Janino-compiles for a minute is
 * visible. Usage:
 *
 *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.AnnRecallSweep"
 *
 * Prints one JSON line per config.
 */
object AnnRecallSweep {

  private def meanRecall(approx: DataFrame, brute: DataFrame): Double = {
    val r = Similarity.recallAudit(approx, brute, k = 5)
      .agg(avg(col("recall_at_k"))).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // quantizer width / probe knobs: the registered operating point is
    // (16, 4) — production quantizers are wider with a SMALLER probed
    // fraction, so the ladder also measures e.g. (64, 8) = 12.5% probed
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "16").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_ANN_PROBE", "4").toInt
    // audit-query count for the IVF ladder/probe-curve rows: the
    // registered audit runs 8 queries (recall grain 1/40); 32 shrinks
    // the grain to 1/160 when adjudicating close ladder rows
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "8").toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = embs.count()
    val brute = Similarity.bruteForceTopK(embs, nQueries = nQ, k = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    brute.count()

    // coarse-quantizer training ladder (r13): recall at the env probe
    // point for Lloyd rounds 0 (the pure hash sample, the r7-r12 form)
    // through 3 — the measurement behind IvfTrainRounds' default.
    // r14 adds the seeding axis: hash-sample init vs deterministic
    // k-means++ D² (farthest-first) init at every round count
    for (rounds <- Seq(0, 1, 2, 3); d2 <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val cells = Similarity.ivfCells(embs, nCells = nCells, rounds = rounds,
        d2Seed = d2)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val r = meanRecall(
        Similarity.ivfHashTopK(embs, nQ, 5, nCells = nCells, nProbe = nProbe,
          cells = Some(cells)),
        brute)
      println(s"""{"sf_dir":"$sfDir","rows":$n,"cells":$nCells,"probe":$nProbe,"queries":$nQ,"method":"ivf","rounds":$rounds,"seed":"${if (d2) "d2" else "hash"}","train_sec":${math.rint(tTrain * 100) / 100},"recall":$r}""")
    }

    // probe-width cost/recall curve (r13; r14 adds the D²-seeded
    // registered config): nProbe in {4, 8, 16, 32} (capped at nCells) x
    // {sampled, trained, d2+1-round} quantizer — recall next to the
    // measured per-query seconds, so the registered defaults and a
    // user's knob choice are justified by data
    for ((rounds, d2) <- Seq((0, false), (Similarity.IvfTrainRounds, false),
                             (1, true))) {
      // train once per quantizer — the quantizer is probe-independent
      val cells = Similarity.ivfCells(embs, nCells = nCells, rounds = rounds,
        d2Seed = d2)
      for (p <- Seq(4, 8, 16, 32).filter(_ <= nCells)) {
      val q = Similarity.ivfHashTopK(embs, nQ, 5, nCells = nCells, nProbe = p,
        cells = Some(cells))
      q.count() // warm codegen/caches so the timed rep measures the scan
      val t0 = System.nanoTime()
      val r = meanRecall(q, brute)
      val tQ = (System.nanoTime() - t0) / 1e9
      println(s"""{"sf_dir":"$sfDir","rows":$n,"cells":$nCells,"queries":$nQ,"method":"ivf_probe_curve","rounds":$rounds,"seed":"${if (d2) "d2" else "hash"}","probe":$p,"recall":$r,"query_sec":${math.rint(tQ * 1000) / 1000}}""")
    } }

    val rIvf = meanRecall(
      Similarity.ivfHashTopK(embs, nQ, 5, nCells = nCells, nProbe = nProbe),
      brute)
    println(s"""{"sf_dir":"$sfDir","rows":$n,"cells":$nCells,"probe":$nProbe,"queries":$nQ,"method":"ivf","recall":$rIvf}""")

    // rounds = 0 pins the SAMPLED codebook rows: under the r12 default
    // (rounds = 2) these configs would silently train and the ladder's
    // sampled-vs-trained comparison would measure nothing
    val cfgs = Seq(
      PqConfig(m = 4, k = 16, rounds = 0), PqConfig(m = 8, k = 16, rounds = 0),
      PqConfig(m = 4, k = 64, rounds = 0), PqConfig(m = 8, k = 64, rounds = 0),
      PqConfig(m = 8, k = 128, rounds = 0), PqConfig(m = 8, k = 256, rounds = 0))
    for (cfg <- cfgs if cfg.k <= n) {
      val t0 = System.nanoTime()
      val codes = graft.queries.SharedFrames.memo(
        spark, sfDir, s"sweep_pq_m${cfg.m}_k${cfg.k}") {
        Similarity.productQuantize(embs, cfg)
      }
      codes.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val raw = meanRecall(
        Similarity.ivfPqTopK(embs, nQ, 5, nCells = nCells, nProbe = nProbe,
          cfg = cfg, sharedCodes = Some(codes)),
        brute)
      val refined = Seq(25, 50, 100).map { d =>
        d -> meanRecall(Similarity.ivfPqTopKRefined(embs, nQ, 5,
          rerankDepth = d, nCells = nCells, nProbe = nProbe, cfg = cfg,
          sharedCodes = Some(codes)), brute)
      }
      val rj = refined.map { case (d, r) => s""""rerank$d":$r""" }.mkString(",")
      println(s"""{"sf_dir":"$sfDir","rows":$n,"queries":$nQ,"method":"ivfpq","m":${cfg.m},"k":${cfg.k},"build_sec":${math.rint(tBuild * 100) / 100},"raw":$raw,$rj}""")
    }
    // Lloyd-trained codebooks at the candidate configs/round counts;
    // r14 adds the D²-seeded init variant at each point
    for (cfg <- Seq(Similarity.PqConfig(m = 8, k = 32),
                    Similarity.PqConfig(m = 8, k = 64),
                    Similarity.PqConfig(m = 8, k = 128),
                    Similarity.PqConfig(m = 8, k = 32, d2Seed = true),
                    Similarity.PqConfig(m = 8, k = 64, d2Seed = true),
                    Similarity.PqConfig(m = 8, k = 128, d2Seed = true))
           if cfg.k <= n;
         rounds <- Seq(1, 2, 3)) {
      val seed = if (cfg.d2Seed) "d2" else "hash"
      val t0 = System.nanoTime()
      val cb = Similarity.trainPqCodebook(embs, cfg, rounds = rounds)
      val codes = graft.queries.SharedFrames.memo(
        spark, sfDir, s"sweep_pqt_m${cfg.m}_k${cfg.k}_r${rounds}_$seed") {
        Similarity.productQuantizeWith(embs, cb, cfg)
      }
      codes.count()
      val tBuild = (System.nanoTime() - t0) / 1e9
      val raw = meanRecall(
        Similarity.ivfPqTopK(embs, nQ, 5, nCells = nCells, nProbe = nProbe,
          cfg = cfg, sharedCodes = Some(codes), codebook = Some(cb)), brute)
      val refined = Seq(25, 50, 100).map { d =>
        d -> meanRecall(Similarity.ivfPqTopKRefined(embs, nQ, 5,
          rerankDepth = d, nCells = nCells, nProbe = nProbe, cfg = cfg,
          sharedCodes = Some(codes), codebook = Some(cb)), brute)
      }
      val rj = refined.map { case (d, r) => s""""rerank$d":$r""" }.mkString(",")
      println(s"""{"sf_dir":"$sfDir","rows":$n,"queries":$nQ,"method":"ivfpq_trained","m":${cfg.m},"k":${cfg.k},"rounds":$rounds,"seed":"$seed","build_sec":${math.rint(tBuild * 100) / 100},"raw":$raw,$rj}""")
    }
    spark.stop()
  }
}
