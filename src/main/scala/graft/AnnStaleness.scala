package graft

import graft.similarity.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ANN index-staleness ladder — the r14 verdict's retrain-policy receipt:
 * how fast does recall decay as NEW vectors from a SHIFTED distribution
 * pour into a FROZEN coarse quantizer (the live-ingest reality:
 * assignments are stateless projections against centroids trained on
 * yesterday's corpus), and how much does retraining recover?
 *
 * For fractionNew ∈ {0, 0.5, 1, 2, 4}× the base corpus:
 *  - fresh vectors come from a GENUINELY new distribution: 8
 *    hash-generated clusters in a region the base corpus does not
 *    occupy, every center carrying a +0.35 mean shift on the first 16
 *    dims (exactly the axis the registered `embedding_drift` monitor
 *    measures) — see [[freshShifted]], including why a copy-and-nudge
 *    generator would measure the OPPOSITE effect;
 *  - the STALE index assigns base+fresh under the centroids frozen on
 *    the base corpus alone, and recall@5 is audited against brute force
 *    over the combined corpus for two query populations: old-
 *    distribution queries (base vectors) and new-distribution queries
 *    (fresh vectors — the users the drifted corpus actually serves);
 *  - the RETRAINED index re-derives centroids from the combined corpus
 *    and re-assigns (the full-rebuild maintenance pass; the LSM merge
 *    keeps serving between retrains but cannot move recall — it
 *    relocates files, not assignments), and recall is audited again.
 *
 * The drift monitor's reading (max per-dim mean_shift_z) is printed
 * beside each rung — it detects the SHIFT from the first fresh batch
 * (the statistic is fraction-independent), while decay grows with the
 * fraction: the measured retrain trigger is therefore
 * "monitor fired AND fraction-new exceeded the decay budget", with this
 * table supplying the budget. SimilaritySpec pins the recovery
 * inequality (recall-after-retrain ≥ recall-before-ingest) at the
 * registered knobs.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnStaleness"
 */
object AnnStaleness {

  /** Deterministic fresh vectors from a GENUINELY new distribution:
    * `nClusters` hash-generated cluster centers living in a region the
    * base corpus does not occupy (every center carries a +`delta` mean
    * shift on the first 16 dims — the exact axis the registered
    * `embedding_drift` monitor reads), each fresh vector = its cluster's
    * center + per-(id, dim) hash noise. The new distribution has real
    * neighbor structure (top-k of a fresh query is its cluster mates),
    * but the FROZEN quantizer has no centroids there — new clusters
    * scatter across stale Voronoi cells, which is precisely what makes
    * a fixed-probe search miss and what retraining repairs. (A naive
    * "copy base and nudge" generator measures the OPPOSITE: each
    * query's neighbors become its own near-copies in its own cell and
    * recall goes UP with staleness — tried and discarded, r15.) */
  def freshShifted(spark: SparkSession, n: Long, dim: Int = 64,
                   delta: Double = 0.35, nClusters: Int = 8,
                   dimOffset: Int = 0): DataFrame = {
    def unit(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(cols: _*), lit(2001)) - 1000).cast("double") / lit(1000.0)
    // dimOffset moves the shifted 16-dim band: a MULTI-generation drill
    // (AnnLifecycleLoad) shifts a FRESH band each generation — once a
    // generation's drift is absorbed into the snapshot, re-shifting the
    // same band reads as mixture variance, not mean shift, and the
    // monitor's z collapses (measured: z 4.2 -> 1.4 at generation 2)
    spark.range(n).select(
      (col("id") + lit(100000000L)).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        (unit(pmod(col("id"), lit(nClusters)), j, lit(11)) * lit(0.6)
          + when(j >= dimOffset && j < dimOffset + 16, lit(delta))
            .otherwise(lit(0.0))
          + unit(col("id"), j, lit(7)) * lit(0.45)).cast("float"))
        .as("embedding"))
  }

  /** Mean recall@5 over `corpus` (queries = vec_id < nQ): assignments
    * AND probes both under the EXPLICIT centroid array (frozen or
    * retrained — the serving configuration under test), audited against
    * brute force. Deterministic end to end.
    *
    * @param brute pass the corpus's precomputed (ideally persisted)
    *              [[Similarity.bruteForceTopK]] frame when auditing the
    *              SAME corpus under several centroid arrays — the exact
    *              scan is each rung's dominant cost and recomputing it
    *              per audit doubles the harness (r15 review) */
  def meanRecall(corpus: DataFrame, cells: Array[(Long, Seq[Double], Double)],
                 nQ: Int, nCells: Int, nProbe: Int,
                 brute: Option[DataFrame] = None): Double = {
    val approx = Similarity.ivfHashTopKPruned(corpus,
      Similarity.ivfCellAssignmentsWith(corpus, cells),
      nQueries = nQ, k = 5, nCells = nCells, nProbe = nProbe,
      cells = Some(cells))
    val exact = brute.getOrElse(
      Similarity.bruteForceTopK(corpus, nQueries = nQ, k = 5))
    val r = Similarity.recallAudit(approx, exact, 5)
      .agg(avg(col("recall_at_k"))).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** Relabel base+fresh so the first nQ FRESH vectors become the query
    * set (ids 0..nQ-1) and everything else moves out of the query
    * range — recall for users arriving FROM the drifted distribution. */
  def newQueryView(b: DataFrame, fresh: DataFrame, nQ: Int): DataFrame = {
    val q = fresh.orderBy(col("vec_id")).limit(nQ)
      .select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("vec_id")))
          .cast("long") - 1L, col("embedding"))
    val rest = fresh.orderBy(col("vec_id")).offset(nQ)
      .select(col("vec_id") + lit(500000000L), col("embedding"))
    q.unionAll(b.select(col("vec_id") + lit(700000000L), col("embedding")))
      .unionAll(rest)
      .toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nCells = sys.env.getOrElse("SPARK_GRAFT_ANN_CELLS", "64").toInt
    val nProbe = sys.env.getOrElse("SPARK_GRAFT_ANN_PROBE", "8").toInt
    val nQ = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "32").toInt
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

    // each corpus's brute-force ground truth computes ONCE and persists:
    // the exact scan dominates a rung's cost and both the frozen and the
    // retrained audit read the same truth
    def withBrute[T](corpus: DataFrame)(
        f: (DataFrame, Option[DataFrame]) => T): T = {
      val brute = Similarity.bruteForceTopK(corpus, nQueries = nQ, k = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try f(corpus, Some(brute)) finally brute.unpersist()
    }
    def newQueryView(b: DataFrame, fresh: DataFrame): DataFrame =
      AnnStaleness.newQueryView(b, fresh, nQ)

    val frozen = Similarity.freezeAnnIndex(base, nCells)
      .getOrElse(sys.error("base corpus too small to freeze")).cells.toArray

    for (frac <- Seq(0.0, 0.5, 1.0, 2.0, 4.0)) {
      val fresh = freshShifted(spark, (frac * nBase).toLong)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nFresh = fresh.count()
      val combined = base.unionAll(fresh)
      // the registered drift monitor's reading on this corpus state
      val driftZ =
        if (nFresh == 0) 0.0
        else Similarity.embeddingDrift(combined,
            col("vec_id") >= 100000000L)
          .agg(max(col("mean_shift_z"))).collect()(0).getDouble(0)
      val (retrainSec, retrained) = {
        val t0 = System.nanoTime()
        val c = Similarity.freezeAnnIndex(combined, nCells)
          .getOrElse(sys.error("combined corpus too small")).cells.toArray
        ((System.nanoTime() - t0) / 1e9, c)
      }
      val (recallOldFrozen, recallOldRetrained) =
        withBrute(combined) { (c, brute) =>
          (meanRecall(c, frozen, nQ, nCells, nProbe, brute),
            meanRecall(c, retrained, nQ, nCells, nProbe, brute))
        }
      val (recallNewFrozen, recallNewRetrained) =
        if (nFresh == 0) (recallOldFrozen, recallOldRetrained)
        else withBrute(newQueryView(base, fresh)) { (v, brute) =>
          (meanRecall(v, frozen, nQ, nCells, nProbe, brute),
            meanRecall(v, retrained, nQ, nCells, nProbe, brute))
        }
      println(f"""{"metric":"ann_staleness","frac_new":$frac,""" +
        f""""n_base":$nBase,"n_fresh":$nFresh,"cells":$nCells,""" +
        f""""probe":$nProbe,"queries":$nQ,"drift_z":$driftZ%.3f,""" +
        f""""recall_old_frozen":$recallOldFrozen%.3f,""" +
        f""""recall_new_frozen":$recallNewFrozen%.3f,""" +
        f""""recall_old_retrained":$recallOldRetrained%.3f,""" +
        f""""recall_new_retrained":$recallNewRetrained%.3f,""" +
        f""""retrain_sec":$retrainSec%.2f}""")
      fresh.unpersist()
    }
    spark.stop()
  }
}
