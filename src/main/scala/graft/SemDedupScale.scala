package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * SemDeDup width/cap ladder — the 100 TB receipt for
 * [[graft.similarity.Similarity.semanticDedupCells]]: its cost is the
 * within-cell pair mass Σ n_c·(n_c−1)/2, so the SAME corpus deduped
 * under a toy-width quantizer (16 cells) versus the corpus-scaled
 * width ([[Similarity.scaledCells]]) should find the SAME planted
 * duplicates while the pair mass — and the wall clock — collapses by
 * the width ratio. The ladder corpus is the IvfWidthLadder amplifier:
 * K per-copy-scaled clones of every base embedding, i.e. K-member
 * PARALLEL cliques (pairwise cosine exactly 1.0) — ground truth is
 * n − n_base evictions at ANY correct width, because parallel vectors
 * share every cosine and therefore every argmax cell.
 *
 * Rungs, one JSON line each:
 *
 *  - width 16 (toy) — occupancy ≈ n/16, the quadratic the policy
 *    exists to prevent; run while n is small enough to afford it;
 *  - width scaledCells(n) — the [[Similarity.AutoCells]] policy rung:
 *    same dups, pair mass down by ~width ratio;
 *  - width 16 under a 1000-member occupancy cap — the honest
 *    degradation mode: every cell over-cap → zero pairs, zero dups,
 *    flat wall (the cap trades recall for a bound and SAYS so in the
 *    verdict column; a production run at this shape is the signal to
 *    widen the quantizer, which is what AutoCells does unprompted).
 *
 * The pair bound is computed from the operator's OWN cell column
 * (exact occupancies, under-cap cells only), so the receipt and the
 * measured wall describe the identical assignment.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_ANN_K=64 \
 *     sbt "runMain graft.SemDedupScale"
 */
object SemDedupScale {

  private def amplify(e: org.apache.spark.sql.DataFrame, k: Int) =
    (0 until k).map { i =>
      e.select(
        (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x * (lit(1.0f) + lit(i.toFloat * 0.001f))).as("embedding"))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val kAmp = sys.env.getOrElse("SPARK_GRAFT_ANN_K", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nBase = base.count()
    val emb = amplify(base, kAmp)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val scaled = Similarity.scaledCells(n)

    def rung(width: Int, cap: Int): Unit = {
      // no silent caps: a rung whose PROJECTED pair mass (uniform
      // occupancy estimate) is past the affordable line is skipped with
      // the estimate printed, not quietly omitted — at 100 TB this line
      // is exactly why the toy width cannot be run and AutoCells exists
      val estOcc = n.toDouble / width
      val projected = if (estOcc > cap) 0.0 else n.toDouble * n / width / 2.0
      if (projected > 5e8) {
        println(s"""{"metric":"semdedup_ladder","n":$n,"n_base":$nBase,""" +
          s""""width":$width,"cap":$cap,"skipped":true,""" +
          s""""projected_pairs":${projected.toLong}}""")
        return
      }
      val t0 = System.nanoTime()
      val out = Similarity.semanticDedupCells(emb, nCells = width,
        maxCellSize = cap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one aggregation pass drives the whole operator: per-cell
      // occupancy + dup count, then the under-cap pair bound
      val cells = out.groupBy(col("cell"))
        .agg(count(lit(1)).as("occ"),
          count(when(col("verdict") === "dup", 1)).as("dups"))
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val occ = cells.map(_.getAs[Long]("occ"))
      val dups = cells.map(_.getAs[Long]("dups")).sum
      val pairBound = occ.filter(_ <= cap).map(c => c * (c - 1) / 2).sum
      println(s"""{"metric":"semdedup_ladder","n":$n,"n_base":$nBase,""" +
        s""""width":$width,"cap":$cap,"occupied":${occ.length},""" +
        s""""max_occ":${if (occ.isEmpty) 0L else occ.max},""" +
        s""""pair_bound":$pairBound,"dups":$dups,""" +
        s""""wall_sec":${math.round(wall * 100) / 100.0}}""")
      // the r19 cell-health audit's rollup row over the SAME verdict
      // frame — the over-cap silence as a printed receipt: exempted
      // vectors and their ppm share must be 0 except at a binding cap
      val a = Similarity.semanticDedupCellAudit(out, maxCellSize = cap)
        .filter(col("cell").isNull).collect()(0)
      println(s"""{"metric":"semdedup_cell_audit","n":$n,""" +
        s""""width":$width,"cap":$cap,""" +
        s""""n_over_cap":${a.getAs[Long]("n_over_cap")},""" +
        s""""exempted_vectors":${a.getAs[Long]("exempted_vectors")},""" +
        s""""exempted_ppm":${a.getAs[Long]("exempted_ppm")},""" +
        s""""pair_bound":${a.getAs[Long]("pair_bound")}}""")
      out.unpersist(blocking = false)
    }

    rung(16, 4096)          // toy width: the local quadratic, measured
    rung(scaled, 4096)      // the AutoCells policy rung: same dups
    rung(16, 1000)          // over-cap honesty: zero pairs, flat wall

    // admission rung: the INCREMENTAL form at the policy width — every
    // 10th vector plays the arriving batch; the receipt is admissions/s
    // against the corpus (the continuous-ingest cost a pipeline pays
    // per landed vector, not the one-off full dedup above)
    {
      val isNew = col("vec_id") % 10 === 0
      // the quantizer is FROZEN in production admission — train it
      // OUTSIDE the timed window (the lifecycle pays training once per
      // retrain, not per arriving batch)
      val frozen = Similarity.ivfCells(emb, scaled)
      val t0 = System.nanoTime()
      val out = Similarity.semanticDedupIncremental(emb, isNew,
        nCells = scaled, cells = Some(frozen))
      val verdicts = out.groupBy(col("verdict"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n")).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      val nBatch = verdicts.values.sum
      println(s"""{"metric":"semdedup_admission","n":$n,""" +
        s""""n_batch":$nBatch,"width":$scaled,""" +
        s""""dups":${verdicts.getOrElse("dup", 0L)},""" +
        s""""news":${verdicts.getOrElse("new", 0L)},""" +
        s""""wall_sec":${math.round(wall * 100) / 100.0},""" +
        s""""admissions_per_sec":${math.round(nBatch / wall)}}""")
    }
    spark.stop()
  }
}
