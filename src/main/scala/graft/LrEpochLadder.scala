package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Epoch-count receipt for the µ-int logistic-regression trainer — the
 * r15 verdict's ask #6: `quality_classifier_lr` is the registry's
 * heaviest query BECAUSE it replays a 4-epoch fit, but the downstream
 * GATE reads only the sign of the logit (keep = logit >= 0) and the
 * selection queries read only ranks, so epochs past the point where
 * DECISIONS stabilize buy calibration nobody consumes. This ladder
 * measures, per epochs ∈ {1, 2, 3, 4} on the SPARK_GRAFT_SF_DIR corpus
 * (epoch 3 matters: the r16 parity-oscillation finding rests on it):
 *
 *   - fit wall seconds (the registered query's dominant cost),
 *   - held-out AUC (the ranking receipt — epoch-invariance here means
 *     the extra epochs did not change the ORDER either),
 *   - keep-decision diffs vs the epochs=4 reference (gate identity),
 *   - rank (logit-order) agreement vs epochs=4 as a Kendall-free
 *     proxy: count of docs whose µ-int logit SIGN differs is the gate
 *     diff; count whose logit VALUE differs bounds calibration drift.
 *
 * Plus the signal-bearing fixture (disjoint class vocabularies — the
 * corpus where training provably matters): AUC per epoch count, so a
 * cheaper registered point is justified on BOTH the null corpus and a
 * separable one. One JSON line per (corpus, epochs) cell.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.LrEpochLadder"
 */
object LrEpochLadder {

  /** JSON-safe double: a degenerate corpus can make AUC NaN, and a raw
    * interpolated NaN token breaks every downstream JSON parse of the
    * receipt line (ADVICE r16). */
  private def jsonNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else f"$d%.6f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val tf = TextAnalysis.docTokenCounts(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tf.count() // materialize untimed (the registry memoizes this frame)
    val isEn = col("lang") === "en"

    def fit(epochs: Int): (Array[Long], Double) = {
      val t0 = System.nanoTime()
      val w = TextAnalysis.trainLrWeights(docs, isEn, sharedTf = Some(tf),
        epochs = epochs)
      (w, (System.nanoTime() - t0) / 1e9)
    }
    // untimed warmup (planning/codegen constants)
    fit(1)

    def decisions(w: Array[Long]): Map[Long, (Long, Boolean)] =
      TextAnalysis.hashedLinearScore(docs, sharedTf = Some(tf),
          weights = Some(w))
        .select(col("doc_id"),
          floor(col("logit") * 1e6 + 0.5).cast("long").as("s"),
          col("keep"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
        .toMap
    def auc(w: Array[Long]): Double =
      TextAnalysis.classifierEval(docs, isEn, sharedTf = Some(tf),
        weights = Some(w)).collect()(0).getAs[Double]("auc")

    val cells = Seq(1, 2, 3, 4).map { e =>
      val (w, sec) = fit(e)
      (e, w, sec, decisions(w), auc(w))
    }
    val ref = cells.last._4 // epochs=4 decisions
    cells.foreach { case (e, _, sec, dec, a) =>
      val keepDiff = dec.count { case (id, (_, k)) => ref(id)._2 != k }
      val logitDiff = dec.count { case (id, (s, _)) => ref(id)._1 != s }
      println(s"""{"corpus":"testdata","sf_dir":"$sfDir","epochs":$e,""" +
        s""""fit_sec":${f"$sec%.2f"},"auc":${jsonNum(a)},""" +
        s""""keep_diff_vs4":$keepDiff,"logit_diff_vs4":$logitDiff,""" +
        s""""n_docs":${dec.size}}""")
    }

    // signal-bearing fixture: disjoint class vocabularies, the corpus
    // where the fit must find real structure (testdata langs share one
    // token distribution — its AUC is the honest null)
    val fix = (0L until 120L).map { i =>
      val words =
        if (i % 2 == 0) (0 until 8).map(j => s"pos${(i * 7 + j) % 13}")
        else (0 until 8).map(j => s"neg${(i * 5 + j) % 13}")
      (i, (words ++ Seq("the", "and")).mkString(" "))
    }.toDF("doc_id", "text")
    val isPos = col("doc_id") % 2 === 0
    val fixCells = Seq(1, 2, 4).map { e =>
      val w = TextAnalysis.trainLrWeights(fix, isPos, trainN = 64, epochs = e)
      val a = TextAnalysis.classifierEval(fix, isPos, trainN = 64,
        weights = Some(w)).collect()(0).getAs[Double]("auc")
      val keeps = TextAnalysis.hashedLinearScore(fix, weights = Some(w))
        .select(col("doc_id"), col("keep"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      (e, a, keeps)
    }
    val fixRef = fixCells.last._3
    fixCells.foreach { case (e, a, keeps) =>
      val keepDiff = keeps.count { case (id, k) => fixRef(id) != k }
      println(s"""{"corpus":"fixture","epochs":$e,"auc":${jsonNum(a)},""" +
        s""""keep_diff_vs4":$keepDiff,"n_docs":${keeps.size}}""")
    }
    spark.stop()
  }
}
