package graft

import graft.similarity.{AnnLifecycle, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Measured receipt for the drift-triggered retrain + atomic hot swap
 * ([[graft.similarity.AnnLifecycle]]) at the AnnStaleness table's scale
 * (sf0.01 base, 2× shifted arrivals, 64 cells / 8 probes): how long the
 * publish takes while a serve loop keeps reading, how many serves land
 * on each generation during the race, that zero mixed-model results
 * were observed, and the new-query recall before/after the swap — the
 * operational numbers next to the r15 policy table (BASELINE.md).
 * Semantics are pinned in StreamingAnnIngestSpec; this main only
 * measures.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnSwapDrill"
 */
object AnnSwapDrill {
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
    val work = Files.createTempDirectory("graft-ann-swap").toString
    val dir = s"$work/index"
    val topic = s"$work/emb_topic"
    Files.createDirectories(java.nio.file.Paths.get(topic))

    val cells1 = Similarity.freezeAnnIndex(base, nCells).get.cells.toArray
    val pub1 = AnnLifecycle.publish(spark, dir, 1, cells1, base)

    val fresh = AnnStaleness.freshShifted(spark, 2 * nBase)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fresh.count()
    val lines = graft.streaming.JsonStreams.encode(fresh)
      .collect().map(_.getString(0))
    Files.write(java.nio.file.Paths.get(s"$topic/b1.json"),
      String.join("\n", lines: _*).getBytes)
    val gen1 = AnnLifecycle.runIngestGeneration(spark, dir, 1, topic,
      s"$work/ck")
    try gen1.processAllAvailable() finally gen1.stop()

    // race the controller's retrain+publish against a serve loop
    val observed = scala.collection.mutable.ArrayBuffer.empty[Int]
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val t0 = System.nanoTime()
    val swap = Future {
      AnnLifecycle.maybeRetrainSwap(spark, dir, nCells)
    }
    var mixes = 0
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Int]("rank"))).toSet
    val served = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Set[(Long, Long, Double, Int)])]
    while (!swap.isCompleted) {
      val (v, df) = AnnLifecycle.serveTopK(spark, dir, base, nQ, 5,
        nCells, nProbe)
      served += ((v, rows(df)))
      observed += v
    }
    val d = Await.result(swap, scala.concurrent.duration.Duration.Inf)
    val swapSec = (System.nanoTime() - t0) / 1e9
    val expected = Map(
      1 -> rows(AnnLifecycle.serveTopKAt(spark, dir, 1, base, nQ, 5,
        nCells, nProbe)),
      2 -> rows(AnnLifecycle.serveTopKAt(spark, dir, 2, base, nQ, 5,
        nCells, nProbe)))
    served.foreach { case (v, r) => if (r != expected(v)) mixes += 1 }

    val view = AnnStaleness.newQueryView(base, fresh, nQ)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rFrozen = AnnStaleness.meanRecall(view, cells1, nQ, nCells, nProbe)
    val rRetr = AnnStaleness.meanRecall(view,
      AnnLifecycle.loadCells(spark, dir, 2), nQ, nCells, nProbe)

    println(f"""{"metric":"ann_swap","n_base":$nBase,""" +
      f""""n_fresh":${2 * nBase},"cells":$nCells,"probe":$nProbe,""" +
      f""""drift_z":${d.driftZ}%.2f,"new_share":${d.newShare}%.2f,""" +
      f""""publish1_sec":${pub1.publishSec}%.2f,""" +
      f""""swap_sec":${d.published.map(_.publishSec).getOrElse(-1.0)}%.2f,""" +
      f""""swap_total_sec":$swapSec%.2f,""" +
      f""""serves_during_swap_v1":${observed.count(_ == 1)},""" +
      f""""serves_during_swap_v2":${observed.count(_ == 2)},""" +
      f""""mixed_results":$mixes,""" +
      f""""recall_new_frozen":$rFrozen%.3f,""" +
      f""""recall_new_retrained":$rRetr%.3f}""")
    spark.stop()
  }
}
