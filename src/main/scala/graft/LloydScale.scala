package graft

import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession

/**
 * Distributed-Lloyd train-time receipt (r19, verdict ask #2): the
 * AutoCells cap rung (4096 cells, 32 k-row sample, 2 rounds, dim 64)
 * cost 90.9 s of SINGLE-THREADED driver Lloyd in the r18 auto-width arm
 * — the one remaining driver-side compute hotspot that grew with a
 * width knob. The trainer's per-round assign+mean now runs as a cluster
 * job past [[Similarity.distLloydThreshold]] (map-side nearest-cell +
 * partitioned µ-int partial sums merged exactly), so this main measures
 * the same train at several `local[n]` widths plus the legacy
 * driver-loop form, and fingerprints the centroids: because the µ-int
 * sums are order-proof int64, every rung — any executor count, and the
 * driver loop itself — must produce BIT-IDENTICAL centroids
 * (differentially fuzzed in KnobFuzzSpec; this main re-asserts it at
 * the production width while timing).
 *
 * One JSON line per rung + a parity line.
 *
 *   sbt "runMain graft.LloydScale"           # rungs 1,8,32 + driver form
 *   SPARK_GRAFT_LLOYD_CPUS=4,16 SPARK_GRAFT_LLOYD_DRIVER=false \
 *     sbt "runMain graft.LloydScale"
 */
object LloydScale {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_LLOYD_N", "524288").toLong
    val rungs = sys.env.getOrElse("SPARK_GRAFT_LLOYD_CPUS", "1,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val driverRung =
      sys.env.getOrElse("SPARK_GRAFT_LLOYD_DRIVER", "true").toBoolean

    def run(cpus: Int, forceDriver: Boolean): (Double, Int, Long) = {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val saved = Similarity.distLloydThreshold
      // pin the EXECUTED path to the PRINTED mode (ADVICE r19): the dist
      // rungs force threshold 0 (the KnobFuzzSpec force) rather than
      // relying on the default — a small SPARK_GRAFT_LLOYD_N would
      // otherwise silently run the driver loop under a "dist" label
      Similarity.distLloydThreshold =
        if (forceDriver) Long.MaxValue else 0L
      try {
        val corpus = AnnStaleness.freshShifted(spark, n)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        corpus.count() // corpus materialization is not train time
        val t0 = System.nanoTime()
        val cells = Similarity.ivfCells(corpus, Similarity.AutoCells)
        val sec = (System.nanoTime() - t0) / 1e9
        // order-stable fingerprint over the exact double bits: any
        // single-ulp divergence between rungs changes it
        val fp = cells.iterator.flatMap(_._2)
          .map(java.lang.Double.doubleToLongBits)
          .foldLeft(17L)((a, b) => a * 31L + b)
        (sec, cells.length, fp)
      } finally {
        Similarity.distLloydThreshold = saved
        spark.stop()
      }
    }

    val rows = rungs.map { c =>
      val (sec, width, fp) = run(c, forceDriver = false)
      println(f"""{"metric":"lloyd_train","mode":"dist","cpus":$c,"n":$n,"cells":$width,"sec":$sec%.2f,"fp":"$fp%016x"}""")
      (s"dist[$c]", sec, fp)
    } ++ (if (driverRung) {
      val c = rungs.max
      val (sec, width, fp) = run(c, forceDriver = true)
      println(f"""{"metric":"lloyd_train","mode":"driver","cpus":$c,"n":$n,"cells":$width,"sec":$sec%.2f,"fp":"$fp%016x"}""")
      Seq((s"driver[$c]", sec, fp))
    } else Nil)

    val fps = rows.map(_._3).distinct
    println(s"""{"metric":"lloyd_parity","identical":${fps.size == 1},"rungs":${rows.size}}""")
    if (fps.size != 1)
      sys.error(s"centroid fingerprints diverged across rungs: $rows")
  }
}
