package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.SparkSession

/**
 * BPE-trainer batching ladder — the r14 verdict's scaling receipt: the
 * sequential trainer costs one serialized driver round-trip per merge
 * (a production 32k-merge vocabulary = 32k Spark actions), so the wall
 * must grow LINEARLY in nMerges at batch=1 and SUB-linearly under
 * batched admission ([[TextAnalysis.admitBatch]] — provably
 * merge-identical, so this ladder measures the same training outcome).
 *
 * Runs nMerges ∈ {8, 64, 256} at batch=1 and batch=64 over the
 * SPARK_GRAFT_SF_DIR documents table (default sf0.01) and prints one
 * JSON line per cell: wall seconds, driver rounds taken, merges/round.
 * The merge lists are asserted identical across the two batch settings
 * before any number is reported — a ladder over two different
 * vocabularies would be meaningless.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.BpeLadder"
 */
object BpeLadder {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // ONE corpus-scale tokenize+shuffle shared by every cell, persisted
    // up front (the registry's bpeWordCounts discipline): the ladder
    // times the TRAINING LOOP, not repeated corpus scans
    val vocab = TextAnalysis.wordCounts(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize untimed
    // untimed warmup: first-action planning/codegen constants
    TextAnalysis.bpeTrain(docs, nMerges = 2, sharedVocab = Some(vocab))

    def cell(nMerges: Int, batch: Int): (Double, Int, Seq[(String, String)]) = {
      val t0 = System.nanoTime()
      val merges = TextAnalysis.bpeTrain(docs, nMerges = nMerges,
        sharedVocab = Some(vocab), batch = batch)
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, TextAnalysis.lastTrainRounds.get,
        merges.map(m => (m.symA, m.symB)))
    }

    for (n <- Seq(8, 64, 256)) {
      val (wSeq, rSeq, mSeq) = cell(n, batch = 1)
      val (wBat, rBat, mBat) = cell(n, batch = 64)
      require(mSeq == mBat,
        s"batched merges diverged from sequential at nMerges=$n - " +
          "admitBatch equivalence is broken; fix before trusting the ladder")
      // merges/round over the merges ACTUALLY learned (the pair
      // population can exhaust before nMerges — dividing the REQUEST by
      // rounds would overstate the batching receipt)
      println(f"""{"metric":"bpe_ladder","n_merges":$n,""" +
        f""""merges_learned":${mBat.size},""" +
        f""""seq_sec":$wSeq%.2f,"seq_rounds":$rSeq,""" +
        f""""batched_sec":$wBat%.2f,"batched_rounds":$rBat,""" +
        f""""merges_per_round":${mBat.size.toDouble / rBat}%.2f,""" +
        f""""speedup":${wSeq / wBat}%.2f}""")
    }
    spark.stop()
  }
}
