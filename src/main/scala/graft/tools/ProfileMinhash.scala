package graft.tools

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Ad-hoc stage timing for the MinHash-LSH dedup pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("warmup")(docs.count())
    time("shingleArrays no persist")(Dedup.shingleArrays(docs, 3).count())
    val shd = time("shingleArrays build+persist") {
      val s = Dedup.shingleArrays(docs, 3).persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val sig = time("minhashSignature") {
      val s = Dedup.minhashSignature(shd, 8); s.count(); s
    }
    val cand = time("lshCandidates") {
      val c = Dedup.lshCandidates(sig, 4, 2); c.count(); c
    }
    time("jaccardForPairs")(Dedup.jaccardForPairs(cand, shd).count())
    time("full pipeline (shared shingles)")(
      Dedup.nearDupMinhashLsh(docs, sharedShingles = Some(shd)).count())
    time("full pipeline 2nd (shared shingles)")(
      Dedup.nearDupMinhashLsh(docs, sharedShingles = Some(shd)).count())
    time("jaccardPairsExact (shared shingles)")(
      Dedup.jaccardPairsExact(docs, sharedShingles = Some(shd)).count())
    spark.stop()
  }
}
