package graft

import graft.similarity.Similarity
import graft.text.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-trend smoke harness: amplifies the `documents` corpus K× with
 * MUTATED copies (each copy appends a distinct tag token, so copies are
 * not near-duplicates and the duplicate structure per copy is preserved)
 * and times the heavy curation operators at each K. The point is the
 * TREND — a quadratic term shows up as super-linear growth long before
 * 100 TB does — not absolute numbers. Usage:
 *
 *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ScaleSmoke 1 2 4 8"
 *
 * Prints one JSON line per K with per-operator seconds.
 */
object ScaleSmoke {

  /** K mutated copies: every TOKEN gets a per-copy suffix, so copies
    * share no shingles — the duplicate/near-dup structure per copy is
    * preserved while cross-copy pairs are impossible. (A single appended
    * tag token is NOT enough: copies would still share almost all
    * shingles and form K-sized near-dup classes — quadratic pair growth
    * that measures output size, not operator scaling.) */
  private def amplify(docs: DataFrame, k: Int): DataFrame =
    (0 until k).map { i =>
      docs.select(
        (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1" + s"c$i").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // K=0 pass warms codegen so the first measured K isn't billed for it
    val warm = amplify(base, 1).limit(200)
      .repartition(cpus.toInt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.nearDupMinhashLsh(warm).count()
    TextAnalysis.vocabTopK(warm).count()
    TextAnalysis.qualityGate(warm).count()
    warm.unpersist()

    for (k <- ks) {
      val docs = amplify(base, k)
        .repartition(cpus.toInt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()
      val sh = Dedup.shingleArrays(docs, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tMinhash, pairs) = timed {
        Dedup.nearDupMinhashLsh(docs, sharedShingles = Some(sh)).count()
      }
      // clusters is timed over a MATERIALIZED pair frame — re-running the
      // whole pair pipeline inside the timer (ADVICE r6) conflated pair
      // generation with label propagation and overstated propagation ~2×
      val pairFrame = Dedup.nearDupMinhashLsh(docs, sharedShingles = Some(sh))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairFrame.count()
      val (tClusters, members) = timed { Dedup.clusters(pairFrame).count() }
      pairFrame.unpersist()
      // the two inverted-index self-joins: cost is bounded by df-cap², so
      // the trend across K is the sharpest quadratic-term detector here
      val (tContain, containPairs) = timed {
        Dedup.containmentPairs(docs, sharedShingles = Some(sh)).count()
      }
      val (tCapped, cappedPairs) = timed {
        Dedup.jaccardPairsExact(docs, sharedShingles = Some(sh),
          maxShingleDf = Some(100)).count()
      }
      // novelty: two bounded-skew shuffles over the exploded shingles;
      // its trend must track the shingle volume (linear in K) — growth
      // past that means the df join's hottest key stopped being absorbed
      // by map-side partials
      val (tNovelty, noveltyRows) = timed { Dedup.ngramNovelty(sh).count() }
      val (tVocab, vocabRows) = timed { TextAnalysis.vocabTopK(docs).count() }
      val (tGate, gateRows) = timed { TextAnalysis.qualityGate(docs).count() }
      val (tSpans, spanDocs) = timed {
        Dedup.duplicateSpanStats(docs, k = 12).count()
      }
      // linear one-shuffle curation ops: the packer trend guards the
      // two-pass prefix sum (a serialization cliff would show as
      // super-linear growth at high K), the classifier trend the
      // broadcast-model join; their internal aux persists are
      // doc-count-sized and fall to the loop-end clearCache
      val (tPackSeq, segRows) = timed {
        TextAnalysis.packSequences(docs).count()
      }
      val (tQc, qcRows) = timed {
        TextAnalysis.hashedLinearScore(docs).count()
      }
      // bloom probe: the position set is bounded by mBits however large
      // the corpus grows, so the trend must stay linear in K (broadcast
      // build + map-side probes); super-linear growth would mean the
      // membership join stopped broadcasting
      val (tBloom, bloomRows) = timed {
        Dedup.bloomDedupAudit(docs, col("doc_id") % 10 === 0).count()
      }
      // embeddings side: exact copies under fresh ids — queries and the
      // decontamination eval set stay pinned to ORIGINAL ids so candidate
      // and output sizes grow linearly in K (eval × corpus, not K²) and
      // the timings measure operator scaling, not result growth
      val embs = (0 until k).map { i =>
        spark.read.parquet(s"$sfDir/embeddings.parquet").select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionAll _)
        .repartition(cpus.toInt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      embs.count()
      val codes = Similarity.productQuantize(embs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tPq, nCodes) = timed { codes.count() }
      val (tAdc, adcRows) = timed {
        Similarity.adcTopK(embs, nQueries = 8, topK = 5,
          sharedCodes = Some(codes)).count()
      }
      val (tSemDecon, flagged) = timed {
        Similarity.semanticDecontaminate(embs,
          isEval = col("vec_id") < 60L && col("vec_id") % 11 === 0,
          threshold = 0.25).count()
      }
      // queries pinned to original ids: candidate volume grows with cell
      // occupancy (linear in K), the probe/LUT sides stay constant
      val (tIvfPq, ivfPqRows) = timed {
        Similarity.ivfPqTopK(embs, nQueries = 8, topK = 5,
          sharedCodes = Some(codes)).count()
      }
      // pure map work: RP must track the scan cost (linear, no shuffle)
      val (tRp, rpRows) = timed {
        Similarity.randomProjection(embs).count()
      }
      println(s"""{"k":$k,"docs":$n,"minhash_sec":$tMinhash,"pairs":$pairs,""" +
        s""""clusters_sec":$tClusters,"members":$members,""" +
        s""""contain_sec":$tContain,"contain_pairs":$containPairs,""" +
        s""""capped_sec":$tCapped,"capped_pairs":$cappedPairs,""" +
        s""""novelty_sec":$tNovelty,"novelty_rows":$noveltyRows,""" +
        s""""vocab_sec":$tVocab,"gate_sec":$tGate,""" +
        s""""spans_sec":$tSpans,"span_docs":$spanDocs,""" +
        s""""pq_sec":$tPq,"adc_sec":$tAdc,""" +
        s""""semdecon_sec":$tSemDecon,"flagged":$flagged,""" +
        s""""ivfpq_sec":$tIvfPq,"ivfpq_rows":$ivfPqRows,""" +
        s""""packseq_sec":$tPackSeq,"seg_rows":$segRows,""" +
        s""""qclass_sec":$tQc,"qclass_rows":$qcRows,""" +
        s""""bloom_sec":$tBloom,"bloom_rows":$bloomRows,""" +
        s""""rp_sec":$tRp,"rp_rows":$rpRows}""")
      codes.unpersist(); embs.unpersist()
      sh.unpersist(); docs.unpersist(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
