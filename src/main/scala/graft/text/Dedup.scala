package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Document deduplication operators over a `documents(doc_id, text, ...)`
 * table — the dedup family a 100 TB training-data pipeline needs:
 *
 *  - [[exact]]: hash-groupBy exact dedup (one shuffle on the content
 *    fingerprint, map-side partial aggregation).
 *  - [[nearDupMinhashLsh]]: MinHash + banded LSH near-dup detection.
 *    Shuffles on band keys only — candidate generation never compares
 *    all pairs, so cost is linear in corpus size plus the (data-bounded)
 *    within-bucket pair count. This is THE scale path.
 *  - [[jaccardPairsExact]]: exact n-gram Jaccard via a shingle inverted
 *    index. Ground truth for LSH recall tests and for small/medium
 *    corpora; at 100 TB the hot-shingle join term makes LSH the right
 *    tool (or pre-filter stop-shingles by document frequency).
 *
 * Every step is Catalyst built-ins over the portable hash family
 * ([[TextOps.saltedHash]]), so the full pipelines — including MinHash
 * signatures and band buckets — are replicated by DuckDB oracle SQL.
 */
object Dedup {

  /**
   * Exact dedup: one row per distinct text, keeping the smallest doc_id,
   * with the group size and content fingerprint. GroupBy (not a window)
   * so partial aggregation runs map-side before the single hash shuffle.
   */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("group_size"))
      .select(col("doc_id"), col("fingerprint"), col("group_size"))

  /** A caller-supplied shared shingle index must match the requested
    * width, or jaccard values would silently be computed over the wrong
    * n-grams — checked against the first row's token count. */
  private def requireWidth(shingles: DataFrame, n: Int): DataFrame = {
    val sample = shingles
      .select(size(split(col("shingle"), " ", -1)).as("w")).limit(1).collect()
    sample.headOption.foreach { r =>
      require(r.getInt(0) == n,
        s"shared shingle index has width ${r.getInt(0)}, expected $n")
    }
    shingles
  }

  /** Distinct (doc_id, shingle) pairs for word n-gram shingles. */
  def shingleSet(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"),
        explode(TextOps.shingles(TextOps.tokens(col("text")), n)).as("shingle"))
      .distinct()

  /**
   * k lexicographic-min MinHashes per document, columns h0..h{k-1}. Hash
   * family: each salted md5 yields FOUR independent 32-bit lanes (disjoint
   * 8-hex-char slices), so k lanes cost only ⌈k/4⌉ md5 evaluations per
   * shingle — md5 is the per-row CPU cost of the whole signature pass, and
   * the slicing is portable (DuckDB `substr(md5(...))` is byte-identical).
   * The bases are projected once before the aggregation so each md5 is
   * computed exactly once per row. One shuffle; the k mins combine
   * map-side.
   */
  def minhashSignature(shingles: DataFrame, k: Int): DataFrame = {
    val nBase = (k + 3) / 4
    val withBases = shingles.select(
      col("doc_id") +:
        (0 until nBase).map(b => TextOps.saltedHash(b, col("shingle")).as(s"__b$b")): _*)
    val aggs = (0 until k).map(i =>
      min(substring(col(s"__b${i / 4}"), 1 + 8 * (i % 4), 8)).as(s"h$i"))
    withBases.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Banded LSH candidate pairs (doc_a < doc_b): documents agreeing on all
   * rows of any band collide on that band's key. `bands * rowsPerBand`
   * must equal the signature width. The self-join shuffles on (band,
   * band-key) — identical signatures land in the same bucket; random
   * pairs collide with probability ~jaccard^rowsPerBand per band.
   *
   * Skew defense (same trade as the sign-LSH cap): a mass-duplicate class
   * — millions of copies of one boilerplate text at 100 TB — puts one
   * signature in one bucket and makes the pair join quadratic in class
   * size. Buckets over `maxBucketSize` are dropped; collapse exact
   * duplicates first (see [[exact]]) when mass duplication is expected.
   */
  def lshCandidates(signature: DataFrame, bands: Int, rowsPerBand: Int,
                    maxBucketSize: Int = 1000): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat(cols: _*)).as("bkey"))
    }
    // persisted: both sides of the self-join consume this frame — without
    // the cache the signature expansion AND the bucket-size window run
    // twice (one row per (doc, band): tiny relative to the shingle index)
    val banded = signature
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bkey"))))
      .filter(col("__n") <= maxBucketSize)
      .drop("__n")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /**
   * Exact Jaccard for the given candidate pairs, computed from the
   * shingle sets: |A ∩ B| via a semi-structured double join (candidates
   * are few; shingle sets are the big side), |A ∪ B| = |A| + |B| - |A ∩ B|.
   */
  def jaccardForPairs(candidates: DataFrame, shingles: DataFrame): DataFrame = {
    val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val sa = shingles.alias("sa")
    val sb = shingles.alias("sb")
    val inter = candidates.alias("cand")
      .join(sa, col("sa.doc_id") === col("cand.doc_a"))
      .join(sb, col("sb.doc_id") === col("cand.doc_b") &&
        col("sb.shingle") === col("sa.shingle"))
      .groupBy(col("cand.doc_a").as("doc_a"), col("cand.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.alias("za"), col("za.doc_id") === col("doc_a"))
      .join(sizes.alias("zb"), col("zb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("za.n") + col("zb.n") - col("inter"))).as("jaccard"))
  }

  /**
   * Full MinHash-LSH near-dup pipeline: shingle → signature → banded
   * candidates → exact-Jaccard verify → threshold. Output
   * (doc_a, doc_b, jaccard) with jaccard rounded to 6 dp for
   * engine-portable comparison.
   */
  def nearDupMinhashLsh(docs: DataFrame, shingleWidth: Int = 3, k: Int = 8,
                        bands: Int = 4, threshold: Double = 0.5,
                        sharedShingles: Option[DataFrame] = None): DataFrame = {
    require(k % bands == 0, s"signature width $k not divisible into $bands bands")
    // The shingle index feeds four consumers (signature, both intersection
    // sides, sizes); without persistence each one re-tokenizes the whole
    // corpus — at 100 TB the dominant cost. Callers running several dedup
    // operators pass one shared (already-persisted) index via
    // `sharedShingles`; a production pipeline would write it to a table.
    val shd = sharedShingles.map(requireWidth(_, shingleWidth)).getOrElse(
      shingleSet(docs, shingleWidth).persist(StorageLevel.MEMORY_AND_DISK))
    val cand = lshCandidates(minhashSignature(shd, k), bands, k / bands)
    jaccardForPairs(cand, shd)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * Exact all-pairs n-gram Jaccard >= threshold via the shingle inverted
   * index (pairs sharing zero shingles are never materialized — their
   * jaccard is 0 and can't pass a positive threshold).
   */
  def jaccardPairsExact(docs: DataFrame, shingleWidth: Int = 3,
                        threshold: Double = 0.5,
                        sharedShingles: Option[DataFrame] = None): DataFrame = {
    val shd = sharedShingles.map(requireWidth(_, shingleWidth)).getOrElse(
      shingleSet(docs, shingleWidth).persist(StorageLevel.MEMORY_AND_DISK))
    val sizes = shd.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val sa = shd.alias("sa")
    val sb = shd.alias("sb")
    val inter = sa
      .join(sb, col("sb.shingle") === col("sa.shingle") &&
        col("sa.doc_id") < col("sb.doc_id"))
      .groupBy(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.alias("za"), col("za.doc_id") === col("doc_a"))
      .join(sizes.alias("zb"), col("zb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("za.n") + col("zb.n") - col("inter"))).as("j"))
      .filter(col("j") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
  }
}
