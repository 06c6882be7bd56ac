package graft.streaming

import graft.text.{TextAnalysis, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

/**
 * End-to-end streaming CURATION topology — the training-data analogue of
 * [[StreamingJobs]]'s ad pipeline, composed from the verified stage
 * operators and wired over the same file-backed topics:
 *
 *  - [[runIngestJob]]: raw docs topic → watermarked exact dedup
 *    ([[StreamingCuration.exactDedup]], bounded state) → Gopher quality
 *    gate ([[TextAnalysis.qualityGate]], stateless per-row rules with
 *    `text` passed through) → benchmark n-gram exclusion (stateless:
 *    the benchmark shingle set folds into the plan as a literal — the
 *    eval side is benchmark-sized by definition, the same contract as
 *    the stateless semantic decontamination) → `curated` topic.
 *  - [[runStatsJob]]: consumes the curated topic — the cross-job
 *    dataflow edge, the T5 shape on the curation side — and emits
 *    windowed token counts ([[StreamingCuration.windowedTokenCounts]],
 *    the two-phase exact-distinct rewrite) to a `token_stats` topic.
 *
 * Each query checkpoints under `<workDir>/_checkpoints/<name>`: offsets
 * and dedup/agg state survive restart with exactly-once file sinks —
 * identical recovery semantics to the ad jobs (T6).
 *
 * Scale notes: the only stateful operators are the ingest dedup (state
 * GC'd at the watermark horizon) and the windowed count aggregations
 * (state GC'd on window close); the gate and the benchmark exclusion are
 * pure projections, so the pipeline's state footprint is independent of
 * corpus size. Chaining through the topic re-watermarks on the consumer
 * side, as every cross-job hop must.
 */
object StreamingCurationJobs {

  /** Raw ingest topic schema (JSON-lines in the Kafka value shape). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("ingest_time", TimestampType)))

  /** Curated topic schema: survivors with fingerprint + gate metrics. */
  val curatedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ingest_time", TimestampType),
    StructField("fingerprint", StringType),
    StructField("n_tokens", LongType)))

  /**
   * The stateless benchmark-overlap exclusion: drops every row sharing a
   * word `shingleWidth`-gram with the benchmark set, whose distinct
   * shingles are collected ONCE and folded into the plan as a literal
   * array (`arrays_overlap` per row — no join, no state, no watermark
   * interaction). The inline sibling of [[StreamingCuration
   * .decontaminateFlags]]: the flagger REPORTS matches (and needs per-doc
   * dedup state); this FILTERS them, which a pure projection can do.
   */
  def decontaminateExclude(docStream: DataFrame, benchDocs: DataFrame,
                           shingleWidth: Int = 5): DataFrame = {
    val bench = graft.text.Dedup.shingleArrays(benchDocs, shingleWidth)
      .select(explode(col("sh")).as("shingle")).distinct()
      .collect().map(_.getString(0)).toSeq
    if (bench.isEmpty) docStream
    else docStream.filter(!arrays_overlap(
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), shingleWidth)),
      typedLit(bench)))
  }

  /**
   * Ingest job: `docsTopic` (JSON-lines, [[docSchema]]) → dedup → gate →
   * benchmark exclusion → `<workDir>/curated`. Returns the started query.
   *
   * @param benchDocs static benchmark frame (doc_id, text) — collected
   *                  once at job build for the exclusion literal
   */
  def runIngestJob(spark: SparkSession, docsTopic: String,
                   benchDocs: DataFrame, workDir: String,
                   watermarkDelay: String = "10 seconds",
                   shingleWidth: Int = 5,
                   maxFilesPerTrigger: Int = 8): StreamingQuery = {
    val raw = JsonStreams.decode(
      spark.readStream.option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(docsTopic),
      docSchema)
    val deduped = StreamingCuration.exactDedup(raw,
      timeCol = "ingest_time", watermarkDelay = watermarkDelay)
    val gated = TextAnalysis.qualityGate(deduped,
        passThrough = Seq("text", "ingest_time", "fingerprint"))
      .filter(col("keep"))
      .select(col("doc_id"), col("text"), col("ingest_time"),
        col("fingerprint"), col("n_tokens").cast("long").as("n_tokens"))
    val curated = decontaminateExclude(gated, benchDocs, shingleWidth)
    // json-format topic (like the ad pipeline's materialized join): the
    // chained stats job re-reads it with the declared curatedSchema
    JsonStreams.writeTopic(curated,
      s"$workDir/curated", s"$workDir/_checkpoints/curated")
  }

  /**
   * Stats job: consumes `<workDir>/curated` (fresh checkpoint = start at
   * the current end, the latest-offset analogue) and emits per-window
   * token occurrence/document-frequency counts to
   * `<workDir>/token_stats`, append-on-window-close.
   */
  def runStatsJob(spark: SparkSession, workDir: String,
                  windowLength: String = "1 minute",
                  watermarkDelay: String = "10 seconds"): StreamingQuery = {
    val curated = JsonStreams.readTopic(spark, s"$workDir/curated", curatedSchema)
    JsonStreams.writeValueTopic(
      JsonStreams.encode(StreamingCuration.windowedTokenCounts(
        curated, windowLength, timeCol = "ingest_time",
        watermarkDelay = watermarkDelay)),
      s"$workDir/token_stats", s"$workDir/_checkpoints/token_stats")
  }
}
