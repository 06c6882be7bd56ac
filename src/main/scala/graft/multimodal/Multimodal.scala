package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** An opaque media payload with typed metadata — the multimodal column
  * pattern: the engine never interprets the bytes; decode/feature steps
  * are pluggable per-partition functions over the binary column. */
final case class MediaAsset(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta_lang: String,
    meta_n_chars: Long)

/** Deterministic per-asset features from the stub decoder. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    byte_len: Long,
    histogram: Array[Float])

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * columns with typed metadata; decoding and feature extraction run as
 * per-partition batch functions over the binary column (the Scala
 * analogue of `mapInPandas` — same batch shape: the executor sees an
 * iterator of rows per partition and the decoder amortizes any model/
 * library init across the partition).
 *
 * The container has no image/audio libraries, so [[decodeStub]] is a
 * clearly-marked deterministic fake (a 16-bin byte histogram standing in
 * for "decode then embed"); everything around it — the binary column,
 * metadata struct, partitioning, per-partition batching, output schema —
 * is real and tested. Swapping in a real decoder changes ONE function.
 */
object Multimodal {

  /**
   * Lift `documents` into media assets: the text bytes become the opaque
   * payload (a stand-in for image/audio bytes), `lang`/`n_chars` become
   * the typed metadata. Pure projection — no shuffle.
   */
  def assets(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"),
      col("lang").as("meta_lang"),
      col("n_chars").as("meta_n_chars"))
      .as[MediaAsset]
  }

  /**
   * STUB DECODER — deterministic fake for the absent media libraries: a
   * 16-bin byte-value histogram, L1-normalized. A real pipeline replaces
   * this body with e.g. JPEG decode + CNN embed; the signature (bytes in,
   * fixed-width float vector out) and everything calling it stay as-is.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    payload.foreach(b => bins((b & 0xff) >> 4) += 1f)
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /**
   * Per-partition feature extraction over the binary column. Narrow
   * transformation — runs wherever the assets already are, no shuffle;
   * partition count (not driver memory) bounds parallelism at 100 TB.
   */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition init would go here (load model, open codec, ...)
      it.map(a => MediaFeatures(a.doc_id, a.media_type,
        a.payload.length.toLong, decodeStub(a.payload)))
    }
  }

  /**
   * SQL-expressible metadata/feature projection over the assets (the
   * oracle-checkable slice): byte length, md5 checksum, 256-byte chunk
   * count — the bookkeeping columns a media lake maintains per object.
   */
  def mediaSummary(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      octet_length(col("text")).cast("bigint").as("byte_len"),
      md5(col("text")).as("checksum"),
      ceil(octet_length(col("text")) / lit(256.0)).cast("bigint").as("n_chunks"),
      col("lang").as("meta_lang"),
      col("n_chars").as("meta_n_chars"))

  /**
   * Structured-column extraction from the `events.props` JSON string:
   * `from_json` into a typed struct (the "metadata sidecar" pattern) and
   * per-event-type aggregates over the extracted field.
   */
  def propsAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), lit("k INT")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(sum(col("k")).cast("double") / count(col("k")), 6).as("avg_k"))

  /**
   * Frame sampling over the opaque payload — the video/audio "take every
   * Nth frame" pattern: the payload splits into fixed-length frames, every
   * `stride`-th frame is kept, and each sampled frame carries its index,
   * length, and checksum (a real pipeline would decode/resize the frame
   * bytes here — see [[decodeStub]]'s swap-in note). Pure per-row
   * explode+substring expressions: narrow, codegen'd, no shuffle; output
   * size is corpus_bytes / (frameLen · stride) rows regardless of scale.
   * The text column stands in for the payload bytes so the slicing is
   * DuckDB-expressible and the whole operator stays oracle-checked.
   */
  def frameSample(documents: DataFrame, frameLen: Int = 64, stride: Int = 2): DataFrame =
    documents
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          ceil(length(col("text")) / lit(frameLen.toDouble)).cast("int") - 1))
          .as("frame_no"))
      .filter(col("frame_no") % stride === 0)
      .select(col("doc_id"), col("frame_no").cast("bigint").as("frame_no"),
        col("text").substr(col("frame_no") * frameLen + 1, lit(frameLen)).as("frame"))
      .select(col("doc_id"), col("frame_no"),
        length(col("frame")).cast("bigint").as("frame_len"),
        md5(col("frame")).as("checksum"))

  /** Convenience: full stub pipeline as a DataFrame for ad-hoc use. */
  def features(documents: DataFrame): DataFrame =
    extractFeatures(assets(documents)).toDF()
}
