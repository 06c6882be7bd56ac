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

/** Deterministic per-asset features from the media decoder. */
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
 * The IMAGE decode path is REAL (r12): [[decodeImage]]/[[resizeImage]]
 * run on the JDK's own `javax.imageio` (PNG/JPEG/BMP/GIF — no external
 * libraries, headless-safe), so image payloads yield true
 * width/height/band/luma-statistics features and real resampled bytes;
 * spec-tested on PNGs/JPEGs synthesized in the suite. Audio/video still
 * have no codecs in the container, so non-image payloads take the
 * deterministic [[decodeStub]] byte-histogram path (clearly marked) —
 * the [[decode]] dispatch is where a deployment plugs its codecs, and
 * everything around it — binary column, metadata struct, partitioning,
 * per-partition batching, output schema — is identical for both paths.
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
   * STUB DECODER — the deterministic fallback for media types WITHOUT a
   * codec in this container (audio/video): a 16-bin byte-value
   * histogram, L1-normalized. The signature (bytes in, fixed-width
   * float vector out) matches [[decodeImage]], so a deployment swaps in
   * real codecs at the [[decode]] dispatch without touching callers.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    payload.foreach(b => bins((b & 0xff) >> 4) += 1f)
    val n = math.max(payload.length, 1).toFloat
    bins.map(_ / n)
  }

  /** Feature width shared by every decode path. */
  val FeatureDim = 16

  /**
   * REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF;
   * no external dependencies, headless-safe): a fixed-width
   * [[FeatureDim]] feature vector
   * `[width, height, bands, meanLuma/255, stdLuma/255, hist8(luma)…, 0,0,0]`
   * with the 8-bin luma histogram mass-normalized — the cheap global
   * image statistics a curation pipeline filters on (blank/near-blank
   * detection, exposure outliers) before any model runs. `None` when
   * the bytes are not a decodable image (ImageIO probes the container
   * format and returns null / throws on truncation) — the caller
   * decides the fallback, never a crash on a poisoned payload.
   */
  def decodeImage(payload: Array[Byte]): Option[Array[Float]] =
    decodeBuffered(payload).map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val bands = img.getRaster.getNumBands
      var sum = 0.0
      var sum2 = 0.0
      val hist = new Array[Float](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          sum += lum
          sum2 += lum.toDouble * lum
          hist(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val mean = sum / n
      val std = math.sqrt(math.max(sum2 / n - mean * mean, 0.0))
      val out = new Array[Float](FeatureDim)
      out(0) = w.toFloat; out(1) = h.toFloat; out(2) = bands.toFloat
      out(3) = (mean / 255.0).toFloat; out(4) = (std / 255.0).toFloat
      var i = 0
      while (i < 8) { out(5 + i) = (hist(i) / n).toFloat; i += 1 }
      out
    }

  /**
   * Content-dispatching decoder: image media types take the REAL
   * [[decodeImage]] path (undecodable image bytes → the zero vector, a
   * poisoned-payload marker downstream filters on, never a crash);
   * everything else takes the [[decodeStub]] histogram. ONE function to
   * extend per new codec.
   */
  def decode(payload: Array[Byte], mediaType: String): Array[Float] =
    if (mediaType != null && mediaType.startsWith("image/"))
      decodeImage(payload).getOrElse(new Array[Float](FeatureDim))
    else decodeStub(payload)

  /**
   * REAL image resize via ImageIO + `Graphics2D.drawImage` bilinear
   * scaling, re-encoded to `format` bytes — the standard
   * normalize-resolution preprocessing step before feature extraction
   * or training. `None` for undecodable payloads (same contract as
   * [[decodeImage]]).
   */
  def resizeImage(payload: Array[Byte], width: Int, height: Int,
                  format: String = "png"): Option[Array[Byte]] = {
    decodeBuffered(payload).flatMap { src =>
      val dst = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, width, height, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      // ImageIO.write returns FALSE for a format with no writer — that
      // must be None (asset passes through), not Some(empty bytes)
      if (javax.imageio.ImageIO.write(dst, format, bos)) Some(bos.toByteArray)
      else None
    }
  }

  private def decodeBuffered(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null
              case _: RuntimeException => null }
    Option(img)
  }

  /**
   * Per-partition image resize over an asset set: image payloads are
   * resampled to (width × height) and re-encoded (media_type updates to
   * the target format); non-image and undecodable payloads pass through
   * untouched — the normalize-the-lake pass, narrow like
   * [[extractFeatures]].
   */
  def resizeAssets(assets: Dataset[MediaAsset], width: Int, height: Int,
                   format: String = "png"): Dataset[MediaAsset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.media_type != null && a.media_type.startsWith("image/"))
          resizeImage(a.payload, width, height, format)
            .map(bytes => a.copy(payload = bytes,
              media_type = s"image/$format"))
            .getOrElse(a)
        else a
      }
    }
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
        a.payload.length.toLong, decode(a.payload, a.media_type)))
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
