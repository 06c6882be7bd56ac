package graft

import graft.multimodal.{MediaAsset, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeStub: deterministic L1-normalized 16-bin histogram") {
    val bytes = "hello world".getBytes("UTF-8")
    val h1 = Multimodal.decodeStub(bytes)
    val h2 = Multimodal.decodeStub(bytes)
    assert(h1.toSeq == h2.toSeq)
    assert(h1.length == 16)
    assert(math.abs(h1.sum - 1.0f) < 1e-5)
    assert(Multimodal.decodeStub(Array.empty[Byte]).sum == 0f)
  }

  private def pngBytes(w: Int, h: Int)(color: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, color(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: REAL PNG decode via JDK ImageIO — exact dims, luma " +
    "stats, histogram mass; truncated bytes fall back, never crash") {
    // solid mid-gray 8x6: mean luma exactly 128, std 0, all mass in bin 4
    val gray = pngBytes(8, 6)((_, _) => 0x808080)
    val f = Multimodal.decodeImage(gray).get
    assert(f(0) == 8f && f(1) == 6f)
    assert(math.abs(f(3) - 128f / 255f) < 1e-6, s"mean luma ${f(3)}")
    assert(f(4) == 0f, s"std luma ${f(4)}")
    assert(f(5 + (128 >> 5)) == 1f, "all luma mass in one bin")
    assert(f.length == Multimodal.FeatureDim)
    // black-vs-white checkerboard: mean luma ~127.5, high std, two bins
    val board = pngBytes(16, 16)((x, y) =>
      if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val fb = Multimodal.decodeImage(board).get
    assert(math.abs(fb(3) - 0.5f) < 0.01)
    assert(fb(4) > 0.4f)
    assert(fb(5) == 0.5f && fb(12) == 0.5f)
    // garbage and truncated-PNG bytes: None, and the dispatching decode
    // yields the zero-vector poisoned-payload marker
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(gray.take(20)).isEmpty)
    assert(Multimodal.decode(gray.take(20), "image/png").forall(_ == 0f))
    // non-image media types keep the deterministic histogram path
    assert(Multimodal.decode("abc".getBytes, "text/plain").sum > 0f)
  }

  test("resizeImage/resizeAssets: real bilinear resample — dims change, " +
    "solid color survives, non-images pass through") {
    val spark2 = spark
    import spark2.implicits._
    val solid = pngBytes(64, 64)((_, _) => 0x808080)
    val resized = Multimodal.resizeImage(solid, 16, 16).get
    val f = Multimodal.decodeImage(resized).get
    assert(f(0) == 16f && f(1) == 16f, s"dims ${f(0)}x${f(1)}")
    assert(math.abs(f(3) - 128f / 255f) < 1e-2 && f(4) < 0.01f,
      "solid color must survive the resample")
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
    // an unsupported TARGET format is None (asset passes through), not
    // Some(empty bytes) with a relabeled media_type
    assert(Multimodal.resizeImage(solid, 4, 4, format = "nosuchfmt").isEmpty)
    val assets = Seq(
      MediaAsset(1L, "image/png", solid, "en", 0L),
      MediaAsset(2L, "text/plain", "hello".getBytes, "en", 5L),
      MediaAsset(3L, "image/png", "broken".getBytes, "en", 0L)).toDS()
    val out = Multimodal.resizeAssets(assets, 16, 16).collect()
      .map(a => a.doc_id -> a).toMap
    val rf = Multimodal.decodeImage(out(1L).payload).get
    assert(rf(0) == 16f && rf(1) == 16f)
    assert(new String(out(2L).payload) == "hello", "non-image untouched")
    assert(new String(out(3L).payload) == "broken",
      "undecodable image passes through")
    // feature extraction dispatches per row: the image row carries true
    // dims, the text row the byte histogram
    val feats = Multimodal.extractFeatures(assets).collect()
      .map(x => x.doc_id -> x.histogram).toMap
    assert(feats(1L)(0) == 64f && feats(1L)(1) == 64f)
    assert(feats(2L).sum > 0.99f && feats(2L).sum < 1.01f)
  }

  test("assets → extractFeatures keeps ids, byte lengths and batch schema") {
    val docs = Seq((1L, "abcd", "en", 4L), (2L, "xy", "de", 2L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val feats = Multimodal.extractFeatures(Multimodal.assets(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len == 4L && feats(2L).byte_len == 2L)
    assert(feats(1L).media_type == "text/plain")
    assert(feats(1L).histogram.length == 16)
  }

  test("propsAgg: JSON k extracted; malformed/missing k counted but null-skipped") {
    val events = Seq(
      ("view", """{"k": 10}"""),
      ("view", """{"k": 20}"""),
      ("view", """{"other": 1}"""),
      ("click", "not json at all"),
      ("click", """{"k": 5}"""))
      .toDF("event_type", "props")
    val out = Multimodal.propsAgg(events).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("view").getAs[Long]("n_events") == 3)
    assert(out("view").getAs[Long]("n_with_k") == 2)
    assert(out("view").getAs[Long]("sum_k") == 30)
    assert(out("view").getAs[Double]("avg_k") == 15.0)
    assert(out("click").getAs[Long]("n_with_k") == 1)
    assert(out("click").getAs[Long]("sum_k") == 5)
  }

  test("frameSample: fixed frames, stride sampling, short tail frame") {
    // 150 chars → frames 0,1,2 (64+64+22); stride 2 keeps 0 and 2
    val text = "ab" * 75
    val docs = Seq((1L, text, "en", 150L), (2L, "", "en", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = Multimodal.frameSample(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_no")) ->
        r.getAs[Long]("frame_len")).toMap
    assert(out.keySet == Set((1L, 0L), (1L, 2L))) // empty doc absent; frame 1 skipped
    assert(out((1L, 0L)) == 64L)
    assert(out((1L, 2L)) == 22L)
  }
}
