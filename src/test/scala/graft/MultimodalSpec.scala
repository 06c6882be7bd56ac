package graft

import graft.multimodal.Multimodal

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
