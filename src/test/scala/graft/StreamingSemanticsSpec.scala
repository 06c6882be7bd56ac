package graft

import graft.fixtures.AdEventGenerator
import graft.streaming.{JsonStreams, StreamingPipelines}
import graft.schema.AdModel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Streaming-only semantics the batch twin cannot show:
 *
 *  - T3 late-data drop: a row older than the watermark is discarded by the
 *    stateful operators instead of mutating an already-emitted window —
 *    Flink's bounded-out-of-orderness behavior (flink/flink_job.sql:15,32).
 *  - Throughput envelope: the reference generator sustains ≈55 ev/s
 *    (EVENT_RATE=50 + ~10% clicks, docker-compose.yml:121); the streaming
 *    pipeline must clear that by a wide margin on one node.
 */
class StreamingSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("late impression behind the watermark is dropped, on-time one is counted (T3)") {
    val imprStream = MemoryStream[String](spark)
    val clickStream = MemoryStream[String](spark)
    def impr(id: String, ts: Long) =
      s"""{"impression_id":"$id","user_id":"u","campaign_id":"camp-1","ad_id":"ad-1","device_type":"mobile","browser":"chrome","event_timestamp":$ts,"cost":0.1}"""
    // the global watermark is the min across BOTH sources — the click
    // stream must advance too or nothing ever finalizes
    def clk(id: String, ts: Long) =
      s"""{"click_id":"$id","impression_id":"none-$id","user_id":"u","event_timestamp":$ts}"""

    val joined = StreamingPipelines.joinedStream(
      JsonStreams.decode(imprStream.toDF().select(col("value")), AdModel.impressionSchema),
      JsonStreams.decode(clickStream.toDF().select(col("value")), AdModel.clickSchema),
      watermarkDelay = "2 seconds")
    val h = 3600000L
    // batch 1 lands BEFORE start: a watermark operator that has never
    // seen data is absent from the min-policy map, so a microbatch racing
    // between the two addData calls would take the watermark from one
    // side alone and drop the other side's batch as late (see
    // StreamingParitySpec for the full account)
    imprStream.addData(impr("a", h), impr("b", h + 120000L))
    clickStream.addData(clk("k1", h + 120000L))
    val q = StreamingPipelines.ctrByCampaign(joined)
      .writeStream.format("memory").queryName("late_ctr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: impression in minute 0 again — now ~2 min behind the
      // watermark (b - 2 s), far beyond the 2 s bound → must be dropped;
      // plus one on-time impression in minute 3
      imprStream.addData(impr("late", h + 1000L), impr("c", h + 180000L))
      clickStream.addData(clk("k2", h + 180000L))
      q.processAllAvailable()
      // flush every window
      (1 to 3).foreach { s =>
        imprStream.addData(impr(s"s$s", h + s * 86400000L))
        clickStream.addData(clk(s"ks$s", h + s * 86400000L))
        q.processAllAvailable()
      }

      val counts = spark.table("late_ctr")
        .filter(col("window_start") < to_timestamp(lit("1970-01-02")))
        .collect()
        .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime ->
          r.getAs[Long]("impression_count")).toMap
      assert(counts == Map(h -> 1L, (h + 120000L) -> 1L, (h + 180000L) -> 1L),
        s"late row not dropped (or on-time rows lost): $counts")
    } finally q.stop()
  }

  test("two-phase distinct rewrite is exact under join fan-out (3 clicks, 1 impression)") {
    // the generator emits <= 1 click per impression, so the golden parity
    // test never exercises fan-out; here one impression matches three
    // distinct clicks inside the bound and a single count(*) over joined
    // rows would report 3 impressions — the two-phase form must say (1, 3)
    val imprStream = MemoryStream[String](spark)
    val clickStream = MemoryStream[String](spark)
    val h = 3600000L
    def impr(id: String, ts: Long) =
      s"""{"impression_id":"$id","user_id":"u","campaign_id":"camp-1","ad_id":"ad-1","device_type":"mobile","browser":"chrome","event_timestamp":$ts,"cost":0.1}"""
    def clkFor(id: String, imprId: String, ts: Long) =
      s"""{"click_id":"$id","impression_id":"$imprId","user_id":"u","event_timestamp":$ts}"""

    val joined = StreamingPipelines.joinedStream(
      JsonStreams.decode(imprStream.toDF().select(col("value")), AdModel.impressionSchema),
      JsonStreams.decode(clickStream.toDF().select(col("value")), AdModel.clickSchema),
      watermarkDelay = "2 seconds")
    // batch 1 before start — same watermark-registration race defense as
    // the late-drop test above
    imprStream.addData(impr("a", h), impr("b", h + 5000L))
    clickStream.addData(
      clkFor("k1", "a", h + 1000L), clkFor("k2", "a", h + 2000L),
      clkFor("k3", "a", h + 3000L))
    val q = StreamingPipelines.ctrByCampaign(joined)
      .writeStream.format("memory").queryName("fanout_ctr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      (1 to 3).foreach { s =>
        imprStream.addData(impr(s"s$s", h + s * 86400000L))
        clickStream.addData(clkFor(s"ks$s", "none", h + s * 86400000L))
        q.processAllAvailable()
      }
      val rows = spark.table("fanout_ctr")
        .filter(col("window_start") < to_timestamp(lit("1970-01-02"))).collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("impression_count") == 2L) // a and b, not 4
      assert(rows.head.getAs[Long]("click_count") == 3L)
      assert(rows.head.getAs[Double]("ctr") == 1.5)
    } finally q.stop()
  }

  test("hopping streaming ctr: per-window counts IDENTICAL to the batch " +
    "twin (HLL++ determinism), overlap factor respected") {
    val imprStream = MemoryStream[String](spark)
    val clickStream = MemoryStream[String](spark)
    val h = 3600000L
    def impr(id: String, ts: Long) =
      s"""{"impression_id":"$id","user_id":"u","campaign_id":"camp-1","ad_id":"ad-1","device_type":"mobile","browser":"chrome","event_timestamp":$ts,"cost":0.1}"""
    def clkFor(id: String, imprId: String, ts: Long) =
      s"""{"click_id":"$id","impression_id":"$imprId","user_id":"u","event_timestamp":$ts}"""
    val imprRows = Seq(impr("a", h + 10000L), impr("b", h + 70000L),
      impr("c", h + 130000L))
    val clickRows = Seq(clkFor("k1", "a", h + 15000L))
    val joined = StreamingPipelines.joinedStream(
      JsonStreams.decode(imprStream.toDF().select(col("value")), AdModel.impressionSchema),
      JsonStreams.decode(clickStream.toDF().select(col("value")), AdModel.clickSchema),
      watermarkDelay = "2 seconds")
    imprStream.addData(imprRows: _*)
    clickStream.addData(clickRows: _*)
    val q = StreamingPipelines.ctrByCampaignHopping(joined)
      .writeStream.format("memory").queryName("hop_ctr")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      (1 to 3).foreach { s =>
        imprStream.addData(impr(s"s$s", h + s * 86400000L))
        clickStream.addData(clkFor(s"ks$s", "none", h + s * 86400000L))
        q.processAllAvailable()
      }
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("window_start") < to_timestamp(lit("1970-01-02")))
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
          r.getAs[Long]("impression_count"), r.getAs[Long]("click_count"),
          r.getAs[Double]("ctr"))).toSet
      val got = canon(spark.table("hop_ctr"))
      // batch twin: the SAME operator over the batch form of the same
      // joined rows — HLL++ is deterministic, so counts match exactly
      val batchJoined = graft.pipelines.AdPipelines.joined(
        graft.ops.EventTime.withEventTime(
          JsonStreams.decode(imprRows.toDF("value"), AdModel.impressionSchema)),
        graft.ops.EventTime.withEventTime(
          JsonStreams.decode(clickRows.toDF("value"), AdModel.clickSchema)))
        .select(col("i.impression_id"), col("i.campaign_id"),
          col("i.event_time"), col("c.click_id"))
      val want = canon(StreamingPipelines.ctrByCampaignHopping(batchJoined))
      assert(want.nonEmpty && got == want,
        s"only-stream=${got -- want} only-batch=${want -- got}")
      // 3 impressions × overlap 2 = 6 window-assignments
      assert(got.toSeq.map(_._2).sum == 6L)
      // the window covering both a and its click reports ctr 1/2 when b
      // joins it (a,b with one click) — sanity that hop windows overlap
      assert(got.exists(r => r._2 == 2L))
    } finally q.stop()
  }

  test("streaming pipeline clears the reference's ~55 ev/s envelope") {
    // 20 minutes × 5 campaigns × 60 impressions (+clicks) ≈ 6.6k events
    val ev = AdEventGenerator.generate(startMs = 3600000L, minutes = 20,
      impressionsPerMinutePerCampaign = 60, campaigns = 5)
    // pre-serialize all waves (time-ordered arrival) outside the timed region
    val cuts = Seq(Long.MinValue) ++ (1 to 3).map(i => 3600000L + i * 5 * 60000L) :+ Long.MaxValue
    val imprWaves = cuts.sliding(2).map { case Seq(lo, hi) =>
      ev.impressions.filter(e => e.event_timestamp >= lo && e.event_timestamp < hi)
        .toDF().toJSON.collect().toIndexedSeq
    }.toIndexedSeq
    val clickWaves = cuts.sliding(2).map { case Seq(lo, hi) =>
      ev.clicks.filter(e => e.event_timestamp >= lo && e.event_timestamp < hi)
        .toDF().toJSON.collect().toIndexedSeq
    }.toIndexedSeq
    val nEvents = imprWaves.map(_.length).sum + clickWaves.map(_.length).sum

    val imprStream = MemoryStream[String](spark)
    val clickStream = MemoryStream[String](spark)
    val joined = StreamingPipelines.joinedStream(
      JsonStreams.decode(imprStream.toDF().select(col("value")), AdModel.impressionSchema),
      JsonStreams.decode(clickStream.toDF().select(col("value")), AdModel.clickSchema),
      watermarkDelay = "2 seconds")
    // first wave before start — watermark-registration race defense; the
    // timed region covers its processing (processAllAvailable), so no
    // events escape the throughput measurement
    imprStream.addData(imprWaves.head)
    clickStream.addData(clickWaves.head)
    val q = StreamingPipelines.ctrByCampaign(joined)
      .writeStream.format("memory").queryName("throughput_ctr")
      .outputMode("append").start()
    try {
      val t0 = System.nanoTime()
      q.processAllAvailable()
      imprWaves.tail.zip(clickWaves.tail).foreach { case (iw, cw) =>
        imprStream.addData(iw)
        clickStream.addData(cw)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = nEvents / secs
      info(f"$nEvents events in $secs%.1f s = $rate%.0f ev/s")
      assert(rate >= 55.0, f"throughput $rate%.1f ev/s below the reference envelope")
    } finally q.stop()
  }
}
