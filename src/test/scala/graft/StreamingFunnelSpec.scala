package graft

import graft.ops.Funnel
import graft.streaming.StreamingFunnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The buffered streaming funnel must reproduce the batch chain rows
  * exactly, including when a user's stage-1 event arrives in a LATER
  * microbatch than their stage-2 event (the case an incremental fold
  * gets wrong and buffering exists to fix). */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private val stages = Seq("view", "click", "purchase")

  test("streaming funnel == batch userStages, out-of-order across batches") {
    val rows = Seq(
      // u1 in order: all three stages
      (1L, ts(10), "view"), (1L, ts(40), "click"), (1L, ts(100), "purchase"),
      // u2: click at 20 precedes the view at 50 — batch says stage 1 only
      (2L, ts(50), "view"), (2L, ts(20), "click"),
      // u3: the view arrives in a LATER batch than the click; buffered
      // finalization must still qualify the click (30 >= 5)
      (3L, ts(30), "click"), (3L, ts(5), "view"))
    val batch1 = rows.take(4) :+ rows(5) // u3's click first
    val batch2 = Seq(rows(4), rows(6))   // u2's click, u3's late view
    val stream = MemoryStream[(Long, Timestamp, String)](spark)
    // 1 h watermark: the cross-batch late view (u3) stays INSIDE the
    // lateness tolerance — beyond it, dropping late rows is the correct
    // watermark contract, not a funnel defect
    val out = StreamingFunnel.userStagesStream(
      stream.toDF().toDF("user_id", "ts", "event_type"), stages,
      watermarkDelay = "1 hour")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
      // sentinel advances the watermark far past every buffer's timeout
      stream.addData((999L, ts(100000), "view")); q.processAllAvailable()
      stream.addData((999L, ts(200000), "view")); q.processAllAvailable()

      val got = spark.table("sfunnel")
        .filter(col("user_id") =!= 999L).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getTimestamp(3))).toSet
      val want = Funnel.userStages(
        rows.toDF("user_id", "ts", "event_type"), stages).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
          r.getTimestamp(3))).toSet
      assert(want.nonEmpty && got == want,
        s"only-stream=${got -- want} only-batch=${want -- got}")
      // the late-view case specifically: u3 must reach stage 2
      assert(got.contains((3L, 2, "click", ts(30))))
    } finally q.stop()
  }

  test("chainTimes is order-insensitive (property vs sorted fold)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val evs = Seq.fill(12)((rnd.nextInt(100).toLong,
        stages(rnd.nextInt(3))))
      assert(Funnel.chainTimes(evs, stages) ==
        Funnel.chainTimes(rnd.shuffle(evs), stages))
    }
  }
}
