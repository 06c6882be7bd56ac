package graft

import graft.ops.Transitions
import graft.streaming.StreamingTransitions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The buffered streaming hop extractor must reproduce the batch
  * transition matrix exactly, including when a user's earlier event
  * arrives in a LATER microbatch (the case an incremental last-event
  * fold chains wrongly and can never repair). */
class StreamingTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("streamed hops aggregate to the batch matrix, out-of-order across batches") {
    val rows = Seq(
      (1L, ts(10), 1L, "view"), (1L, ts(40), 2L, "click"),
      (1L, ts(100), 3L, "purchase"),
      // u2's view at 20 arrives in a LATER batch than the click at 50:
      // an incremental fold would emit __start->click and click->view;
      // the buffered chain must emit __start->view, view->click
      (2L, ts(50), 5L, "click"), (2L, ts(20), 4L, "view"),
      // u3: equal timestamps, event_id breaks the tie
      (3L, ts(30), 7L, "click"), (3L, ts(30), 6L, "view"))
    val batch1 = Seq(rows(0), rows(1), rows(3), rows(5))
    val batch2 = Seq(rows(2), rows(4), rows(6))
    val stream = MemoryStream[(Long, Timestamp, Long, String)](spark)
    val out = StreamingTransitions.hopsStream(
      stream.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      watermarkDelay = "1 hour")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("shops")
      .outputMode("append").start()
    try {
      stream.addData(batch1: _*); q.processAllAvailable()
      stream.addData(batch2: _*); q.processAllAvailable()
      stream.addData((999L, ts(100000), 100L, "view")); q.processAllAvailable()
      stream.addData((999L, ts(200000), 101L, "view")); q.processAllAvailable()

      val got = spark.table("shops")
        .filter(col("user_id") =!= 999L)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n_transitions"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = Transitions.matrix(
        rows.toDF("user_id", "ts", "event_id", "event_type")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(want.nonEmpty && got == want,
        s"only-stream=${got -- want} only-batch=${want -- got}")
      // the tie case specifically: u3's view (id 6) precedes its click
      // (id 7), so all three users hop view->click — a reversed tie
      // would instead emit a __start->click entry
      assert(got.contains(("view", "click", 3L)))
      assert(!got.exists(t => t._1 == "__start" && t._2 == "click"))
    } finally q.stop()
  }

  test("hopSeq is arrival-order-insensitive (property vs shuffled input)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val evs = Seq.tabulate(12)(i =>
        (rnd.nextInt(50).toLong, i.toLong, Seq("a", "b", "c")(rnd.nextInt(3))))
      assert(Transitions.hopSeq(evs) == Transitions.hopSeq(rnd.shuffle(evs)))
    }
  }
}
