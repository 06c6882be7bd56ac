package graft

import graft.ops.AnomalyDetect
import graft.streaming.StreamingZscore
import graft.streaming.StreamingZscore.SeriesPoint
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/**
 * Streaming z-score parity: the ring-buffer `flatMapGroupsWithState`
 * twin must emit EXACTLY the batch window-function form's alerts — same
 * rows, same doubles (the twin replays Catalyst's own Average/Welford
 * arithmetic, see [[StreamingZscore]]).
 */
class StreamingZscoreSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded noisy series with injected outliers, 3 campaigns x 48 hours. */
  private def series(): Seq[SeriesPoint] = {
    val rnd = new scala.util.Random(42)
    for {
      c <- 0 until 3
      h <- 0 until 48
    } yield {
      val base = 100.0 + 10.0 * c
      val noise = rnd.nextInt(11) - 5 // [-5, 5], discrete
      val outlier =
        if (h == 20) 80.0 + 15.0 * c // HIGH spike
        else if (h == 35) -70.0      // LOW dip
        else 0.0
      SeriesPoint(new Timestamp((h + 1) * 3600000L), s"camp-$c",
        base + noise + outlier)
    }
  }

  private def batchAlerts(rows: Seq[SeriesPoint]) =
    AnomalyDetect.zscoreAlerts(
      rows.toDF().withColumnRenamed("window_end", "window_end"),
      valueCol = "value", timeCol = "window_end")
      .collect().map(_.toSeq).toSet

  test("ring-buffer streaming twin emits the batch alerts across micro-batches") {
    val rows = series().sortBy(p => (p.window_end.getTime, p.campaign_id))
    val want = batchAlerts(rows)
    assert(want.nonEmpty, "fixture must produce alerts")

    val stream = MemoryStream[SeriesPoint](spark)
    val q = StreamingZscore.alerts(stream.toDF())
      .writeStream.format("memory").queryName("zscore_stream")
      .outputMode("append").start()
    try {
      val cut1 = rows.length / 3
      val cut2 = 2 * rows.length / 3
      stream.addData(rows.slice(0, cut1)); q.processAllAvailable()
      stream.addData(rows.slice(cut1, cut2)); q.processAllAvailable()
      stream.addData(rows.slice(cut2, rows.length)); q.processAllAvailable()
      val got = spark.table("zscore_stream").collect().map(_.toSeq).toSet
      assert(got == want,
        s"alert mismatch: only-streaming=${got -- want}, only-batch=${want -- got}")
    } finally q.stop()
  }

  test("batch execution of the state operator matches the window-function form") {
    val rows = series()
    val got = StreamingZscore.alerts(rows.toDF()).toDF()
      .collect().map(_.toSeq).toSet
    assert(got == batchAlerts(rows))
  }

  test("warm-up and zero-variance gates match batch semantics") {
    // constant series: sd = 0 everywhere → no alerts from either form
    val flat = (1 to 10).map(h =>
      SeriesPoint(new Timestamp(h * 3600000L), "c", 5.0))
    assert(StreamingZscore.alerts(flat.toDF()).collect().isEmpty)
    assert(batchAlerts(flat).isEmpty)
  }
}
