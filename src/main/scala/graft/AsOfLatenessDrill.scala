package graft

import graft.ops.AsOfJoin
import graft.streaming.StreamingAsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/**
 * Quantifies the progressive-finalize lateness trade
 * ([[graft.streaming.StreamingAsOfJoin]] `progressive` scaladoc) — the
 * r15 verdict's ask #3: the trade was STATED precisely (an event
 * arriving with ts already below the watermark may miss pruned
 * intermediate lefts) but never given a number. This drill injects
 * beyond-watermark arrivals at controlled rates and depths into the
 * attribution topology and measures attribution differences against
 * the batch oracle for BOTH modes:
 *
 *  - events arrive in event-time order except a hash-chosen fraction
 *    `rate`, whose ARRIVAL is delayed by `depth ×` the watermark delay
 *    (depth < 1 = in-bound lateness the watermark contract admits;
 *    depth > 1 = the excluded class);
 *  - the stream is fed in arrival-time-ordered microbatches, flushed
 *    with a far-future sentinel key, and each mode's (click →
 *    matched view) map is diffed against [[AsOfJoin.lastBefore]] over
 *    the complete event set;
 *  - measured outcome (BASELINE.md r16 — this drill settled it): the
 *    two modes are IDENTICAL at every (rate, depth) cell. A
 *    beyond-bound arrival is dropped by the stateful operator's
 *    late-input filter BEFORE either mode's buffer, so the class
 *    progressive pruning could have missed never reaches the default
 *    buffer either — beyond-bound diffs (both modes vs batch) are the
 *    watermark contract itself, not a mode cost. The small in-bound
 *    residual is the drill's own 10 s arrival-batch quantization,
 *    mode-identical. Consequence: progressive's 16×-smaller flat
 *    hot-key state (r15 attribution ladder) comes at ZERO output cost,
 *    which is why it is now the topology default.
 *
 * One JSON line per (rate, depth) cell.
 *
 *   sbt "runMain graft.AsOfLatenessDrill"
 */
object AsOfLatenessDrill {

  private def hashFrac(i: Long, salt: Long): Double =
    math.abs(scala.util.hashing.MurmurHash3.productHash((i, salt))).toDouble /
      Int.MaxValue

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nEvents = sys.env.getOrElse("SPARK_GRAFT_ASOF_EVENTS", "6000").toInt
    val nUsers = 200
    val spanMs = 400000L
    val wmMs = 10000L // watermark delay AND the depth unit
    val batchMs = 10000L // arrival-time per microbatch

    // deterministic event set: global event-time order, per-user
    // interleaved views (60%) and clicks (40%)
    final case class Ev(id: Long, user: Long, ts: Long, isView: Boolean)
    val events = (0L until nEvents).map { i =>
      Ev(i, (hashFrac(i, 11) * nUsers).toLong,
        i * spanMs / nEvents,
        hashFrac(i, 13) < 0.6)
    }
    val views = events.filter(_.isView)
    val clicks = events.filterNot(_.isView)

    // batch oracle over the COMPLETE set (arrival order is irrelevant
    // to the batch operator)
    val oracle = AsOfJoin.lastBefore(
        views.map(e => (e.id, e.user, new Timestamp(e.ts)))
          .toDF("event_id", "user_id", "ts"),
        clicks.map(e => (e.id, e.user, new Timestamp(e.ts)))
          .toDF("event_id", "user_id", "ts"),
        key = "user_id", ts = "ts", leftId = "event_id",
        rightId = "event_id")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("matched_event_id")).map(_.toLong))
      .toMap

    def runMode(rate: Double, depthX: Double,
                progressive: Boolean): Map[Long, Option[Long]] = {
      val delayed = events.map { e =>
        val late = hashFrac(e.id, 17) < rate
        (e, if (late) e.ts + (depthX * wmMs).toLong else e.ts)
      }
      val batches = delayed.groupBy(_._2 / batchMs).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      val vStream = MemoryStream[(Long, Long, Timestamp)](spark)
      val cStream = MemoryStream[(Long, Long, Timestamp)](spark)
      def df(s: MemoryStream[(Long, Long, Timestamp)]) =
        s.toDF().toDF("event_id", "user_id", "ts")
      // finalize horizon far above the per-user inter-event gap
      // (~13 s): a small horizon splits keys into fresh epochs between
      // their own events and the epoch misses drown the lateness signal
      // (first draft measured a 21% baseline diff at IN-BOUND depth
      // from exactly this)
      val out = StreamingAsOfJoin.lastBeforeStream(df(vStream), df(cStream),
        key = "user_id", ts = "ts", leftId = "event_id",
        rightId = "event_id", watermarkDelay = s"${wmMs / 1000} seconds",
        finalizeDelayMs = 120000L, progressive = progressive)
      val name = s"asof_lat_${(rate * 100).toInt}_${(depthX * 10).toInt}_$progressive"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b =>
          vStream.addData(b.filter(_.isView)
            .map(e => (e.id, e.user, new Timestamp(e.ts))))
          cStream.addData(b.filterNot(_.isView)
            .map(e => (e.id, e.user, new Timestamp(e.ts))))
          q.processAllAvailable()
        }
        // two far-future sentinel waves on a throwaway key flush every
        // real key's inactivity timeout
        for (s <- Seq(1L, 2L)) {
          vStream.addData((900000L + s, 999999L,
            new Timestamp(spanMs * (4 + s))))
          q.processAllAvailable()
        }
        spark.table(name).filter(col("user_id") =!= 999999L)
          .collect()
          .map(r => r.getAs[Long]("event_id") ->
            Option(r.getAs[java.lang.Long]("matched_event_id")).map(_.toLong))
          .toMap
      } finally q.stop()
    }

    for (rate <- Seq(0.01, 0.05, 0.10); depthX <- Seq(0.5, 2.0, 4.0)) {
      val nLate = events.count(e => hashFrac(e.id, 17) < rate)
      val dflt = runMode(rate, depthX, progressive = false)
      val prog = runMode(rate, depthX, progressive = true)
      def diffs(got: Map[Long, Option[Long]]): Int =
        clicks.count(c => got.get(c.id) != Some(oracle(c.id)))
      val (dd, dp) = (diffs(dflt), diffs(prog))
      println(f"""{"metric":"asof_lateness","rate":$rate,"depth_x":$depthX,""" +
        f""""events":$nEvents,"clicks":${clicks.size},"late_events":$nLate,""" +
        f""""diff_default":$dd,"diff_progressive":$dp,""" +
        f""""miss_rate_default":${dd.toDouble / clicks.size}%.4f,""" +
        f""""miss_rate_progressive":${dp.toDouble / clicks.size}%.4f}""")
    }
    spark.stop()
  }
}
