package graft

import graft.streaming.{JsonStreams, StreamThroughput, StreamingCuration, StreamingCurationJobs}
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-ablation bisect of the curation-ingest wall — the diagnostic
  * behind the r13 fix: runs the SAME feeder topology as
  * `StreamThroughput.ingestJobStep` against ablated consumers at the
  * same offered rate, so the wall's location is measured, not guessed.
  * The r12 hypothesis (Jackson decode of the text payload) was WRONG:
  * raw passthrough, single decode, DOUBLE decode, shingling, stateful
  * dedup and the quality gate each kept pace at 16k docs/s; the lone
  * falling-behind stage was the Bloom candidate predicate — interpreted
  * exists/forall lambdas at ~k×shingles probes per document — fixed by
  * the whole-document graftshim.BloomShingleHit expression (receipts in
  * BASELINE.md r13). `PROBE_MODE=job` steps the real deployed job
  * (json + binary) instead of the ablation stages. Usage:
  *
  *   PROBE_MODE=job PROBE_RATES=16000,24000 sbt "runMain graft.IngestWallProbe"
  */
object IngestWallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val feedMs = sys.env.getOrElse("PROBE_FEED_MS", "15000").toLong
    val rates = sys.env.getOrElse("PROBE_RATES", "8000,16000,24000")
      .split(",").map(_.trim.toInt).toSeq

    // PROBE_MODE=job: run the REAL deployed ingest job at the stepped
    // rates (json then binary) instead of the ablation stages
    if (sys.env.get("PROBE_MODE").contains("job")) {
      StreamThroughput.ingestJobStep(spark, rate = 500, feedMs = 4000L)
      StreamThroughput.ingestJobStep(spark, rate = 500, feedMs = 4000L,
        codec = "binary")
      for (r <- rates)
        println(StreamThroughput.ingestJobStep(spark, r, feedMs).json)
      for (r <- rates)
        println(StreamThroughput.ingestJobStep(spark, r, feedMs,
          codec = "binary").json)
      spark.stop()
      return
    }

    def step(name: String, rate: Int,
             consume: (String, String) => DataFrame): Unit = {
      val root = java.nio.file.Files.createTempDirectory(s"probe-$name")
      val docs = root.resolve("docs")
      val feeder = JsonStreams.writeValueTopic(
        JsonStreams.encode(StreamThroughput.docStream(spark, rate)).coalesce(2),
        docs.toString, root.resolve("_ck/feed").toString)
      // the feeder is covered by this try from the moment it starts —
      // a consumer that fails to CONSTRUCT must not leave the feeder
      // writing for the rest of the JVM, skewing every later step
      // (r13 review finding)
      var q: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
      try {
        val deadline = System.nanoTime() + 30000L * 1000000L
        while (!java.nio.file.Files.isDirectory(docs.resolve("_spark_metadata"))
               && System.nanoTime() < deadline) Thread.sleep(50L)
        val out = consume(docs.toString, root.resolve("work").toString)
        q = Some(JsonStreams.writeTopic(out, root.resolve("out").toString,
          root.resolve("_ck/out").toString))
        val t0 = System.nanoTime()
        Thread.sleep(feedMs)
        feeder.stop()
        val tFeedEnd = System.nanoTime()
        q.foreach(_.processAllAvailable())
        q.foreach(_.processAllAvailable())
        val tDrain = System.nanoTime()
        val n = spark.read.text(docs.toString).count()
        val feedWall = (tFeedEnd - t0) / 1e6
        val drain = (tDrain - tFeedEnd) / 1e6
        val eps = n * 1000.0 / ((tDrain - t0) / 1e6)
        println(f"""{"probe":"$name","rate":$rate,"in":$n,"feed_ms":${feedWall}%.0f,"drain_ms":${drain}%.0f,"events_per_sec":${eps}%.0f}""")
      } finally {
        if (feeder.isActive) feeder.stop()
        q.foreach(_.stop())
        org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
      }
    }

    val schema = StreamingCurationJobs.docSchema

    def decoded(topic: String): DataFrame = JsonStreams.decode(
      spark.readStream.option("maxFilesPerTrigger", 10000).text(topic), schema)

    // raw passthrough: no decode at all — the topology/sink floor
    def rawOnly(topic: String, work: String): DataFrame =
      spark.readStream.option("maxFilesPerTrigger", 10000).text(topic)
        .select(col("value").as("text"))

    // decode only
    def decodeOnly(topic: String, work: String): DataFrame =
      decoded(topic).select(col("doc_id"), col("text"))

    // decode run TWICE via a cand-style union (the exclusion's shape,
    // minus the bloom probes and join)
    def decodeTwice(topic: String, work: String): DataFrame = {
      val d = decoded(topic)
      d.filter(pmod(col("doc_id"), lit(2)) === 0)
        .unionByName(d.filter(pmod(col("doc_id"), lit(2)) =!= 0))
        .select(col("doc_id"), col("text"))
    }

    // decode + the real exclusion (bloom + union + anti join)
    def exclusion(topic: String, work: String): DataFrame = {
      val benchIndex = StreamingCuration
        .benchShingleIndex(StreamThroughput.benchDocs(spark), 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      StreamingCurationJobs.decontaminateExclude(decoded(topic), benchIndex, 5)
        .select(col("doc_id"), col("text"))
    }

    // decode + shingling alone (tokens -> 5-gram concat -> distinct),
    // single pass, no bloom, no union
    def shingle(topic: String, work: String): DataFrame =
      decoded(topic).select(col("doc_id"),
        size(array_distinct(graft.text.TextOps.shingles(
          graft.text.TextOps.tokens(col("text")), 5))).as("ns"),
        col("text"))

    // decode + the bloom candidate predicate evaluated ONCE (single
    // filter branch, no union, no join)
    def bloom1x(topic: String, work: String): DataFrame = {
      val benchIndex = StreamingCuration
        .benchShingleIndex(StreamThroughput.benchDocs(spark), 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nShingles = benchIndex.count()
      var m = 1 << 16
      while (m < 16L * nShingles && m < (1 << 23)) m <<= 1
      def pos(i: Int, c: org.apache.spark.sql.Column) =
        pmod(xxhash64(lit(i), c), lit(m))
      val words = new Array[Long](m / 64)
      benchIndex
        .select(explode(array((0 until 5).map(i =>
          pos(i, col("shingle"))): _*)).as("p"))
        .groupBy((col("p") / 64).cast("int").as("w"))
        .agg(bit_or(expr("shiftleft(1L, cast(p % 64 as int))")).as("bits"))
        .collect().foreach(r => words(r.getInt(0)) = r.getLong(1))
      val bm = typedLit(words.toSeq)
      def bitSet(p: org.apache.spark.sql.Column) =
        call_function("getbit",
          element_at(bm, (p / 64).cast("int") + 1), (p % 64).cast("int")) === 1
      val shingleArr = array_distinct(graft.text.TextOps.shingles(
        graft.text.TextOps.tokens(col("text")), 5))
      val candidate = exists(shingleArr, s =>
        forall(array((0 until 5).map(i => pos(i, s)): _*), p => bitSet(p)))
      decoded(topic).filter(!candidate).select(col("doc_id"), col("text"))
    }

    // decode + watermarked exact dedup (stateful)
    def dedup(topic: String, work: String): DataFrame =
      StreamingCuration.exactDedup(decoded(topic),
        timeCol = "ingest_time", watermarkDelay = "10 seconds")
        .select(col("doc_id"), col("text"))

    // decode + quality gate
    def gate(topic: String, work: String): DataFrame =
      TextAnalysis.qualityGate(decoded(topic),
          passThrough = Seq("text", "ingest_time"))
        .filter(col("keep"))
        .select(col("doc_id"), col("text"))

    // warm each consumer shape once
    for ((name, fn) <- Seq(
        ("shingle", shingle _), ("bloom1x", bloom1x _),
        ("exclusion", exclusion _)))
      step(s"warm-$name", 500, fn)

    for (r <- rates;
         (name, fn) <- Seq(
           ("shingle", shingle _), ("bloom1x", bloom1x _),
           ("exclusion", exclusion _)))
      step(name, r, fn)

    spark.stop()
  }
}
