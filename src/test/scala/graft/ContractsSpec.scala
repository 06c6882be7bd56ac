package graft

import graft.contracts.Contracts
import graft.contracts.Contracts._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Data-contract semantics: FALSE-or-NULL violates, row-grain checks
 * share one aggregation, uniqueness counts both members of a duplicated
 * key, and the quarantine projection is stateless (stream ≡ batch).
 */
class ContractsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Option("view"), Option(10.0)),
    (1L, Option("view"), Option(20.0)),     // dup id
    (2L, Option("click"), Option(-5.0)),    // value out of range
    (3L, None, Option(30.0)),               // null enum
    (4L, Option("weird"), Option(40.0)),    // bad enum
    (5L, Option("purchase"), None))         // null value
    .toDF("id", "etype", "v")

  test("validate: one row per check, FALSE-or-NULL violates, both dup " +
    "members count") {
    val report = Contracts.validate(fixture,
      checks = Seq(
        notNull("etype"),
        inSet("etype", Seq("view", "click", "purchase")),
        inSetOrNull("etype", Seq("view", "click", "purchase")),
        inRange("v", 0.0, 100.0)),
      uniqueKeys = Seq(Seq("id")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(report("not_null(etype)") == ((1L, 6L, false)))
    // null etype AND 'weird' both violate the strict enum
    assert(report("in_set(etype)") == ((2L, 6L, false)))
    // the tolerant enum forgives the NULL, keeps flagging 'weird'
    assert(report("in_set_or_null(etype)") == ((1L, 6L, false)))
    // -5.0 out of range AND the NULL value both violate
    assert(report("in_range(v,0.0,100.0)") == ((2L, 6L, false)))
    // both rows of the duplicated id are violations
    assert(report("unique(id)") == ((2L, 6L, false)))
  }

  test("parseCheck: every spec kind reproduces its builder constructor; " +
    "timestamp arguments keep their colons; bad specs throw") {
    val pairs = Seq(
      "not_null:etype" -> notNull("etype"),
      "in_range:v:0|100" -> inRange("v", 0.0, 100.0),
      "in_set:etype:view|click" -> inSet("etype", Seq("view", "click")),
      "in_set_or_null:etype:view|click" ->
        inSetOrNull("etype", Seq("view", "click")),
      "ts_between:ts:2024-01-01 00:00:00|2024-02-01 00:00:00" ->
        tsBetween("ts", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
      "length_at_most:etype:5" -> lengthAtMost("etype", 5))
    val df = fixture.withColumn("ts",
      to_timestamp(lit("2024-01-15 12:00:00")))
    pairs.foreach { case (spec, built) =>
      val parsed = Contracts.parseCheck(spec)
      assert(parsed.name == built.name, spec)
      // same verdicts row for row, not just the same name
      val got = df.select(parsed.holds).collect().map(_.get(0)).toSeq
      val want = df.select(built.holds).collect().map(_.get(0)).toSeq
      assert(got == want, spec)
    }
    assert(intercept[IllegalArgumentException](
      Contracts.parseCheck("no_such:x")).getMessage.contains("no_such"))
    assert(intercept[IllegalArgumentException](
      Contracts.parseCheck("in_range:v:1")).getMessage.contains("argument"))
    assert(intercept[IllegalArgumentException](
      Contracts.parseCheck("justone")).getMessage.contains("malformed"))
  }

  test("validate: a clean table passes every check") {
    val clean = Seq((1L, "view", 1.0), (2L, "click", 2.0))
      .toDF("id", "etype", "v")
    val report = Contracts.validate(clean,
      Seq(notNull("etype"), inRange("v", 0.0, 10.0)),
      uniqueKeys = Seq(Seq("id"))).collect()
    assert(report.length == 3)
    assert(report.forall(_.getBoolean(3)))
    assert(report.forall(_.getLong(1) == 0L))
  }

  test("quarantine: violation lists in declaration order; per-row sums " +
    "equal the validate report; clean rows keep") {
    val checks = Seq(
      notNull("etype"),
      inSet("etype", Seq("view", "click", "purchase")),
      inRange("v", 0.0, 100.0))
    val q = Contracts.quarantine(fixture, checks)
    val rows = q.select("id", "v", "violations", "keep").collect()
    // the null-enum row violates notNull AND inSet, in declaration order
    val nullEnum = rows.find(r => r.isNullAt(1) == false &&
      r.getDouble(1) == 30.0).get
    assert(nullEnum.getString(2) == "not_null(etype);in_set(etype)")
    assert(!nullEnum.getBoolean(3))
    // clean rows carry an empty list and keep=true
    val clean = rows.find(r => !r.isNullAt(1) && r.getDouble(1) == 10.0).get
    assert(clean.getString(2) == "" && clean.getBoolean(3))
    // per-check totals from the row grain == the validate report
    val fromRows = checks.map(c => c.name ->
      rows.count(r => r.getString(2).split(";").contains(c.name)).toLong).toMap
    val fromReport = Contracts.validate(fixture, checks).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromRows == fromReport)
  }

  test("quarantine is stateless on a stream: rows equal the batch twin " +
    "across microbatch boundaries") {
    val checks = Seq(notNull("etype"),
      inSet("etype", Seq("view", "click", "purchase")),
      inRange("v", 0.0, 100.0))
    val data = Seq(
      (1L, "view", 10.0), (2L, "bad", 20.0), (3L, "click", -1.0),
      (4L, "purchase", 5.0), (5L, "view", 101.0), (6L, "nope", 7.0))
    val stream = MemoryStream[(Long, String, Double)](spark)
    val out = Contracts.quarantine(
      stream.toDF().toDF("id", "etype", "v"), checks)
    assert(out.isStreaming)
    stream.addData(data.take(3))
    val q = out.writeStream.format("memory").queryName("contracts_q")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(data.drop(3))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
      val got = spark.table("contracts_q")
        .select("id", "violations", "keep").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      val batch = Contracts.quarantine(
          data.toDF("id", "etype", "v"), checks)
        .select("id", "violations", "keep").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      assert(got == batch)
      assert(got.count(!_._3) == 4)
    } finally q.stop()
  }

  test("gated ingest + dead-letter twin: violators land on the " +
    "quarantine topic with their lists, never on curated") {
    import graft.streaming.StreamingCurationJobs
    import java.nio.file.{Files, Paths}
    val checks = Seq(notNull("text"),
      inSet("lang", Seq("en", "de", "fr", "es")))
    val work = Files.createTempDirectory("contracts_dlq").toString
    val topic = s"$work/docs_topic"
    Files.createDirectories(Paths.get(topic))
    // a text that passes the ingest quality gate (stopwords + >=30
    // unique tokens, no repetition)
    val goodText = ("the and for with from" +:
      (1 to 35).map(i => f"tok$i%03d")).mkString(" ")
    val t = "2024-01-01T00:00:00.000Z"
    Files.write(Paths.get(s"$topic/w.json"), Seq(
      s"""{"doc_id": 1, "text": "$goodText", "lang": "en", "source": "a", "ingest_time": "$t"}""",
      s"""{"doc_id": 2, "lang": "en", "source": "a", "ingest_time": "$t"}""",
      s"""{"doc_id": 3, "text": "$goodText", "lang": "xx", "source": "a", "ingest_time": "$t"}""",
      s"""{"doc_id": 4, "text": "$goodText extra", "lang": "de", "source": "a", "ingest_time": "$t"}""")
      .mkString("\n").getBytes)

    val bench = Seq((900L, "completely unrelated benchmark prompt"))
      .toDF("doc_id", "text")
    val ingest = StreamingCurationJobs.runIngestJob(
      spark, topic, bench, work, contractChecks = checks)
    val dlq = StreamingCurationJobs.runQuarantineJob(
      spark, topic, checks, work)
    try { ingest.processAllAvailable(); dlq.processAllAvailable() }
    finally { ingest.stop(); dlq.stop() }

    val curated = spark.read.schema(StreamingCurationJobs.curatedSchema)
      .json(s"$work/curated").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(curated == Set(1L, 4L))
    val quarantined = spark.read
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, " +
        "ingest_time TIMESTAMP, violations STRING")
      .json(s"$work/quarantine")
      .select("doc_id", "violations").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(quarantined == Set(
      (2L, "not_null(text)"), (3L, "in_set(lang)")))
  }

  test("violation monitor: stream equals the batch twin per window, " +
    "including late-within-watermark arrivals; __rows carries totals") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val checks = Seq(notNull("etype"),
      inSet("etype", Seq("view", "click")))
    // two 1-minute windows; one late (but within-watermark) arrival
    val rows = Seq(
      (1L, Option("view"), ts(10)), (2L, Option("bad"), ts(20)),
      (3L, None, ts(70)), (4L, Option("click"), ts(80)),
      (5L, Option("view"), ts(15))) // late for window 1, inside watermark
    val stream = MemoryStream[(Long, Option[String], java.sql.Timestamp)](spark)
    val out = Contracts.violationMonitor(
      stream.toDF().toDF("id", "etype", "ingest_time"), checks,
      watermarkDelay = "10 minutes")
    assert(out.isStreaming)
    stream.addData(rows.take(4))
    val q = out.writeStream.format("memory").queryName("viol_mon")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(rows.drop(4)) // the late arrival, next microbatch
      q.processAllAvailable()
      // close every window: an event far past the watermark horizon
      stream.addData(Seq((99L, Option("view"), ts(100000))))
      q.processAllAvailable()
      val got = spark.table("viol_mon")
        .filter(col("window_start") < ts(100000))
        .select("window_start", "constraint", "n").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
          r.getLong(2))).toSet
      val batch = Contracts.violationMonitor(
          rows.toDF("id", "etype", "ingest_time"), checks)
        .filter(col("window_start") < ts(100000))
        .select("window_start", "constraint", "n").collect()
        .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
          r.getLong(2))).toSet
      assert(got == batch, s"only-stream=${got -- batch} " +
        s"only-batch=${batch -- got}")
      // totals: window 1 holds 3 rows (incl. the late one), window 2: 2
      assert(got.contains((0L, "__rows", 3L)))
      assert(got.contains((60L, "__rows", 2L)))
      assert(got.contains((0L, "in_set(etype)", 1L)))
      assert(got.contains((60L, "not_null(etype)", 1L)))
    } finally q.stop()
  }

  test("registered contract queries discriminate on the real tables") {
    val report = graft.queries.DataPipelineQueries
      .eventsContract(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(report.size == 7)
    assert(report("not_null(event_id)"))
    assert(report("unique(event_id)"))
    assert(!report("in_range(value,0.0,150.0)")) // real violations
    val quarantined = graft.queries.DataPipelineQueries
      .docsQuarantine(spark, "/root/testdata/sf0.001")
    val n = quarantined.count()
    val kept = quarantined.filter(col("keep")).count()
    assert(kept > 0 && kept < n) // both outcomes present
  }
}
