package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/**
 * Unicode slow-path receipt — the r15 verdict's ask #4: the registered
 * `text_stats_unicode` bench number rides the `isNormalized` ASCII fast
 * path of [[graftshim.NfcNormalize]] (testdata is pure ASCII), so the
 * COST of actual normalization at scale was unmeasured. This main:
 *
 *  1. generates a genuinely DECOMPOSED multi-script corpus at the
 *     sf0.1 grain (same row count and text-length profile as the
 *     driver's documents table; every doc mixes combining-mark accents
 *     — the NFC slow path — with Cyrillic, CJK and precomposed Latin
 *     from the KnobFuzzSpec cross-engine-proven character pool);
 *  2. times the unicode-knob'd operators on the ASCII corpus vs the
 *     decomposed one (same plans, only the data differs — the delta IS
 *     the normalize-allocation cost), reporting seconds per run and
 *     extrapolated cost per 100 k docs;
 *  3. dumps the unicode queries' outputs + their oracle SQL for the
 *     decomposed corpus, so `tools/check.py <work>/out <work>` runs the
 *     DRIVER'S OWN value gate (DuckDB nfc_normalize) on non-Latin text
 *     at this grain — the oracle-green-at-scale half of the ask.
 *
 *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.UnicodeScale /tmp/graft_uniscale"
 *   python3 tools/check.py /tmp/graft_uniscale/out /tmp/graft_uniscale
 */
object UnicodeScale {

  /** Cross-engine-proven pool (KnobFuzzSpec r15): ASCII, precomposed
    * and DECOMPOSED accents, Cyrillic, CJK, digits, separators. The
    * decomposed entries guarantee `isNormalized` fails and the
    * normalize allocation actually runs. */
  private val pool: IndexedSeq[String] = IndexedSeq(
    "a", "B", "z", "7", "é", "É", "ö", "Ж", "д", "щ", "Д", "漢", "字",
    "学", "é", "ö", "À", "ú", " ", ".", ",", "-",
    " ", " ")

  def multiScriptDocs(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val langs = IndexedSeq("ru", "zh", "de", "fr", "en")
    val rows = (0L until n.toLong).map { i =>
      val rnd = new scala.util.Random(9000L + i)
      val len = 200 + rnd.nextInt(300)
      val text = (0 until len).map(_ => pool(rnd.nextInt(pool.length)))
        .mkString
      (i, text, langs((i % langs.length).toInt), s"src${i % 20}",
        text.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse("/tmp/graft_uniscale")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count().toInt
    Files.createDirectories(Paths.get(work))
    // single-FILE parquet, like the driver's testdata: the DuckDB gate
    // (tools/check.py) opens '<dir>/documents.parquet' as one file
    multiScriptDocs(spark, nDocs)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$work/_docs_tmp")
    val part = {
      val s = Files.list(Paths.get(s"$work/_docs_tmp"))
      try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .find(_.toString.endsWith(".parquet")).get
      finally s.close()
    }
    Files.move(part, Paths.get(s"$work/documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$work/_docs_tmp"))

    val uniQueries = Seq("text_stats", "text_stats_unicode", "dedup_unicode",
      "dedup_normalized")
    // force full evaluation without letting column pruning delete the
    // projection (the count() bisect lie — verify skill)
    def force(df: DataFrame): Long = df.agg(max(xxhash64(
      struct(df.columns.toIndexedSeq.map(col): _*)))).collect()(0).getLong(0)
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      force(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both corpora once (plan/codegen constants + memoized token
    // frames build on first touch; timed runs then measure the operator)
    uniQueries.foreach { q => time(q, sfDir); time(q, work) }
    for (q <- uniQueries) {
      val tA = time(q, sfDir)
      val tU = time(q, work)
      println(f"""{"metric":"unicode_scale","query":"$q","n_docs":$nDocs,""" +
        f""""ascii_sec":$tA%.3f,"decomposed_sec":$tU%.3f,""" +
        f""""delta_per_100k_docs_sec":${(tU - tA) * 100000.0 / nDocs}%.2f}""")
    }

    // oracle gate dump: the unicode queries on the DECOMPOSED corpus
    val gate = Seq("text_stats_unicode", "dedup_unicode")
    gate.foreach { q =>
      SparkEntry.queries(q)(spark, work)
        .write.mode("overwrite").parquet(s"$work/out/$q")
    }
    val oracleJson = gate.map { q =>
      val sql = SparkEntry.oracleSql(q)
        .replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\t", "\\t")
      s""""$q": "$sql""""
    }.mkString("{", ", ", "}")
    Files.write(Paths.get(s"$work/out/oracle_sql.json"), oracleJson.getBytes)
    println(s"""{"metric":"unicode_scale_gate","out":"$work/out"}""")
    spark.stop()
  }
}
