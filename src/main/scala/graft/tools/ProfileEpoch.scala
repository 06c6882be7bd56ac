package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of the epoch/admission chain's wall (guide §1):
  * times each sub-piece of materializeEpochs in isolation with the noop
  * sink so the 16-second bench wall decomposes into named parts. */
object ProfileEpoch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[pe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs scan")(noop(docs))
    time("docs scan again")(noop(docs))
    val live = docs.filter(col("text").isNotNull)
    time("tokens size only")(noop(live.select(col("doc_id"),
      size(graft.text.TextOps.tokens(col("text"))).as("n"))))
    // per-signal decomposition of the gate's HOF lattice
    val toks = graft.text.TextOps.tokens(col("text"))
    val sh = graft.text.TextOps.shingles(toks, 3)
    time("signal: n_tokens")(noop(live.select(size(toks))))
    time("signal: meanTokenLen")(noop(live.select(
      aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
        .cast("double") / size(toks))))
    time("signal: stopwordRatio")(noop(live.select(
      size(filter(toks, t => array_contains(
        array(Seq("the", "a", "and", "of", "to", "in", "is").map(lit): _*), t)))
        .cast("double") / size(toks))))
    time("signal: shingles size")(noop(live.select(size(sh))))
    time("signal: rep_ratio")(noop(live.select(
      when(size(sh) > 0,
        lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh))
        .otherwise(0.0))))
    val gated = graft.text.TextAnalysis.qualityGate(live,
      passThrough = Seq("source"))
    time("qualityGate noop")(noop(gated))
    time("qualityGate noop again")(noop(gated))
    val pri = gated.select(col("doc_id"), col("source"), col("n_tokens"),
      col("rep_ratio"), when(col("keep"), 0).otherwise(1).as("__pk"))
    time("repartitionByRange")(noop(
      pri.repartitionByRange(col("source"), col("__pk"), col("rep_ratio"),
        col("doc_id"))))
    time("mixEpochPlan")(noop(graft.text.TextAnalysis.mixEpochPlan(docs)))
    time("materializeEpochs full")(noop(
      graft.text.TextAnalysis.materializeEpochs(docs)))
    spark.stop()
  }
}
