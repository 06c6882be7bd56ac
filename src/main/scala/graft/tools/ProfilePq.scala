package graft.tools

import graft.queries.{DataPipelineQueries, Tables}
import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing for the PQ/ADC search and the LSH recall audit. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(spark.range(1000).selectExpr("sum(id)").count())
    val embs = time("spread build")(
      { val e = Tables.spread(spark, sfDir, "embeddings"); e.count(); e })
    val codes = time("productQuantize")(
      { val c = Similarity.productQuantize(embs); c.count(); c })
    time("adcTopK (rebuild codes)")(
      Similarity.adcTopK(embs, nQueries = 8, topK = 5).count())
    time("adcTopK (shared codes)")(
      Similarity.adcTopK(embs, nQueries = 8, topK = 5,
        sharedCodes = Some(codes)).count())
    val cached = time("codes persist")(
      { val c = codes.persist(); c.count(); c })
    time("adcTopK (cached codes)")(
      Similarity.adcTopK(embs, nQueries = 8, topK = 5,
        sharedCodes = Some(cached)).count())
    time("adcTopK (cached codes, 2nd)")(
      Similarity.adcTopK(embs, nQueries = 8, topK = 5,
        sharedCodes = Some(cached)).count())
    time("dedup_lsh_audit")(
      DataPipelineQueries.dedupLshAudit(spark, sfDir).count())
    time("dedup_lsh_audit 2nd")(
      DataPipelineQueries.dedupLshAudit(spark, sfDir).count())
    spark.stop()
  }
}
