package graft.tools

import graft.queries.Tables
import graft.similarity.Similarity
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage timing for the similarity / embedding-dedup operators. */
object ProfileSimilarity {
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
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    time("raw scan")(raw.count())
    val embs = time("spread build")(
      { val e = Tables.spread(spark, sfDir, "embeddings"); e.count(); e })
    time("signLshNearDupPairs")(
      Similarity.signLshNearDupPairs(embs, threshold = 0.42).count())
    time("signLshNearDupPairs 2nd")(
      Similarity.signLshNearDupPairs(embs, threshold = 0.42).count())
    locally {
      import org.apache.spark.sql.functions._
      val e = embs.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val tableKeys = (0 until 8).map { t =>
        val bitCols = (0 until 8).map { i =>
          when(element_at(col("v"), t * 8 + i + 1) > 0, "1").otherwise("0")
        }
        struct(lit(t).as("table"), concat(bitCols: _*).as("bucket"))
      }
      val buckets = e
        .select(col("vec_id"), explode(array(tableKeys: _*)).as("tb"))
        .select(col("vec_id"), col("tb.table").as("table"),
          col("tb.bucket").as("bucket"))
      time("  signlsh sub: buckets")(buckets.count())
      val capped = buckets
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("table"), col("bucket"))))
        .filter(col("__n") <= 1000).drop("__n")
      time("  signlsh sub: capped window")(capped.count())
      val cp = capped.persist()
      time("  signlsh sub: capped persist")(cp.count())
      val cand = cp.alias("a")
        .join(cp.alias("b"),
          col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      time("  signlsh sub: pair join")(cand.count())
      val dd = cand.dropDuplicates("vec_a", "vec_b")
      time("  signlsh sub: dropDuplicates")(dd.count())
    }
    time("lshTopK")(Similarity.lshTopK(embs, 8, 5).count())
    time("bruteForceTopK")(Similarity.bruteForceTopK(embs, 8, 5).count())
    time("ivfTopK")(Similarity.ivfTopK(embs, 8, 5).count())
    time("ivfTopK 2nd")(Similarity.ivfTopK(embs, 8, 5).count())
    spark.stop()
  }
}
