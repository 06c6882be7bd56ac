package graft.tools

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level cost breakdown of the capped exact-Jaccard path at a given
  * sfDir — run with `sbt "runMain graft.tools.ProfileJaccard [sfDir]"`. */
object ProfileJaccard {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shd = Dedup.shingleArrays(docs, 3).persist()
    time("shingleArrays")(shd.count())
    val invAll = shd.select(col("doc_id"), explode(col("sh")).as("shingle"))
    time("explode count")(println("  rows=" + invAll.count()))
    val inv = invAll
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("__df") <= 100)
      .drop("__df")
      .persist()
    time("df-window + filter")(println("  kept=" + inv.count()))
    val cand = inv.alias("sa")
      .join(inv.alias("sb"), col("sb.shingle") === col("sa.shingle") &&
        col("sa.doc_id") < col("sb.doc_id"))
      .select(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"))
    val candD = cand.distinct().persist()
    time("pair join + distinct")(println("  cand=" + candD.count()))
    time("recompute exact jaccard")(
      println("  pairs=" + Dedup.jaccardForPairs(candD, shd)
        .filter(col("jaccard") >= 0.5).count()))
    time("capped path (bounded)")(
      println("  pairs=" + Dedup.jaccardPairsExact(docs,
        sharedShingles = Some(shd), maxShingleDf = Some(100)).count()))
    // reference: the unpruned aggregation form end-to-end
    time("unpruned full path")(
      println("  pairs=" + Dedup.jaccardPairsExact(docs, sharedShingles = Some(shd)).count()))
    spark.stop()
  }
}
