package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan of every registered
  * query at the given sf dir. Used to verify scan pruning/pushdown, join
  * strategies (SMJ/broadcast — never BNLJ/cartesian on the hot path), and
  * whole-stage-codegen coverage while iterating on operators.
  *
  * Usage: sbt "runMain graft.Explain /root/testdata/sf0.01 [queryName]" */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_ == name) }
      .foreach { case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"[explain failed] $e") }
      }
    spark.stop()
  }
}
