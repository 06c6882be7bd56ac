package graft

import graft.functions.VectorFunctions.dotp
import org.apache.spark.sql.functions._

/** The codegen'd DotProduct expression: agreement with the interpreted
  * higher-order-function fold it replaced (bit-equality matters — the
  * DuckDB oracles replicate the fold's accumulation order), null
  * propagation, and length handling. */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def foldDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("dotp is bit-equal to the aggregate(zip_with) fold on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)(
      (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val out = rows.toDF("a", "b")
      .select(dotp(col("a"), col("b")).as("d"), foldDot(col("a"), col("b")).as("f"))
      .collect()
    out.foreach { r =>
      // bit-equality, not tolerance: identical accumulation order
      assert(java.lang.Double.doubleToLongBits(r.getAs[Double]("d")) ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("f")))
    }
  }

  test("dotp: null input → null; empty arrays → 0.0") {
    val out = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])))
      .toDF("a", "b")
      .select(dotp(col("a"), col("b")).as("d"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getAs[Double]("d") == 0.0)
  }

  test("dotp accumulates over the shorter prefix on length mismatch") {
    val out = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0)))
      .toDF("a", "b").select(dotp(col("a"), col("b")).as("d")).collect()
    assert(out(0).getAs[Double]("d") == 50.0)
  }

  test("null ELEMENT yields null, matching the fold's poisoned sum") {
    val out = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)))
      .toDF("a", "b")
      .select(dotp(col("a"), col("b")).as("d"), foldDot(col("a"), col("b")).as("f"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
  }

  test("graft_dot / graft_hamming / graft_l2mu are callable from SQL once registered") {
    org.apache.spark.sql.graftshim.GraftFunctionRegistry.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
    assert(spark.sql("SELECT graft_hamming('0101', '0011') AS h")
      .head().getInt(0) == 2)
    assert(spark.sql(
      "SELECT graft_l2mu(array(3.0D, 0.0D), array(1.0D, 2.0D)) AS m")
      .head().getLong(0) == 8000000L)
    assert(spark.sql(
      "SELECT graft_subdist2(array(9.0D, 1.0D, 2.0D), array(0.0D, 0.0D), 1) AS s")
      .head().getDouble(0) == 5.0)
  }

  test("l2mu matches the interpreted µ-rounded fold; null element → null") {
    import graft.functions.VectorFunctions.l2mu
    val foldMu = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) =>
        round((x - y) * (x - y) * lit(1e6)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(100)(
      (Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val out = rows.toDF("a", "b")
      .select(l2mu(col("a"), col("b")).as("m"), foldMu(col("a"), col("b")).as("f"))
      .collect()
    out.foreach(r => assert(r.getAs[Long]("m") == r.getAs[Long]("f")))
    // exact small case: (3-1)² + (0-2)² = 8 → 8_000_000 µ
    val small = Seq((Seq(3.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(l2mu(col("a"), col("b"))).head().getLong(0)
    assert(small == 8000000L)
    // null element poisons to null; interpreted path agrees
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.MicroSquaredDistance
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arr = ArrayType(DoubleType)
    assert(MicroSquaredDistance(
      Literal.create(Seq(3.0, 0.0), arr),
      Literal.create(Seq(1.0, 2.0), arr)).eval(InternalRow.empty) == 8000000L)
    assert(MicroSquaredDistance(
      Literal.create(Seq[java.lang.Double](1.0, null), arr),
      Literal.create(Seq(3.0, 4.0), arr)).eval(InternalRow.empty) == null)
  }

  test("subdist2: subvector distance bit-equal to the unrolled chain") {
    import graft.functions.VectorFunctions.subdist2
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextGaussian()), Seq.fill(16)(rnd.nextGaussian())))
    for (off <- Seq(0, 16, 48)) {
      val out = rows.toDF("v", "c")
        .select(subdist2(col("v"), col("c"), lit(off)).as("d"),
          aggregate(zip_with(slice(col("v"), off + 1, 16), col("c"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x).as("f"))
        .collect()
      out.foreach(r => assert(
        java.lang.Double.doubleToLongBits(r.getAs[Double]("d")) ==
          java.lang.Double.doubleToLongBits(r.getAs[Double]("f")), s"offset $off"))
    }
    // out-of-range offset → null (both eval paths)
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.SubvectorDist2
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    val arr = ArrayType(DoubleType)
    assert(SubvectorDist2(Literal.create(Seq(1.0, 2.0), arr),
      Literal.create(Seq(1.0, 1.0), arr),
      Literal.create(1, IntegerType)).eval(InternalRow.empty) == null)
    assert(SubvectorDist2(Literal.create(Seq(1.0, 2.0), arr),
      Literal.create(Seq(0.0, 0.0), arr),
      Literal.create(0, IntegerType)).eval(InternalRow.empty) == 5.0)
    val oob = rows.take(1).toDF("v", "c")
      .select(subdist2(col("v"), col("c"), lit(60)).as("d")).head()
    assert(oob.isNullAt(0))
  }

  test("dotp survives both codegen and interpreted evaluation paths") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.DotProduct
    // whole-stage codegen path (projection over a DataFrame)
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(dotp(col("a"), col("b"))).head().getDouble(0) == 11.0)
    // interpreted path: direct expression eval (the codegen-failure
    // fallback) — a DataFrame filter would still compile to codegen
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arr = ArrayType(DoubleType)
    val expr = DotProduct(
      Literal.create(Seq(1.0, 2.0), arr), Literal.create(Seq(3.0, 4.0), arr))
    assert(expr.eval(InternalRow.empty) == 11.0)
    val withNullElem = DotProduct(
      Literal.create(Seq[java.lang.Double](1.0, null), arr),
      Literal.create(Seq(3.0, 4.0), arr))
    assert(withNullElem.eval(InternalRow.empty) == null)
  }
}
