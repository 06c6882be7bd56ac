package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Whole-codebook PQ expressions. The product-quantization operators
 * evaluate, per row and per subspace, k codebook distances and either an
 * argmin (assignment) or the full k-entry lookup table (ADC). As
 * composed `round(subdist2(...))` / `array_min(struct(...))` trees that
 * is m·k expression NODES — at the trained-codebook operating point
 * (m=8, k=64) the 512-node projection overflows Janino's method limits,
 * whole-stage codegen fails to compile, and the whole scan falls back to
 * interpreted evaluation. These two expressions take the SUBSPACE
 * CODEBOOK (k × sub doubles) as one array-literal child and loop over it
 * inside a single generated method, so the projection is m small nodes
 * and codegen stays alive at any k.
 *
 * Arithmetic is pinned node-for-node to the trees they replace (and to
 * the DuckDB oracles): distances accumulate left-to-right; rounding is
 * `java.math.BigDecimal(x).setScale(n, HALF_UP)` — exactly Spark's
 * `round()` codegen — NOT `Math.round`, whose float `+0.5` can disagree
 * with decimal HALF_UP in the last ulp.
 */
object PqExpressions {
  /** Spark `round(x, scale)` semantics, shared by eval and the generated
    * code (which calls this method — one BigDecimal path, no copy). */
  def roundHalfUp(x: Double, scale: Int): Double =
    // NaN/Infinite pass through exactly like Spark's Round (BigDecimal
    // would throw NumberFormatException on them)
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else new java.math.BigDecimal(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The codebook child (always a foldable literal in this library)
    * unboxed ONCE into a primitive matrix. The generic path reads the
    * codebook through `ArrayData.getDouble` — an unbox + bounds branch
    * per coordinate, ~4k of them per row at the trained operating point,
    * which dominates the whole assignment scan. The matrix rides into
    * generated code via `addReferenceObj`, so the hot loop is pure
    * primitive-array arithmetic. */
  def toMatrix(codebook: Expression): Array[Array[Double]] = {
    require(codebook.foldable,
      "PQ codebook child must be a literal (foldable) expression")
    val ad = codebook.eval(null).asInstanceOf[ArrayData]
    if (ad == null) Array.empty
    else Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
}

/**
 * Per-subspace PQ assignment: over codebook rows cid = 0..k−1, the
 * squared L2 distance from `vector[offset, offset+sub)` to row cid,
 * rounded to 6 dp, argmin with ties to the SMALLER cid (strict `<` on
 * the rounded value — the `array_min` lexicographic (d, cid) rule).
 * Returns `struct(d: double, cid: int)` — the same field shape the
 * struct-min tree produced, so the code-pivot columns are unchanged.
 *
 * Null semantics: null vector/codebook → null; a vector too short for
 * `offset + sub` or a null element → null (the composed tree's
 * out-of-range subdist2 behavior, made strict).
 */
case class PqNearestCode(vector: Expression, codebook: Expression,
                         offset: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vector
  override def second: Expression = codebook
  override def third: Expression = offset

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)), IntegerType)

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_nearest"

  @transient private lazy val cbMatrix: Array[Array[Double]] =
    PqExpressions.toMatrix(codebook)

  override protected def nullSafeEval(v: Any, cb: Any, off: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val codes = cbMatrix
    val o = off.asInstanceOf[Int]
    val k = codes.length
    if (k == 0) return null
    var bestD = Double.MaxValue
    var bestC = -1
    var cid = 0
    while (cid < k) {
      val row = codes(cid)
      val sub = row.length
      if (o < 0 || o + sub > x.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < sub) {
        if (x.isNullAt(o + i)) return null
        val d = x.getDouble(o + i) - row(i)
        s += d * d
        i += 1
      }
      // First non-NaN candidate (finite OR +Inf) seeds best directly —
      // an Inf distance must seed (round6 passes it through) or an
      // all-Inf row would fall to the NaN fallback with the wrong d/cid.
      // After seeding: BigDecimal only for candidates that can WIN
      // (round6(x) >= x − 5e-7, so s >= bestD + 1e-6 implies round6(s) >
      // bestD) — bit-identical to rounding every candidate; an Inf s
      // never beats an Inf best, preserving the smaller-cid tie.
      if (bestC < 0) {
        if (!java.lang.Double.isNaN(s)) {
          bestD = PqExpressions.roundHalfUp(s, 6); bestC = cid
        }
      } else if (s < bestD + 1e-6) {
        val dr = PqExpressions.roundHalfUp(s, 6)
        if (dr < bestD) { bestD = dr; bestC = cid }
      }
      cid += 1
    }
    // every candidate NaN (the only way bestC stays -1 with k > 0): the
    // struct-min tree ranked NaN greatest, min = (NaN, cid 0)
    if (bestC < 0) new GenericInternalRow(Array[Any](Double.NaN, 0))
    else new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, off) => {
      val mat = ctx.addReferenceObj("pqnCodebook", cbMatrix, "double[][]")
      val k = ctx.freshName("k")
      val cid = ctx.freshName("cid")
      val row = ctx.freshName("row")
      val sub = ctx.freshName("sub")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val dr = ctx.freshName("dr")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val bad = ctx.freshName("bad")
      s"""
         |int $k = $mat.length;
         |double $bestD = Double.MAX_VALUE;
         |int $bestC = -1;
         |boolean $bad = ($k == 0);
         |for (int $cid = 0; !$bad && $cid < $k; $cid++) {
         |  double[] $row = $mat[$cid];
         |  int $sub = $row.length;
         |  if ($off < 0 || $off + $sub > $v.numElements()) { $bad = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $sub; $i++) {
         |    if ($v.isNullAt($off + $i)) { $bad = true; break; }
         |    double $d = $v.getDouble($off + $i) - $row[$i];
         |    $s += $d * $d;
         |  }
         |  if ($bad) break;
         |  if ($bestC < 0) {
         |    if (!Double.isNaN($s)) {
         |      $bestD = org.apache.spark.sql.graftshim.PqExpressions.roundHalfUp($s, 6);
         |      $bestC = $cid;
         |    }
         |  } else if ($s < $bestD + 1.0E-6) {
         |    double $dr = org.apache.spark.sql.graftshim.PqExpressions.roundHalfUp($s, 6);
         |    if ($dr < $bestD) { $bestD = $dr; $bestC = $cid; }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; ${ev.value} = null; }
         |else if ($bestC < 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{Double.NaN, 0});
         |}
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bestD, $bestC});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vector = newFirst, codebook = newSecond, offset = newThird)
}

/**
 * Per-subspace ADC lookup-table row: entry cid = the squared L2 distance
 * from `vector[offset, offset+sub)` to codebook row cid, µ-scaled to an
 * exact long via `round(d·10⁶, 0)` HALF_UP then cast — term-for-term the
 * `round(subdist2(...) * 1e6, 0).cast("long")` chain it replaces, as ONE
 * node returning the k-entry `array<long>`. Concatenate the m subspace
 * arrays to index entries as `s·k + code_s` (the LUT layout the batch
 * ADC forms broadcast).
 */
case class PqAdcLut(vector: Expression, codebook: Expression,
                    offset: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vector
  override def second: Expression = codebook
  override def third: Expression = offset

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)), IntegerType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_pq_adclut"

  @transient private lazy val cbMatrix: Array[Array[Double]] =
    PqExpressions.toMatrix(codebook)

  override protected def nullSafeEval(v: Any, cb: Any, off: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val codes = cbMatrix
    val o = off.asInstanceOf[Int]
    val k = codes.length
    val out = new Array[Long](k)
    var cid = 0
    while (cid < k) {
      val row = codes(cid)
      val sub = row.length
      if (o < 0 || o + sub > x.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < sub) {
        if (x.isNullAt(o + i)) return null
        val d = x.getDouble(o + i) - row(i)
        s += d * d
        i += 1
      }
      out(cid) = PqExpressions.roundHalfUp(s * 1e6, 0).toLong
      cid += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, off) => {
      val mat = ctx.addReferenceObj("pqlCodebook", cbMatrix, "double[][]")
      val k = ctx.freshName("k")
      val cid = ctx.freshName("cid")
      val row = ctx.freshName("row")
      val sub = ctx.freshName("sub")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      s"""
         |int $k = $mat.length;
         |long[] $out = new long[$k];
         |boolean $bad = false;
         |for (int $cid = 0; $cid < $k; $cid++) {
         |  double[] $row = $mat[$cid];
         |  int $sub = $row.length;
         |  if ($off < 0 || $off + $sub > $v.numElements()) { $bad = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $sub; $i++) {
         |    if ($v.isNullAt($off + $i)) { $bad = true; break; }
         |    double $d = $v.getDouble($off + $i) - $row[$i];
         |    $s += $d * $d;
         |  }
         |  if ($bad) break;
         |  $out[$cid] = (long) org.apache.spark.sql.graftshim.PqExpressions.roundHalfUp($s * 1.0E6, 0);
         |}
         |if ($bad) { ${ev.isNull} = true; ${ev.value} = null; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vector = newFirst, codebook = newSecond, offset = newThird)
}

/**
 * IVF coarse-cell argmax over the whole centroid table — the
 * whole-codebook sibling of [[PqNearestCode]] for the cell assignment:
 * per row, cc(cid) = round6(dot(v, centroid) / (nrm · cnrm)) and the
 * winner is max cc with ties to the SMALLEST cell id — exactly the
 * `array_max(array(struct(cc, -cid), ...))` lexicographic rule it
 * replaces. As a composed tree the 16-centroid argmax plus the m
 * codebook loops pushed the generated `processNext()` past HotSpot's
 * 8000-bytecode JIT ceiling (`DontCompileHugeMethods`): the method
 * compiled but ran in the BYTECODE INTERPRETER, ~30× slower — the
 * streaming codes job's real wall. One loop node keeps the method far
 * under the ceiling.
 *
 * The centroid table is PACKED into one literal `array<array<double>>`:
 * row = [cellId, cnrm, c_0 … c_{dim−1}] (cell ids are corpus vec_ids —
 * exact in a double far beyond any test corpus; packing keeps this a
 * ternary expression). Rounding uses the shared BigDecimal HALF_UP
 * helper, skipped for candidates that provably cannot win or tie
 * (raw < best − 1e-6 ⇒ round6(raw) < best): bit-identical to rounding
 * every candidate. Dot accumulates left-to-right like [[DotProduct]].
 */
case class IvfNearestCell(vector: Expression, nrm: Expression,
                          packed: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vector
  override def second: Expression = nrm
  override def third: Expression = packed

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType, ArrayType(ArrayType(DoubleType)))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_ivf_nearest"

  @transient private lazy val ctMatrix: Array[Array[Double]] =
    PqExpressions.toMatrix(packed)

  override protected def nullSafeEval(v: Any, n: Any, p: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val xn = n.asInstanceOf[Double]
    val rows = ctMatrix
    if (rows.isEmpty) return null
    var bestCC = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var bestIsNaN = false
    var r = 0
    while (r < rows.length) {
      val row = rows(r)
      val dim = row.length - 2
      if (dim > x.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (x.isNullAt(i)) return null
        s += x.getDouble(i) * row(2 + i)
        i += 1
      }
      val raw = s / (xn * row(1))
      // NaN scores (zero-norm vector or centroid) rank GREATEST with the
      // smallest-cid tie — Spark's struct ordering in the array_max tree
      // this replaces (and DuckDB's NaN-sorts-last DESC), so a
      // degenerate row lands in a deterministic small cell, never a
      // sentinel
      // >=, not >: with > an all-(-Inf) score column (negative dot over
      // an underflowed-to-+0 denominator) never seeds — −Inf > −Inf is
      // false — and the phantom Long.MaxValue escaped (ADVICE r12). >=
      // admits the exact-equality candidate too, which the rounding +
      // (cc, cid) tie below resolves identically to the array_max tree.
      val cid = row(0).toLong
      if (java.lang.Double.isNaN(raw)) {
        if (!bestIsNaN || cid < bestId) { bestIsNaN = true; bestId = cid }
      } else if (!bestIsNaN && raw >= bestCC - 1e-6) {
        val cc = PqExpressions.roundHalfUp(raw, 6)
        if (cc > bestCC || (cc == bestCC && cid < bestId)) {
          bestCC = cc; bestId = cid
        }
      }
      r += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, p) => {
      val mat = ctx.addReferenceObj("ivfCentroids", ctMatrix, "double[][]")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val dim = ctx.freshName("dim")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val raw = ctx.freshName("raw")
      val cc = ctx.freshName("cc")
      val cid = ctx.freshName("cid")
      val bestCC = ctx.freshName("bestCC")
      val bestId = ctx.freshName("bestId")
      val bestNaN = ctx.freshName("bestNaN")
      val bad = ctx.freshName("bad")
      s"""
         |double $bestCC = Double.NEGATIVE_INFINITY;
         |long $bestId = Long.MAX_VALUE;
         |boolean $bestNaN = false;
         |boolean $bad = ($mat.length == 0);
         |for (int $r = 0; !$bad && $r < $mat.length; $r++) {
         |  double[] $row = $mat[$r];
         |  int $dim = $row.length - 2;
         |  if ($dim > $v.numElements()) { $bad = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |    $s += $v.getDouble($i) * $row[2 + $i];
         |  }
         |  if ($bad) break;
         |  double $raw = $s / ($n * $row[1]);
         |  long $cid = (long) $row[0];
         |  if (Double.isNaN($raw)) {
         |    if (!$bestNaN || $cid < $bestId) { $bestNaN = true; $bestId = $cid; }
         |  } else if (!$bestNaN && $raw >= $bestCC - 1.0E-6) {
         |    double $cc = org.apache.spark.sql.graftshim.PqExpressions.roundHalfUp($raw, 6);
         |    if ($cc > $bestCC || ($cc == $bestCC && $cid < $bestId)) {
         |      $bestCC = $cc; $bestId = $cid;
         |    }
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vector = newFirst, nrm = newSecond, packed = newThird)
}

/**
 * Coordinate-sign LSH bucket keys over the whole table set — the
 * sign-LSH family's compact sibling of [[IvfNearestCell]]: table t's
 * bucket is the '1'/'0' sign pattern of dims [t·bits, (t+1)·bits),
 * returned as `array<string>` indexed by table. Replaces the
 * bits·tables `when(element_at(v, i) > 0, "1")` + concat tree whose
 * generated code pushed `decontaminate_semantic`'s method past the
 * HotSpot JIT ceiling (CodegenAudit). Semantics replicated exactly,
 * including the tree's quiet edges: an out-of-range index or a null
 * element reads as '0' (element_at → null → `> 0` false → otherwise) —
 * callers guard dim ≥ bits·tables where that matters, as before.
 */
case class SignBuckets(vector: Expression, bits: Expression,
                       tables: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  import org.apache.spark.unsafe.types.UTF8String

  override def first: Expression = vector
  override def second: Expression = bits
  override def third: Expression = tables

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), IntegerType, IntegerType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_sign_buckets"

  override protected def nullSafeEval(v: Any, b: Any, t: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val bits = b.asInstanceOf[Int]
    val tables = t.asInstanceOf[Int]
    val n = x.numElements()
    val out = new Array[Any](tables)
    var tb = 0
    while (tb < tables) {
      val cs = new Array[Char](bits)
      var i = 0
      while (i < bits) {
        val j = tb * bits + i
        cs(i) = if (j < n && !x.isNullAt(j) && x.getDouble(j) > 0) '1' else '0'
        i += 1
      }
      out(tb) = UTF8String.fromString(new String(cs))
      tb += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, t) => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val tb = ctx.freshName("tb")
      val cs = ctx.freshName("cs")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $v.numElements();
         |Object[] $out = new Object[$t];
         |for (int $tb = 0; $tb < $t; $tb++) {
         |  char[] $cs = new char[$b];
         |  for (int $i = 0; $i < $b; $i++) {
         |    int $j = $tb * $b + $i;
         |    $cs[$i] = ($j < $n && !$v.isNullAt($j) && $v.getDouble($j) > 0)
         |      ? '1' : '0';
         |  }
         |  $out[$tb] = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    new String($cs));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vector = newFirst, bits = newSecond, tables = newThird)
}

/**
 * Dense matrix–vector projection with 6-dp rounding — the random
 * projection's whole-matrix node: out[r] = round6(Σᵢ v[i]·rows[r][i] ÷
 * `divisor`), accumulated left-to-right like [[DotProduct]], divisor an
 * exact IEEE op, rounding the shared BigDecimal HALF_UP. Replaces the
 * kDims separate dot+round chains whose generated code pushed
 * `embedding_rp` past the HotSpot JIT ceiling (CodegenAudit) — same
 * values, one compact loop. Null vector → null; a vector shorter than a
 * row or a null element → null.
 */
case class MatVecRound6(vector: Expression, rows: Expression,
                        divisor: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vector
  override def second: Expression = rows
  override def third: Expression = divisor

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)), DoubleType)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_matvec_round6"

  @transient private lazy val rowMatrix: Array[Array[Double]] =
    PqExpressions.toMatrix(rows)

  override protected def nullSafeEval(v: Any, rw: Any, dv: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val div = dv.asInstanceOf[Double]
    val mat = rowMatrix
    val out = new Array[Double](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      if (row.length > x.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < row.length) {
        if (x.isNullAt(i)) return null
        s += x.getDouble(i) * row(i)
        i += 1
      }
      out(r) = PqExpressions.roundHalfUp(s / div, 6)
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, rw, dv) => {
      val mat = ctx.addReferenceObj("mvRows", rowMatrix, "double[][]")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      s"""
         |double[] $out = new double[$mat.length];
         |boolean $bad = false;
         |for (int $r = 0; $r < $mat.length; $r++) {
         |  double[] $row = $mat[$r];
         |  if ($row.length > $v.numElements()) { $bad = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $row.length; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |    $s += $v.getDouble($i) * $row[$i];
         |  }
         |  if ($bad) break;
         |  $out[$r] = org.apache.spark.sql.graftshim.PqExpressions.roundHalfUp($s / $dv, 6);
         |}
         |if ($bad) { ${ev.isNull} = true; ${ev.value} = null; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vector = newFirst, rows = newSecond, divisor = newThird)
}

/**
 * All IVF cell scores in one loop — the probe-side sibling of
 * [[IvfNearestCell]]: over the packed centroid table (row =
 * [cellId, cnrm, coords…], the [[IvfNearestCell]] layout), emits
 * `[cc, cid]` per centroid in table order, where cc is the
 * 6-dp-HALF_UP-rounded cosine `Σᵢ v[i]·coords[i] ÷ (nrm·cnrm)` (the
 * same left-to-right fold and rounding as the per-centroid
 * `round(dot(...) / ..., 6)` struct chain it replaces — NaN/Inf pass
 * through rounding exactly like Spark's Round). The caller explodes the
 * output and ranks (cc DESC, cid ASC) — ranking semantics live in the
 * window, not here. Replaces the nCells separate dot+round struct
 * expressions whose generated code pushed the 64-cell probe projection
 * ~3× past the HotSpot JIT ceiling (CodegenAudit r14: 26 018 bytecodes
 * → compact). Null vector, short vector or null element → null row
 * (the [[IvfNearestCell]]/[[MatVecRound6]] convention).
 */
case class IvfCellScores(vector: Expression, nrm: Expression,
                         packed: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = vector
  override def second: Expression = nrm
  override def third: Expression = packed

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType, ArrayType(ArrayType(DoubleType)))

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_ivf_cell_scores"

  @transient private lazy val ctMatrix: Array[Array[Double]] =
    PqExpressions.toMatrix(packed)

  override protected def nullSafeEval(v: Any, n: Any, p: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val xn = n.asInstanceOf[Double]
    val rows = ctMatrix
    val out = new Array[Any](rows.length)
    var r = 0
    while (r < rows.length) {
      val row = rows(r)
      val dim = row.length - 2
      if (dim > x.numElements()) return null
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (x.isNullAt(i)) return null
        s += x.getDouble(i) * row(2 + i)
        i += 1
      }
      out(r) = new GenericArrayData(
        Array(PqExpressions.roundHalfUp(s / (xn * row(1)), 6), row(0)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, p) => {
      val mat = ctx.addReferenceObj("ivfScoreCents", ctMatrix, "double[][]")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val dim = ctx.freshName("dim")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      s"""
         |Object[] $out = new Object[$mat.length];
         |boolean $bad = false;
         |for (int $r = 0; $r < $mat.length; $r++) {
         |  double[] $row = $mat[$r];
         |  int $dim = $row.length - 2;
         |  if ($dim > $v.numElements()) { $bad = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { $bad = true; break; }
         |    $s += $v.getDouble($i) * $row[2 + $i];
         |  }
         |  if ($bad) break;
         |  $out[$r] = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new double[] {
         |      org.apache.spark.sql.graftshim.PqExpressions.roundHalfUp(
         |        $s / ($n * $row[1]), 6),
         |      $row[0] });
         |}
         |if ($bad) { ${ev.isNull} = true; ${ev.value} = null; }
         |else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(vector = newFirst, nrm = newSecond, packed = newThird)
}
