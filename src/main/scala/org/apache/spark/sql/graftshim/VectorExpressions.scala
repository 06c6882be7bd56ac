package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/**
 * Native Catalyst expression for the dense-vector dot product — the hot
 * scalar of every similarity operator (cosine top-k, sign-LSH near-dup,
 * hyperplane bucketing, IVF re-rank).
 *
 * Why an Expression and not `aggregate(zip_with(...))`: higher-order
 * functions are CodegenFallback — each evaluation walks a lambda
 * interpreter and allocates an intermediate array per row. With ~10^5
 * candidate pairs × 64 dims × 3 folds (dot + two norms) that interpreter
 * overhead dominates the whole operator; at 100 TB it is the difference
 * between a compute-bound scan and a GC storm. [[DotProduct]] generates a
 * tight primitive loop inside whole-stage codegen (`doGenCode`), with an
 * identical left-to-right accumulation order so results are bit-equal to
 * the fold the DuckDB oracles replicate (`list_sum(list_transform(...))`).
 *
 * Semantics: null input → null (BinaryExpression's null-safe contract);
 * a null ELEMENT in either array → null, exactly like the fold (where
 * the null product poisoned the sum) — a silent 0.0 would instead let a
 * wrong-but-finite cosine pass threshold filters; mismatched lengths
 * accumulate over the shorter prefix.
 *
 * Lives in the `org.apache.spark.sql` namespace because the
 * `ExpectsInputTypes` signature names `private[sql]` types; the
 * public entry point is `graft.functions.VectorFunctions.dotp`.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  // nullable even when both children are non-nullable: a null ELEMENT
  // yields null, and codegen must keep ev.isNull assignable (a
  // non-nullable expression folds it to a constant)
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Squared L2 distance between a SUBVECTOR of `left` (starting at
 * `offset`, 0-based) and the whole of `right`: Σᵢ (left[offset+i] −
 * right[i])² over i < len(right), accumulated left-to-right — bit-equal
 * to the explicit left-assoc `(a−b)·(a−b)` chain it replaces in the PQ
 * assignment (and to the oracle's `list_sum(list_transform(range(...)))`
 * element order).
 *
 * Why it exists: product quantization evaluates m·k of these per row
 * with the codebook folded in as literals. As unrolled per-term chains
 * that is an ~m·k·sub-node expression tree whose JANINO COMPILE takes
 * seconds and re-runs whenever the codebook literals change (every new
 * corpus/scale dir); as m·k small loops the generated source is ~60×
 * smaller with identical arithmetic. Reading past the end of `left`
 * yields null (element_at semantics would too) — the caller guarantees
 * offset + len(right) <= len(left); null elements poison to null.
 */
case class SubvectorDist2(left: Expression, right: Expression, offset: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = offset

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType)

  override def dataType: DataType = DoubleType

  // see DotProduct: null on out-of-range / null elements keeps ev.isNull
  // assignable even off non-nullable children
  override def nullable: Boolean = true

  override def prettyName: String = "graft_subdist2"

  override protected def nullSafeEval(a: Any, b: Any, off: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val o = off.asInstanceOf[Int]
    val n = y.numElements()
    if (o < 0 || o + n > x.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(o + i) || y.isNullAt(i)) return null
      val d = x.getDouble(o + i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, off) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $b.numElements();
         |double $s = 0.0;
         |if ($off < 0 || $off + $n > $a.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($off + $i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($off + $i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(left = newFirst, right = newSecond, offset = newThird)
}

/**
 * µ-scaled squared L2 distance: Σ round((aᵢ−bᵢ)²·10⁶) as a LONG — the
 * summation-order-proof distance used by the centroid-outlier audit
 * (each squared term is pinned to integer micro-units BEFORE the sum, so
 * Spark's aggregation order and DuckDB's list order cannot disagree in
 * the last ulp). `Math.round` on the non-negative terms matches the
 * oracle's round-half-away-from-zero exactly.
 *
 * Same codegen rationale as [[DotProduct]]: the equivalent
 * `aggregate(zip_with(...))` is CodegenFallback — a lambda interpreter
 * and an intermediate array per row — which is the difference between a
 * compute-bound scan and a GC storm at corpus scale. Null semantics
 * match [[DotProduct]]: null input or null ELEMENT → null; mismatched
 * lengths accumulate over the shorter prefix.
 */
case class MicroSquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.LongType

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = LongType

  // see DotProduct: a null ELEMENT yields null even off non-nullable
  // children, so ev.isNull must stay assignable
  override def nullable: Boolean = true

  override def prettyName: String = "graft_l2mu"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += math.round(d * d * 1e6)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += java.lang.Math.round($d * $d * 1.0E6);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Element-wise vector subtraction a − b over two `ARRAY<DOUBLE>` columns
 * — the residual map of residual product quantization (r20): encoding
 * x − centroid(cell(x)) instead of x is the standard (Faiss-default)
 * recall lever for IVF-PQ, and the subtraction sits on the corpus-side
 * assignment hot path feeding [[PqNearestCode]].
 *
 * Why an Expression and not `zip_with(a, b, _ - _)`: higher-order
 * functions are CodegenFallback (see [[DotProduct]]) — a lambda
 * interpreter plus an allocation per row, splitting the whole-stage
 * codegen span right before the PQ assignment loop. This generates one
 * tight primitive loop and emits an UnsafeArrayData directly.
 *
 * Semantics: null input or null ELEMENT → null (the poison convention
 * of every expression here); mismatched lengths subtract over the
 * shorter prefix (the [[DotProduct]] convention — the callers guarantee
 * equal widths). Subtraction is a single exact IEEE op per element, so
 * the residuals are bit-identical to the oracle's
 * `list_transform(range(n), i -> a[i+1] - b[i+1])`.
 */
case class VectorSubtract(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // see DotProduct: a null ELEMENT yields null even off non-nullable
  // children, so ev.isNull must stay assignable
  override def nullable: Boolean = true

  override def prettyName: String = "graft_vsub"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      out(i) = x.getDouble(i) - y.getDouble(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = $a.getDouble($i) - $b.getDouble($i);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Byte-wise Hamming distance between two strings — the verify scalar of
 * sketch-based near-dup detection (SimHash bit strings, hex digests).
 * Counts positions with differing bytes over the common prefix plus the
 * length difference (equal-length inputs — the only case the operators
 * produce — reduce to the classic definition). ASCII-only semantics by
 * design: the sketches are '0'/'1'/hex strings, so bytes == characters.
 * Same codegen rationale as [[DotProduct]]: the interpreted
 * `aggregate(zip_with(split(...)))` form allocates two char arrays and
 * walks a lambda interpreter per pair; this is a tight byte loop inside
 * whole-stage codegen.
 */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{IntegerType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var d = math.abs(x.numBytes() - y.numBytes())
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |int $d = java.lang.Math.abs($a.numBytes() - $b.numBytes());
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
