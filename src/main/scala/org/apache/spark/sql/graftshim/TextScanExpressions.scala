package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * r22 sweep of the interpreted higher-order functions left on registered
 * scan paths after the r21 ShingleExpressions pass: empty-token drops,
 * per-element md5, chunk lattices, sorted-struct joins, and the
 * scalar-quantization lattice. Each expression generates straight-line
 * code inside whole-stage codegen and is value-identical to the HOF form
 * it replaces (pinned in TextOpsShimSpec / SimilaritySpec); every DuckDB
 * oracle is untouched.
 */

/** md5 lowercase-hex helpers shared by the scan expressions (one
  * MessageDigest per thread — the per-row getInstance was measurable on
  * the sketch path). */
private[graftshim] object GraftMd5 {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")
  private val MD = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** md5 of `bytes` as a 32-char lowercase-hex UTF8String — exactly
    * Spark's `md5(cast(s as binary))`. */
  def hexUtf8(bytes: Array[Byte]): UTF8String = {
    val md = MD.get()
    md.reset()
    md.update(bytes)
    val dig = md.digest()
    val out = new Array[Byte](32)
    var d = 0
    while (d < 16) {
      out(2 * d) = HEX((dig(d) >> 4) & 0xf)
      out(2 * d + 1) = HEX(dig(d) & 0xf)
      d += 1
    }
    UTF8String.fromBytes(out)
  }
}

/**
 * Drop empty and NULL elements of an `ARRAY<STRING>` — the codegen'd
 * form of the unicode tokenizer's trailing `filter(arr, t => t =!= "")`
 * (a NULL element's predicate is NULL, which `filter` excludes, same as
 * the empty string). NULL array → NULL.
 */
case class ArrayDropEmpty(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_drop_empty"

  override protected def nullSafeEval(v: Any): Any =
    ArrayDropEmpty.drop(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graftshim.ArrayDropEmpty"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.drop($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayDropEmpty {
  /** Non-null non-empty elements, order preserved. Static forwarder. */
  def drop(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var w = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) { out(w) = s; w += 1 }
      }
      i += 1
    }
    if (w == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], w).asInstanceOf[Array[Any]])
  }
}

/**
 * Per-element md5 of an `ARRAY<STRING>` — the codegen'd form of
 * `transform(arr, s => md5(s))` (the duplicate-span window hasher, fed
 * by [[WordShingles]]). NULL elements stay NULL (md5(NULL) is NULL);
 * NULL array → NULL.
 */
case class ArrayMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_array_md5"

  override protected def nullSafeEval(v: Any): Any =
    ArrayMd5.hash(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graftshim.ArrayMd5"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.hash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayMd5 {
  /** md5 hex per element; NULL passes through. Static forwarder. */
  def hash(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        out(i) = GraftMd5.hexUtf8(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Fixed-size token chunks with per-chunk checksum — the codegen'd form
 * of doc_chunks' nested `transform(sequence(0, ceil(n/cs)-1), i =>
 * struct(i, size(slice(ts, i·cs+1, cs)), md5(concat_ws(" ",
 * slice(ts, i·cs+1, cs)))))` lattice: one pass over the token array
 * instead of two interpreted lambdas plus two slice copies per chunk.
 * The join skips NULL tokens exactly like `concat_ws`; the count keeps
 * them exactly like `size`. NULL array → NULL; an EMPTY array yields an
 * empty chunk set (unreachable — `split` never returns empty for
 * non-null text, and null text is filtered upstream).
 */
case class TokenChunkStats(child: Expression, chunkSize: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(chunkSize >= 1, s"chunk size must be >= 1, got $chunkSize")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_no", IntegerType, nullable = false),
      StructField("n_chunk_tokens", IntegerType, nullable = false),
      StructField("checksum", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_chunks"

  override protected def nullSafeEval(v: Any): Any =
    TokenChunkStats.chunks(v.asInstanceOf[ArrayData], chunkSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graftshim.TokenChunkStats"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.chunks($a, $chunkSize);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenChunkStats {
  private val SPACE = UTF8String.fromString(" ")

  /** Chunk structs over toks in cs-sized runs. Static forwarder. */
  def chunks(toks: ArrayData, cs: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return WordShingles.EMPTY()
    val nChunks = (n + cs - 1) / cs
    val out = new Array[Any](nChunks)
    val buf = new Array[UTF8String](cs)
    var c = 0
    while (c < nChunks) {
      val start = c * cs
      val end = math.min(start + cs, n)
      var j = start
      while (j < end) {
        buf(j - start) = if (toks.isNullAt(j)) null else toks.getUTF8String(j)
        j += 1
      }
      val slice =
        if (end - start == cs) buf
        else java.util.Arrays.copyOf(buf, end - start)
      val joined = UTF8String.concatWs(SPACE, slice: _*)
      out(c) = new GenericInternalRow(Array[Any](
        c, end - start, GraftMd5.hexUtf8(joined.getBytes)))
      c += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Tokens of an `ARRAY<STRUCT<pos INT, token STRING>>` joined by single
 * spaces in (pos, token) ascending order — the codegen'd form of the
 * strip-boilerplate digest's `concat_ws(" ",
 * transform(array_sort(collect_list(struct(pos, token))), s => s.token))`
 * (array_sort's default comparator plans as an interpreted lambda).
 * `pos` is unique per document (posexplode positions), so the token
 * tiebreak and null-field ordering are unreachable; NULL tokens are
 * skipped by the join exactly like `concat_ws`. NULL array → NULL
 * (collect_list never produces one).
 */
case class PosTokenJoin(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(
          StructField(_, IntegerType, _, _), StructField(_, StringType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<struct<int,string>>, got $other")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_pos_token_join"

  override protected def nullSafeEval(v: Any): Any =
    PosTokenJoin.join(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "org.apache.spark.sql.graftshim.PosTokenJoin"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $cls.join($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosTokenJoin {
  private val SPACE = UTF8String.fromString(" ")

  /** Sort by (pos, token nulls-first) ascending, join tokens. Static
    * forwarder target for codegen. */
  def join(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val pos = new Array[Int](n)
    val tok = new Array[UTF8String](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      pos(i) = row.getInt(0)
      tok(i) = if (row.isNullAt(1)) null else row.getUTF8String(1)
      idx(i) = i
      i += 1
    }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = Integer.compare(pos(a), pos(b))
        if (c != 0) c
        else if (tok(a) == null && tok(b) == null) 0
        else if (tok(a) == null) -1
        else if (tok(b) == null) 1
        else tok(a).compareTo(tok(b))
      }
    })
    val sorted = new Array[UTF8String](n)
    i = 0
    while (i < n) { sorted(i) = tok(idx(i)); i += 1 }
    UTF8String.concatWs(SPACE, sorted: _*)
  }
}

/**
 * TRUE iff any adjacent symbol pair (syms[i], syms[i+1]) is one of a
 * fixed merge batch — the codegen'd form of the incremental BPE
 * trainer's affected-word predicate `coalesce(size >= 2 &&
 * arrays_overlap(syms, lefts) && exists(sequence(1, size-1), i =>
 * element_at(map, syms[i]) === syms[i+1]), false)` (the `exists` is an
 * interpreted lambda; the overlap prune existed only to shield it).
 * NULL symbols never match; NULL array → false — exactly what the
 * coalesce-to-false gave every non-matching path.
 */
case class AdjacentPairInSet(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.Predicate {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_adjacent_pair_in"

  @transient private[graftshim] lazy val table: Array[Array[UTF8String]] =
    pairs.map { case (a, b) =>
      Array(UTF8String.fromString(a), UTF8String.fromString(b))
    }.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else AdjacentPairInSet.matches(v.asInstanceOf[ArrayData], table)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("adjPairs", table,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    val c = child.genCode(ctx)
    val cls = "org.apache.spark.sql.graftshim.AdjacentPairInSet"
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = !${c.isNull} && $cls.matches(${c.value}, $tbl);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AdjacentPairInSet {
  /** Linear probe per adjacency — batches are a handful of merges.
    * Static forwarder target for codegen. */
  def matches(syms: ArrayData, pairs: Array[Array[UTF8String]]): Boolean = {
    val n = syms.numElements()
    if (n < 2) return false
    var prev: UTF8String = if (syms.isNullAt(0)) null else syms.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      if (prev != null && cur != null) {
        var p = 0
        while (p < pairs.length) {
          if (prev.equals(pairs(p)(0)) && cur.equals(pairs(p)(1))) return true
          p += 1
        }
      }
      prev = cur
      i += 1
    }
    false
  }
}

/**
 * Per-dimension scalar quantization of an `ARRAY<DOUBLE>` against fixed
 * per-dim (min, max) tables: `STRUCT<checksum STRING, mean_abs_err
 * DOUBLE>` where checksum is the md5 of the comma-joined quantized
 * levels and mean_abs_err the 6-dp-rounded mean reconstruction error —
 * the codegen'd form of embedding_quantize's four nested interpreted
 * lambdas (level transform, error transform, string-cast transform,
 * error-sum fold). Rounding replays Spark's `round` exactly
 * (BigDecimal.valueOf → setScale HALF_UP); the error accumulates
 * left-to-right. NULL elements: the checksum's join skips their entry
 * (concat_ws) and the error sum poisons to NULL (the `aggregate` fold)
 * — unreachable on the embeddings contract, kept for value fidelity.
 */
case class ScalarQuantizeStats(child: Expression, mns: Array[Double],
                               mxs: Array[Double], levels: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(mns.length == mxs.length, "min/max tables must align")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("checksum", StringType, nullable = false),
    StructField("mean_abs_err", DoubleType, nullable = true)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_scalar_quantize"

  override protected def nullSafeEval(v: Any): Any =
    ScalarQuantizeStats.stats(v.asInstanceOf[ArrayData], mns, mxs, levels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMns", mns, "double[]")
    val mx = ctx.addReferenceObj("sqMxs", mxs, "double[]")
    val cls = "org.apache.spark.sql.graftshim.ScalarQuantizeStats"
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = $cls.stats($a, $mn, $mx, $levels);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ScalarQuantizeStats {
  private def roundHalfUp(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One pass: quantized levels → checksum digits, reconstruction error
    * → 6-dp mean. Static forwarder target for codegen. */
  def stats(v: ArrayData, mns: Array[Double], mxs: Array[Double],
            levels: Int): InternalRow = {
    val d = mns.length
    val sb = new java.lang.StringBuilder(d * 4)
    var err = 0.0
    var poisoned = false
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) {
        poisoned = true // NULL element: error sum poisons (the fold)
        if (!(mxs(i) > mns(i))) { // constant dim: when's OTHERWISE fires
          if (sb.length() > 0) sb.append(',')
          sb.append(0)
        } // else the when yields NULL and concat_ws skips the entry
      } else {
        val x = v.getDouble(i)
        val mn = mns(i)
        val mx = mxs(i)
        val qd = if (mx > mn) roundHalfUp((x - mn) / (mx - mn) * levels, 0)
                 else 0.0
        if (sb.length() > 0) sb.append(',')
        sb.append(qd.toInt)
        err += math.abs(x - (mn + qd * (mx - mn) / levels))
      }
      i += 1
    }
    val checksum = GraftMd5.hexUtf8(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    new GenericInternalRow(Array[Any](checksum,
      if (poisoned) null else roundHalfUp(err / d, 6)))
  }
}
