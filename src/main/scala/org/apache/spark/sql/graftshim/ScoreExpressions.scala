package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/**
 * Hashed-bucket weight-table scoring as ONE native Catalyst expression —
 * the ingest-time hot scalar of the stateless classifier twins
 * ([[graft.text.TextAnalysis.hashedLinearScoreStateless]] /
 * `langIdTrainedStateless`): for each of `tables.length` µ-int weight
 * tables, Σ over the input array's elements of
 * `table[ parseHex8(md5(elem)) % table.length ]`, returned as one
 * `ARRAY<LONG>` of per-table sums.
 *
 * Why an Expression: the HOF form — one `aggregate(arr, 0L, (acc, t) =>
 * acc + element_at(typedlit(w), bucket(t)))` fold PER TABLE — is
 * CodegenFallback (a lambda interpreter per element per table) and
 * re-hashes every element once per table; on the streaming ingest path
 * that interpreter runs per row per microbatch. This computes the md5
 * ONCE per element (first 4 digest bytes == the `substring(md5, 1, 8)`
 * hex the fold parses — value-identical by construction) and folds all
 * tables in one pass of straight-line code, inside whole-stage codegen.
 *
 * Null semantics match the fold exactly: NULL array → NULL; a NULL
 * element poisons every sum to NULL (md5(null) → null → acc + null).
 * Long addition in element order is the fold's exact arithmetic.
 * Equivalence pinned in TextOpsShimSpec.
 */
case class BucketWeightSums(child: Expression, tables: Array[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {
  require(tables.nonEmpty && tables.forall(_.nonEmpty),
    "at least one non-empty weight table")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // a null ELEMENT yields null even off a non-nullable child
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bucketsums"

  override protected def nullSafeEval(v: Any): Any =
    BucketWeightSums.sums(v.asInstanceOf[ArrayData], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tbl = ctx.addReferenceObj("bwsTables", tables, "long[][]")
      val out = ctx.freshName("out")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  org.apache.spark.sql.graftshim.BucketWeightSums.sums($a, $tbl);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // tables is an Array — reference equality would break plan equality
  // (canonicalization, cache lookup), so compare contents
  override def equals(other: Any): Boolean = other match {
    case b: BucketWeightSums =>
      child == b.child && tables.length == b.tables.length &&
        tables.zip(b.tables).forall { case (x, y) => java.util.Arrays.equals(x, y) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + tables.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

object BucketWeightSums {
  /** Per-table Σ w[bucket(elem)] over the array; null on a null element
    * (the fold's poison). Static forwarder target for codegen. bucket =
    * first 4 md5 digest bytes as an unsigned 32-bit value mod the table
    * length — exactly `conv(substring(md5(t), 1, 8), 16, 10) % n`. */
  def sums(arr: ArrayData, tables: Array[Array[Long]]): ArrayData = {
    val nT = tables.length
    val out = new Array[Long](nT)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = org.apache.commons.codec.digest.DigestUtils.md5(
        arr.getUTF8String(i).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var t = 0
      while (t < nT) {
        out(t) += tables(t)((h % tables(t).length).toInt)
        t += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
