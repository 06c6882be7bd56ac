package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the sketch builders (MinHash,
 * winnowing) — the md5-dominated map passes over the shared shingle
 * arrays. The HOF forms (`transform(sh, s => md5(...))`,
 * `array_min(transform(...substring...))`, nested window-min slices)
 * are CodegenFallback: a lambda interpreter walks every shingle once
 * PER LANE / PER FRAME with per-element boxing. These fold each
 * signature in one native pass (md5 computed once per shingle per salt,
 * all lanes tracked together) with arithmetic identical to the HOF
 * lattice they replace — pinned in TextOpsShimSpec; the DuckDB oracles
 * (substr(md5(...)) slices, lexicographic list mins) are untouched.
 */

/**
 * k lexicographic-min MinHash lanes over a shingle array, as one
 * `ARRAY<STRING>` of k 8-hex-char minima. Lane i is
 * `min over shingles of substr(md5((i/4) || ":" || s), 1 + 8*(i%4), 8)`
 * — exactly [[graft.text.Dedup.minhashSignature]]'s column lattice:
 * each salted md5 yields four independent 32-bit lanes (disjoint
 * 8-hex-char slices). NULL elements are skipped (the `array_min`
 * convention); an array with no hashable element yields NULL lanes;
 * a NULL array yields NULL (callers filter empties first).
 */
case class MinHashLanes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"k must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(v: Any): Any =
    MinHashLanes.lanes(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = org.apache.spark.sql.graftshim.MinHashLanes.lanes($a, $k);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashLanes {
  private val HEX = "0123456789abcdef".getBytes("US-ASCII")
  // per-base salt bytes depend only on b — hoisted out of the element
  // loop (ADVICE r21); bases past the precomputed table (k > 256)
  // compute on the fly
  private val SALTS: Array[Array[Byte]] =
    Array.tabulate(64)(b => (b + ":").getBytes("UTF-8"))
  private def salt(b: Int): Array[Byte] =
    if (b < SALTS.length) SALTS(b) else (b + ":").getBytes("UTF-8")
  private val MD = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** hex[off..off+8) < cur, both lowercase-hex ASCII (UTF8String
    * comparison is unsigned-byte; hex bytes are ASCII, so signed
    * compare is identical). */
  private def less(hex: Array[Byte], off: Int, cur: UTF8String): Boolean = {
    var j = 0
    while (j < 8) {
      val a = hex(off + j)
      val c = cur.getByte(j)
      if (a != c) return a < c
      j += 1
    }
    false
  }

  /** The k lane minima; static forwarder target for codegen. Allocates
    * only when a lane's running minimum improves (ADVICE r21 — the
    * md5Hex → substring → UTF8String chain was per (shingle, lane)). */
  def lanes(sh: ArrayData, k: Int): ArrayData = {
    val nBase = (k + 3) / 4
    val mins = new Array[UTF8String](k)
    val md = MD.get()
    val hexBuf = new Array[Byte](32)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val sBytes = sh.getUTF8String(i).getBytes
        var b = 0
        while (b < nBase) {
          // md5((b + ":") ++ shingle) — the saltedHash family
          md.reset()
          md.update(salt(b))
          md.update(sBytes)
          val dig = md.digest()
          var d = 0
          while (d < 16) {
            hexBuf(2 * d) = HEX((dig(d) >> 4) & 0xf)
            hexBuf(2 * d + 1) = HEX(dig(d) & 0xf)
            d += 1
          }
          var lane = b * 4
          val laneEnd = math.min(lane + 4, k)
          while (lane < laneEnd) {
            val off = 8 * (lane % 4)
            if (mins(lane) == null || less(hexBuf, off, mins(lane)))
              mins(lane) = UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(hexBuf, off, off + 8), 0, 8)
            lane += 1
          }
          b += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }
}

/**
 * Winnowing window-min pick set over a shingle array: hash every
 * shingle with the salt-0 md5 (`saltedHash(0, s)`, the full 32-hex
 * string), slide a `window`-wide frame over the hash sequence, take
 * each frame's lexicographic minimum, and return the DISTINCT picks in
 * first-occurrence order — exactly
 * `array_distinct(transform(sequence(0, n-window), j =>
 * array_min(slice(hashes, j+1, window))))` with the `size >= window`
 * guard (fewer shingles than a frame → EMPTY array, as does a NULL
 * input, matching the `when/otherwise` of the HOF form).
 */
case class WinnowMins(child: Expression, window: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, s"window must be >= 1, got $window")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_winnow"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WordShingles.EMPTY
    else WinnowMins.picks(v.asInstanceOf[ArrayData], window)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val shCls = "org.apache.spark.sql.graftshim.WordShingles"
    val cls = "org.apache.spark.sql.graftshim.WinnowMins"
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? $shCls.EMPTY() : $cls.picks(${c.value}, $window);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {
  /** Distinct window-min md5 picks in first-occurrence order; < window
    * shingles → empty. Static forwarder target for codegen. */
  def picks(sh: ArrayData, window: Int): ArrayData = {
    val n = sh.numElements()
    if (n < window) return WordShingles.EMPTY()
    // hash pass: full 32-hex salted md5 per shingle (salt 0), null
    // elements stay null (array_min skips them)
    val hashes = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val sBytes = sh.getUTF8String(i).getBytes
        val buf = new Array[Byte](2 + sBytes.length)
        buf(0) = '0'; buf(1) = ':'
        System.arraycopy(sBytes, 0, buf, 2, sBytes.length)
        hashes(i) = UTF8String.fromString(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(buf))
      }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j + window <= n) {
      var m: UTF8String = null
      var t = j
      while (t < j + window) {
        val h = hashes(t)
        if (h != null && (m == null || h.compareTo(m) < 0)) m = h
        t += 1
      }
      // an all-null frame contributes array_min = NULL; array_distinct
      // keeps one null — replicate by admitting null into the pick set
      if (m == null) seen.add(null) else seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
