package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.{ByteBuffer, ByteOrder}

/**
 * Compact binary record codec for topic transport — the measured wall of
 * round 10 was JSON encode/decode on the file-backed topics (a 64-double
 * embedding row serializes to ~1.4 KB of JSON text and pays a Jackson
 * parse per row; the binary form is 8 + 2 + 64·8 ≈ 530 bytes and a
 * ByteBuffer walk). These two expressions are the schema-driven
 * encode/decode halves; [[graft.streaming.BinaryTopics]] is the public
 * transport surface (and keeps JSON as the default twin).
 *
 * Wire format (little-endian), one record per Kafka-shaped `value`:
 *
 *   magic 'G' (1B) | version 1 (1B) | null bitmap (ceil(nFields/8) B)
 *   | per non-null field, schema order:
 *       LONG/TIMESTAMP  8B (timestamps as epoch-micros — Spark's own
 *                          internal representation, no conversion)
 *       INT             4B
 *       DOUBLE          8B
 *       BOOLEAN         1B
 *       STRING          4B length + UTF-8 bytes
 *       ARRAY<DOUBLE>   1B flag (1 = element-null bitmap follows)
 *                       + 4B count [+ ceil(count/8) B bitmap]
 *                       + 8B per non-null element
 *
 * Fixed-width primitives dominate the embedding stream, so decode is a
 * bounds-checked pointer walk. Both expressions are [[CodegenFallback]]
 * — the exact footing of Spark's own `JsonToStructs`/`StructsToJson`,
 * so swapping codecs never changes the plan shape around them.
 *
 * Tolerance contract (the `json.ignore-parse-errors` class, see
 * [[graft.streaming.JsonStreams.decode]]): ANY structural defect — short
 * buffer, wrong magic/version, negative or absurd length, trailing
 * garbage — nulls the whole record, which the topic reader then drops.
 * A binary record is one producer write, not hand-edited text, so the
 * JSON path's per-field salvage has nothing to salvage here: a damaged
 * record is damaged in transport, and the whole-record drop IS the
 * Kafka deserializer behavior for a corrupt message.
 */
object RecordCodec {

  val MAGIC: Byte = 'G'.toByte
  val VERSION: Byte = 1

  /** Types the codec carries; anything else is rejected at plan time. */
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType |
         TimestampType => true
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  def requireSupported(schema: StructType): Unit =
    schema.fields.foreach(f => require(supported(f.dataType),
      s"RecordCodec: unsupported field type ${f.dataType} for '${f.name}' " +
        "(supported: LONG, INT, DOUBLE, BOOLEAN, STRING, TIMESTAMP, " +
        "ARRAY<DOUBLE>)"))
}

/**
 * Encode a struct row into one [[RecordCodec]] binary value.
 * Null input row → null output (the upstream filter drops it).
 */
case class StructToRecordBinary(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // child is unresolved at construction; dataType is only legal to read
  // once the analyzer has resolved it
  private lazy val schema = child.dataType.asInstanceOf[StructType]

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case s: StructType =>
        val bad = s.fields.filterNot(f => RecordCodec.supported(f.dataType))
        if (bad.isEmpty)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"RecordCodec: unsupported field types " +
            bad.map(f => s"${f.name}: ${f.dataType}").mkString(", "))
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected a struct input, got $other")
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override protected def withNewChildInternal(newChild: Expression)
      : StructToRecordBinary = copy(child = newChild)

  private lazy val nullMapBytes = (schema.size + 7) / 8

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val fields = schema.fields
    // exact-size pass: fixed header + per-field payload
    var size = 2 + nullMapBytes
    var i = 0
    val strs = new Array[Array[Byte]](fields.length)
    while (i < fields.length) {
      if (!row.isNullAt(i)) fields(i).dataType match {
        case LongType | TimestampType | DoubleType => size += 8
        case IntegerType => size += 4
        case BooleanType => size += 1
        case StringType =>
          strs(i) = row.getUTF8String(i).getBytes
          size += 4 + strs(i).length
        case ArrayType(DoubleType, _) =>
          val arr = row.getArray(i)
          val n = arr.numElements()
          var hasNull = false
          var j = 0
          while (j < n && !hasNull) { hasNull = arr.isNullAt(j); j += 1 }
          size += 1 + 4 + (if (hasNull) (n + 7) / 8 else 0)
          j = 0
          while (j < n) { if (!arr.isNullAt(j)) size += 8; j += 1 }
        case other => throw new IllegalStateException(other.toString)
      }
      i += 1
    }
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(RecordCodec.MAGIC).put(RecordCodec.VERSION)
    val bmStart = buf.position()
    var b = 0
    while (b < nullMapBytes) { buf.put(0: Byte); b += 1 }
    i = 0
    while (i < fields.length) {
      if (row.isNullAt(i)) {
        val pos = bmStart + i / 8
        buf.put(pos, (buf.get(pos) | (1 << (i % 8))).toByte)
      } else fields(i).dataType match {
        case LongType | TimestampType => buf.putLong(row.getLong(i))
        case DoubleType => buf.putDouble(row.getDouble(i))
        case IntegerType => buf.putInt(row.getInt(i))
        case BooleanType => buf.put(if (row.getBoolean(i)) 1: Byte else 0: Byte)
        case StringType =>
          buf.putInt(strs(i).length).put(strs(i))
        case ArrayType(DoubleType, _) =>
          val arr = row.getArray(i)
          val n = arr.numElements()
          var hasNull = false
          var j = 0
          while (j < n && !hasNull) { hasNull = arr.isNullAt(j); j += 1 }
          buf.put(if (hasNull) 1: Byte else 0: Byte).putInt(n)
          if (hasNull) {
            val ebmStart = buf.position()
            var k = 0
            while (k < (n + 7) / 8) { buf.put(0: Byte); k += 1 }
            j = 0
            while (j < n) {
              if (arr.isNullAt(j)) {
                val pos = ebmStart + j / 8
                buf.put(pos, (buf.get(pos) | (1 << (j % 8))).toByte)
              } else buf.putDouble(arr.getDouble(j))
              j += 1
            }
          } else {
            j = 0
            while (j < n) { buf.putDouble(arr.getDouble(j)); j += 1 }
          }
        case other => throw new IllegalStateException(other.toString)
      }
      i += 1
    }
    buf.array()
  }
}

/**
 * Decode one [[RecordCodec]] binary value back into a struct row; any
 * structural defect yields NULL (whole-record drop — see the codec's
 * tolerance contract).
 */
case class RecordBinaryToStruct(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {

  RecordCodec.requireSupported(schema)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"expected a binary input, got $other")
    }

  override def dataType: DataType = schema
  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression)
      : RecordBinaryToStruct = copy(child = newChild)

  private val nullMapBytes = (schema.size + 7) / 8
  /** Sanity cap on variable-length counts: a corrupt length must fail
    * fast, not allocate gigabytes. Generous vs. any real topic row. */
  private val maxCount = 1 << 28

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (buf.remaining() < 2 + nullMapBytes) return null
      if (buf.get() != RecordCodec.MAGIC || buf.get() != RecordCodec.VERSION)
        return null
      val bmStart = buf.position()
      buf.position(bmStart + nullMapBytes)
      def isNull(i: Int): Boolean =
        (buf.get(bmStart + i / 8) & (1 << (i % 8))) != 0
      val out = new Array[Any](schema.size)
      var i = 0
      while (i < schema.size) {
        if (!isNull(i)) out(i) = schema.fields(i).dataType match {
          case LongType | TimestampType => buf.getLong()
          case DoubleType => buf.getDouble()
          case IntegerType => buf.getInt()
          case BooleanType => buf.get() != 0
          case StringType =>
            val n = buf.getInt()
            if (n < 0 || n > buf.remaining()) return null
            val s = new Array[Byte](n)
            buf.get(s)
            UTF8String.fromBytes(s)
          case ArrayType(DoubleType, _) =>
            val hasNulls = buf.get() != 0
            val n = buf.getInt()
            if (n < 0 || n > maxCount) return null
            if (hasNulls) {
              val ebmStart = buf.position()
              val ebmLen = (n + 7) / 8
              if (buf.remaining() < ebmLen) return null
              buf.position(ebmStart + ebmLen)
              val vals = new Array[Any](n)
              var j = 0
              while (j < n) {
                if ((buf.get(ebmStart + j / 8) & (1 << (j % 8))) == 0)
                  vals(j) = buf.getDouble()
                j += 1
              }
              new GenericArrayData(vals)
            } else {
              if (buf.remaining() < 8L * n) return null
              val vals = new Array[Double](n)
              var j = 0
              while (j < n) { vals(j) = buf.getDouble(); j += 1 }
              ArrayData.toArrayData(vals)
            }
          case other => throw new IllegalStateException(other.toString)
        }
        i += 1
      }
      // trailing garbage = structural defect (a truncated NEXT record
      // concatenated in, or a schema mismatch) — drop, don't guess
      if (buf.hasRemaining) return null
      InternalRow.fromSeq(out.toIndexedSeq)
    } catch {
      case _: java.nio.BufferUnderflowException => null
      case _: IndexOutOfBoundsException => null
    }
  }
}
