package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native Catalyst expression — the text
 * pipeline's canonicalization step (graft.text.TextOps.normalizeNfc).
 *
 * Why an Expression and not a UDF: normalization runs on the corpus
 * hot path (every dedup / BPE / vocabulary statistic that opts into the
 * Unicode tokenizer pays it per document), and a Scala UDF would both
 * break whole-stage codegen and pay serialization per row. This
 * generates a direct call inside the codegen'd stage.
 *
 * Why it exists at all: real multi-script corpora carry canonically
 * equivalent byte sequences ("é" as U+00E9 vs "e"+U+0301) that MUST
 * compare equal before any exact/near dedup or token statistic is
 * trustworthy — Unicode-identical documents would otherwise dodge
 * every digest. JDK `java.text.Normalizer` implements the same Unicode
 * NFC the DuckDB oracle's `nfc_normalize` does, which keeps the
 * operator oracle-checkable.
 *
 * Fast path: `Normalizer.isNormalized` first — ASCII (and nearly all
 * already-composed text) takes a vectorized scan and returns the input
 * UTF8String untouched, no String round-trip; only genuinely
 * decomposed text pays the normalize allocation.
 */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftshim.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** UTF8String → NFC-normalized UTF8String (identity fast path when
    * already normalized — the static forwarder generated codegen calls). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
