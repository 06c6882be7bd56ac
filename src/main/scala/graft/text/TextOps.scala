package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/**
 * Tokenization and shingling primitives for the training-data pipeline
 * operators (dedup, fingerprinting, text analysis). All pure Catalyst
 * built-ins — `split`/`transform`/`sequence` stay inside whole-stage
 * codegen; no UDFs anywhere on the hot path.
 *
 * The DuckDB oracles replicate each expression verbatim
 * (`string_split` / `list_transform` / `range`), so tokenization must be
 * byte-identical across engines: plain single-space split, no trimming,
 * no regex classes with engine-specific semantics.
 */
object TextOps {

  /** Whitespace tokens; matches DuckDB `string_split(text, ' ')`. */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Unicode NFC normalization ([[org.apache.spark.sql.graftshim
    * .NfcNormalize]] — codegen'd, JDK `java.text.Normalizer`): folds
    * canonically equivalent sequences ("é" composed U+00E9 vs
    * decomposed "e"+U+0301) to one byte form. DuckDB oracle twin:
    * `nfc_normalize(text)`. */
  def normalizeNfc(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(
      org.apache.spark.sql.graftshim.NfcNormalize(
        org.apache.spark.sql.graftshim.ColumnShim.expression(text)))

  /**
   * Unicode-aware tokens: NFC-normalize, casefold via `lower`, split on
   * runs of anything that is not a Unicode letter or digit
   * (`[^\p{L}\p{N}]+` — identical semantics in Java regex and RE2), and
   * drop the empty boundary tokens the split leaves at leading/trailing
   * separators. This is what makes dedup / BPE / vocabulary statistics
   * trustworthy on non-Latin and mixed-script text, where the default
   * single-space split treats "Москва," and "Москва" as different
   * types and canonically equivalent accents as different bytes.
   *
   * DuckDB oracle twin (verbatim the same pipeline):
   * `list_filter(regexp_split_to_array(lower(nfc_normalize(text)),
   * '[^\p{L}\p{N}]+'), t -> t <> '')`.
   *
   * Deliberately NOT the default: the whitespace tokenizer is the
   * reference-parity surface every registered statistic was verified
   * on; callers opt in per frame (e.g.
   * [[graft.text.TextAnalysis.docTokenCounts]]'s `unicode` knob).
   * On pure-ASCII space-separated lowercase alphanumeric corpora the
   * two tokenizers agree exactly (fuzz-pinned in TextAnalysisSpec).
   */
  def unicodeTokens(text: Column): Column =
    // the empty-boundary drop is codegen'd (graftshim.ArrayDropEmpty,
    // r22) — `filter(_, t => t =!= "")` was an interpreted lambda on
    // every unicode-tokenized scan; the HOF form is kept below as the
    // TextOpsShimSpec equivalence baseline
    org.apache.spark.sql.graftshim.ColumnShim.column(
      org.apache.spark.sql.graftshim.ArrayDropEmpty(
        org.apache.spark.sql.graftshim.ColumnShim.expression(
          split(lower(normalizeNfc(text)), "[^\\p{L}\\p{N}]+", -1))))

  /** The pre-r22 interpreted form of [[unicodeTokens]] (equivalence
    * baseline for TextOpsShimSpec). */
  private[graft] def unicodeTokensHof(text: Column): Column =
    filter(split(lower(normalizeNfc(text)), "[^\\p{L}\\p{N}]+", -1),
      t => t =!= "")

  /**
   * Word n-gram shingles joined by single spaces, preserving duplicates:
   * element i is tokens[i..i+n-1], producing `size - n + 1` shingles.
   * Matches DuckDB
   * `list_transform(range(len(toks)-(n-1)), i -> toks[i+1] || ' ' || ...)`.
   * Documents shorter than n tokens yield an empty array (DuckDB's
   * `range` of a negative is empty; Spark's `sequence` is NOT — it counts
   * down — hence the guard in the HOF form this used to be).
   *
   * Codegen'd ([[org.apache.spark.sql.graftshim.WordShingles]], r21):
   * the `transform(sequence(...), i => concat_ws(" ", slice(...)))` HOF
   * was CodegenFallback — an interpreted lambda + O(n) slice per
   * element, ~2.4 s per corpus scan at sf0.1 — and value-identical to
   * this expression (pinned in TextOpsShimSpec).
   */
  def shingles(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    org.apache.spark.sql.graftshim.ColumnShim.column(
      org.apache.spark.sql.graftshim.WordShingles(
        org.apache.spark.sql.graftshim.ColumnShim.expression(toks), n))
  }

  /** The pre-r21 HOF form of [[shingles]] — kept as the equivalence
    * baseline TextOpsShimSpec pins the codegen'd expression against. */
  private[graft] def shinglesHof(toks: Column, n: Int): Column = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    val empty = lit(Array.empty[String]).cast(ArrayType(StringType))
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(empty)
  }

  /**
   * The engine-portable hash family used by MinHash and fingerprints:
   * `md5(salt || ':' || value)` as a lowercase hex string. Lexicographic
   * MIN over these strings is a valid uniform min-hash (the hex encoding
   * is order-preserving over the 128-bit value) and evaluates identically
   * in Spark and DuckDB — which keeps every sketch oracle-checkable.
   */
  def saltedHash(salt: Int, value: Column): Column =
    md5(concat(lit(s"$salt:"), value))
}
