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

  /**
   * Word n-gram shingles joined by single spaces, preserving duplicates:
   * element i is tokens[i..i+n-1], producing `size - n + 1` shingles.
   * Matches DuckDB
   * `list_transform(range(len(toks)-(n-1)), i -> toks[i+1] || ' ' || ...)`.
   * Documents shorter than n tokens yield an empty array (DuckDB's
   * `range` of a negative is empty; Spark's `sequence` is NOT — it counts
   * down — hence the guard).
   */
  def shingles(toks: Column, n: Int): Column = {
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
