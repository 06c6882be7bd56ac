package graft.privacy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * PII handling for training-data release — the privacy pass a curation
 * pipeline runs before events or documents leave the trust boundary:
 *
 *  - '''Pseudonymization''': replace a direct identifier with a salted
 *    MD5 digest. Deterministic (the same user maps to the same pseudonym
 *    everywhere, so joins and per-user aggregates still work) but
 *    irreversible without the salt — the standard release-pipeline
 *    trade between utility and re-identification risk. Same
 *    `md5(salt || ':' || value)` family as `TextOps.saltedHash`, so the
 *    DuckDB oracle replicates it verbatim.
 *  - '''Small-cell suppression''' (the k-anonymity audit): any released
 *    aggregate cell backed by fewer than k underlying events is flagged
 *    `suppressed`; the release step drops or coarsens those cells. Cell
 *    statistics are restricted to order-independent reductions (count,
 *    min, max) so the audit is bit-identical across engines and across
 *    shuffle orders — no float-sum nondeterminism in a compliance
 *    artifact.
 *
 * Scale shape: one hash aggregation keyed on (pseudonym, type) — the
 * pseudonym is computed BEFORE the shuffle, so raw identifiers never
 * travel; map-side partial aggregation absorbs hot users. The row-level
 * [[pseudonymize]] is a pure per-row projection: no shuffle, no state,
 * stream-safe as-is.
 */
object Privacy {

  /** Salted-MD5 pseudonym (lowercase hex) for any identifier column. */
  def pseudonym(id: Column, salt: String = "pii"): Column =
    md5(concat(lit(salt + ":"), id.cast("string")))

  /** Row-level release feed: the identifier column replaced in place by
    * its pseudonym (column type becomes string). Stateless → usable
    * unchanged under Structured Streaming at ingest time. */
  def pseudonymize(df: DataFrame, idCol: String, salt: String = "pii"): DataFrame =
    df.withColumn(idCol, pseudonym(col(idCol), salt))

  /** PII surface patterns, in redaction order. Restricted to constructs
    * with identical semantics in Java regex and RE2 (character classes,
    * bounded repeats, alternation — no lookaround, no backrefs) so the
    * DuckDB oracle replicates detection byte-for-byte. Detection-grade,
    * not validation-grade (an IP octet may exceed 255): curation
    * pipelines over-redact rather than under-redact. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "phone" -> "\\+[0-9]{7,15}|[0-9]{3}-[0-9]{3,4}-[0-9]{4}")

  /**
   * Per-document PII scrub: match counts per pattern, the redacted text
   * (each match replaced by its `[TAG]`), and the scrubbed text's MD5 —
   * the digest, not the text, is what a 100 TB audit table carries; the
   * redacted corpus itself stays in the data plane. Pure per-row regex
   * projection: no shuffle, stream-safe, scales by partition count.
   */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) { case (c, (tag, re)) =>
      regexp_replace(c, re, s"[${tag.toUpperCase}]")
    }
    val counts = piiPatterns.map { case (tag, re) =>
      tag -> size(regexp_extract_all(col(textCol), lit(re), lit(0)))
    }
    docs.select(
      (col("doc_id") +: counts.map { case (t, c) => c.as(s"n_$t") }) :+
        (counts.map(_._2).reduce(_ + _) === 0).as("clean") :+
        md5(redacted).as("redacted_md5"): _*)
  }

  /** Released per-(user, event_type) aggregate with the k-anonymity
    * verdict: `suppressed` = cell count < k. */
  def releaseAudit(events: DataFrame, k: Int = 10, salt: String = "pii"): DataFrame =
    events
      .groupBy(pseudonym(col("user_id"), salt).as("user_pseudonym"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .withColumn("suppressed", col("n_events") < k)
}
