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
