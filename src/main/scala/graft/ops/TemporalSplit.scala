package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Temporal train/test split with an EMBARGO gap — the time-series
 * counterpart of the content-hash split ([[graft.text.TextAnalysis]]
 * `doc_split`): when samples are temporally correlated (user activity,
 * market data, trending topics), a random split leaks the test period
 * into training through near-in-time neighbors. The standard fix
 * (purged/embargoed splitting, López de Prado 2018, "Advances in
 * Financial Machine Learning" ch. 7) cuts by TIME and discards an
 * embargo band after the cut, so no training sample sits within the
 * correlation horizon of any test sample:
 *
 *   train:   ts ≤ cutoff           (the first `trainFrac` of the time axis)
 *   embargo: cutoff < ts ≤ cutoff + embargo   (dropped from both sides)
 *   test:    ts > cutoff + embargo
 *
 * The cutoff is the exact `trainFrac` percentile of the event-time
 * distribution (not of the calendar span — a bursty feed still puts
 * `trainFrac` of the ROWS in train), FLOORED to integer epoch-ms so
 * every boundary comparison is integer-exact in any engine — the same
 * no-float-boundary discipline as the md5 doc split.
 *
 * Scale shape: ONE tiny global aggregate (the percentile) collected at
 * build as a single scalar — the PQ-codebook collect contract — then a
 * pure per-row projection; no shuffle of the events themselves. At
 * 100 TB the same switch as the quantile profile applies
 * (`approx_percentile` for the cutoff at tolerance-grade precision).
 */
object TemporalSplit {

  /**
   * Rows with a NULL event time get the distinct `unsplit` label: a
   * timestamp-less row cannot be placed on the time axis, and a
   * leakage-prevention operator must not silently default it into the
   * EVAL side (the pre-r10 when-chain fallthrough did exactly that) —
   * downstream decides whether unsplit rows are dropped or repaired.
   * Null timestamps also do not participate in the percentile cutoff
   * (both engines' percentile functions skip nulls).
   *
   * @return the input rows (id/key columns preserved via `keep`) plus a
   *         `split` column ∈ {train, embargo, test, unsplit}
   */
  def splitByTime(events: DataFrame, tsCol: String = "ts",
                  keep: Seq[String] = Seq("event_id", "user_id"),
                  trainFrac: Double = 0.8,
                  embargoMs: Long = 3600000L): DataFrame = {
    require(trainFrac > 0 && trainFrac < 1, s"trainFrac $trainFrac not in (0,1)")
    require(embargoMs >= 0, s"embargoMs $embargoMs negative")
    val cutRow = events
      .select(floor(percentile(unix_millis(col(tsCol)), lit(trainFrac)))
        .cast("long").as("cut"))
      .collect()
    val cut = if (cutRow.isEmpty || cutRow(0).isNullAt(0)) Long.MinValue
      else cutRow(0).getLong(0)
    val ms = unix_millis(col(tsCol))
    events.select(keep.map(col) :+ col(tsCol) :+
      when(ms.isNull, "unsplit")
        .when(ms <= cut, "train")
        .when(ms <= cut + embargoMs, "embargo")
        .otherwise("test").as("split"): _*)
  }
}
