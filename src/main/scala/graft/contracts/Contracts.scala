package graft.contracts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}

/**
 * Declarative data contracts — the validation gate a production ingest
 * runs before anything downstream trusts a table (the deequ/Great-
 * Expectations shape, engine-native). A contract is a list of checks;
 * the module answers two questions at two grains:
 *
 *  - [[validate]]: per CHECK, how many rows violate it — the audit
 *    report. Every row-grain check folds into ONE shared aggregation
 *    pass (a sum of violation indicators per check — map-side partial,
 *    single result row, zero extra scans per check), then pivots to one
 *    row per check. Uniqueness is the exception by nature: each
 *    distinct key set needs its own count-distinct-grain aggregation,
 *    priced as one extra shuffle per key set.
 *  - [[quarantine]]: per ROW, which row-grain checks it violates — the
 *    ingest-time split (violating rows to a quarantine sink, clean rows
 *    onward). A pure projection (violation list built from the same
 *    predicate expressions, no join, no aggregation, zero state), so it
 *    runs unchanged on an unbounded stream — uniqueness deliberately
 *    excluded: "is this key duplicated" is not a property of a row, and
 *    on a stream it is the watermark-bounded dedup operator's job
 *    ([[graft.streaming.StreamingCuration.exactDedup]]).
 *
 * Violation DETAILS stay portable: `violations` is a semicolon-joined
 * ordered list of check names (a string, not an array, so results
 * hash-compare across engines; semicolons because the names themselves
 * contain commas).
 */
object Contracts {

  /** A named row-grain predicate: `holds` is TRUE when the row PASSES.
    * NULL semantics are the check's own business — every constructor
    * below pins them explicitly (a NULL comparison result counts as a
    * violation, never as a silent pass). */
  final case class Check(name: String, holds: Column)

  /** Column must be non-null. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", col(c).isNotNull)

  /** Column must be inside [lo, hi] (inclusive); NULL violates. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      coalesce(col(c) >= lo && col(c) <= hi, lit(false)))

  /** Column value must be one of `allowed`; NULL violates (add an
    * explicit notNull-free variant by including null in the set via
    * [[inSetOrNull]]). */
  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"in_set($c)", coalesce(col(c).isin(allowed: _*), lit(false)))

  /** Like [[inSet]] but NULL passes — for optional enum columns. */
  def inSetOrNull(c: String, allowed: Seq[String]): Check =
    Check(s"in_set_or_null($c)",
      col(c).isNull || coalesce(col(c).isin(allowed: _*), lit(false)))

  /** Event-time must lie in [lo, hi) — the not-before-epoch /
    * not-in-the-future guard; NULL violates. */
  def tsBetween(c: String, lo: String, hi: String): Check =
    Check(s"ts_between($c)",
      coalesce(col(c) >= to_timestamp(lit(lo)) &&
        col(c) < to_timestamp(lit(hi)), lit(false)))

  /** String length bound (a malformed-blob guard); NULL violates. */
  def lengthAtMost(c: String, maxLen: Int): Check =
    Check(s"length_at_most($c,$maxLen)",
      coalesce(length(col(c)) <= maxLen, lit(false)))

  /**
   * Parse one declarative check SPEC into a [[Check]] — the checks-as-
   * DATA form, so a contract can live in a config row, a SQL literal, or
   * a spec table instead of builder code (the
   * [[graft.queries.GraftSql.variants]] resolution applied to
   * contracts: Spark exposes no SQL DDL surface for custom constraint
   * registration, so the declaration is data and the mount is one
   * registrar call). Grammar — `kind:column[:arg1|arg2|...]`; the
   * argument list splits on `|` (never on `:`, so timestamp arguments
   * keep their colons):
   *
   *   not_null:c
   *   in_range:c:lo|hi              (numeric bounds, inclusive)
   *   in_set:c:v1|v2|...            (set values must not contain '|')
   *   in_set_or_null:c:v1|v2|...
   *   ts_between:c:lo|hi            ("yyyy-MM-dd HH:mm:ss" bounds)
   *   length_at_most:c:n
   *
   * Uniqueness is deliberately NOT a row-grain spec (it is not a
   * property of a row — [[validate]] takes `uniqueKeys` separately).
   * Unknown kinds and malformed argument lists throw at parse time:
   * a contract that silently drops a misspelled check is worse than
   * none.
   */
  def parseCheck(spec: String): Check = {
    val parts = spec.split(":", 3)
    require(parts.length >= 2, s"malformed check spec '$spec' " +
      "(expected kind:column[:args])")
    val (kind, c) = (parts(0).trim, parts(1).trim)
    def args: Array[String] =
      if (parts.length < 3) Array.empty else parts(2).split("\\|").map(_.trim)
    def nArgs(n: Int): Array[String] = {
      val a = args
      require(a.length == n,
        s"check spec '$spec': $kind wants $n argument(s), got ${a.length}")
      a
    }
    kind match {
      case "not_null" => notNull(c)
      case "in_range" =>
        val a = nArgs(2); inRange(c, a(0).toDouble, a(1).toDouble)
      case "in_set" => inSet(c, args.toIndexedSeq)
      case "in_set_or_null" => inSetOrNull(c, args.toIndexedSeq)
      case "ts_between" =>
        val a = nArgs(2); tsBetween(c, a(0), a(1))
      case "length_at_most" =>
        val a = nArgs(1); lengthAtMost(c, a(0).toInt)
      case other =>
        throw new IllegalArgumentException(
          s"unknown check kind '$other' in spec '$spec'")
    }
  }

  /** [[parseCheck]] over a declaration list. */
  def parseChecks(specs: Seq[String]): Seq[Check] = specs.map(parseCheck)

  private val reportSchema = StructType(Seq(
    StructField("constraint", StringType),
    StructField("n_violations", LongType),
    StructField("n_rows", LongType),
    StructField("pass", BooleanType)))

  /**
   * The audit report: one row per check — (constraint, n_violations,
   * n_rows, pass). All row-grain checks share ONE aggregation over one
   * scan; each `uniqueKeys` entry adds one key-grain aggregation
   * counting rows whose key occurs more than once (both members of a
   * duplicated pair are violations; all-NULL keys group together,
   * matching SQL GROUP BY).
   */
  def validate(df: DataFrame, checks: Seq[Check],
               uniqueKeys: Seq[Seq[String]] = Seq.empty): DataFrame = {
    val spark = df.sparkSession
    if (checks.isEmpty && uniqueKeys.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], reportSchema)
    val rowGrain: Option[DataFrame] =
      if (checks.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          checks.zipWithIndex.map { case (ch, i) =>
            sum(when(!ch.holds, 1L).otherwise(0L)).as(s"__v_$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(checks.zipWithIndex.map { case (ch, i) =>
            struct(lit(ch.name).as("constraint"),
              coalesce(col(s"__v_$i"), lit(0L)).as("n_violations"),
              col("__n").as("n_rows"))
          }: _*)).as("r"))
          .select(col("r.constraint"), col("r.n_violations"), col("r.n_rows"),
            (col("r.n_violations") === 0L).as("pass")))
      }
    val keyGrain: Seq[DataFrame] = uniqueKeys.map { keys =>
      // the per-key counts carry BOTH report numbers: Σ __c is the row
      // total and Σ __c over duplicated keys the violation count — one
      // key-grain aggregation, no separate total pass, no join
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(when(col("__c") > 1L, col("__c"))
            .otherwise(0L)), lit(0L)).as("n_violations"),
          coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
        .select(lit(s"unique(${keys.mkString(",")})").as("constraint"),
          col("n_violations"), col("n_rows"),
          (col("n_violations") === 0L).as("pass"))
    }
    (rowGrain.toSeq ++ keyGrain).reduce(_ unionByName _)
  }

  /**
   * Row-level split: the input columns plus `violations` (semicolon-
   * joined names of the row-grain checks the row fails, declaration
   * order, empty string for clean rows) and `keep` (no violations). Pure
   * projection — stream-safe with zero state; route `keep` onward and
   * `!keep` to the quarantine sink.
   */
  def quarantine(df: DataFrame, checks: Seq[Check]): DataFrame = {
    // concat_ws skips NULL arguments natively (codegen'd), so the
    // array_compact(array(...)) wrapper — which plans as an interpreted
    // ArrayFilter(isnotnull) lambda (r22) — is redundant
    df.withColumn("violations", concat_ws(";", checks.map(ch =>
        when(!ch.holds, lit(ch.name)).otherwise(lit(null: String))): _*))
      .withColumn("keep", col("violations") === "")
  }

  /**
   * Windowed violation monitor — the contract surface an on-call data-
   * quality owner watches: per tumbling event-time window, one row per
   * check with its violation count, plus a `__rows` row carrying the
   * window's total (every row contributes the sentinel, so rates are
   * one division away and a window with zero violations still reports).
   * ONE stateful aggregation (each row explodes to its violated checks
   * + the sentinel — bounded by |checks|+1, not data), append on window
   * close; the same code path runs batch (for the backfill twin) and
   * streaming, so counts agree across the boundary by construction —
   * pinned with late-within-watermark arrivals in ContractsSpec.
   * Output: (window_start, window_end, constraint, n).
   */
  def violationMonitor(df: DataFrame, checks: Seq[Check],
                       windowLength: String = "1 minute",
                       tsCol: String = "ingest_time",
                       watermarkDelay: String = "10 seconds"): DataFrame = {
    // the un-violated checks' NULL tags are dropped AFTER the explode by
    // a codegen'd isNotNull filter — array_compact plans as an
    // interpreted ArrayFilter(isnotnull) lambda per row (r22)
    val tagged = array(checks.map(ch =>
      when(!ch.holds, lit(ch.name)).otherwise(lit(null: String))) :+
      lit("__rows"): _*)
    val src = if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    src.select(col(tsCol), explode(tagged).as("constraint"))
      .filter(col("constraint").isNotNull)
      .groupBy(window(col(tsCol), windowLength), col("constraint"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("constraint"), col("n"))
  }
}
