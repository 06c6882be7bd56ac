package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftshim.GraftFunctionRegistry

/**
 * SQL entry surface — the reference's user surface is SQL (its two jobs
 * are Flink SQL scripts, README.md:21-27), while this engine's primary
 * surface is the builder API. This registrar closes the gap: it mounts
 * the base tables, the native graft_* functions, and any subset of the
 * registered pipeline queries as TEMP VIEWS on a live session, so the
 * whole engine drives end-to-end from `spark.sql`:
 *
 *   GraftSql.register(spark, sfDir, Seq("ctr_by_campaign"))
 *   spark.sql("SELECT * FROM ctr_by_campaign WHERE campaign_id = 7")
 *
 * Views are LAZY plans — registering does not execute them, and a query
 * over a view composes with further SQL (filters/joins/aggregations on
 * top) under the same Catalyst optimization as the builder form; some
 * builders run their bounded index-build collects (PQ codebooks, IVF
 * centroids) at registration, which is the documented
 * collect-at-build contract of those operators. Temp views are
 * session-scoped: per-session registration, exactly like the
 * reference's per-session `CREATE TABLE` DDL preamble.
 *
 * SQL-vs-builder identity for the reference's event pipeline is pinned
 * in GraftSqlSpec (hash-identical results through `spark.sql`).
 */
object GraftSql {

  /** The driver-provided base tables ([[Tables.table]] names). */
  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings")

  /**
   * Knob-variant SQL views — the resolution of "parameterized queries
   * from pure SQL". Spark (this version) exposes no SQL table-function
   * REGISTRATION surface: built-in TVFs (`range(...)`) are hardwired in
   * the parser/analyzer, and `SparkSessionExtensions` injects scalar/agg
   * functions and rules, not parameterized relations — so a knob the
   * builder API takes as a parameter (`windowLength = "5 minutes"`)
   * cannot become `ctr_by_campaign(window => '5 minutes')` in SQL. The
   * idiomatic warehouse form is the one shipped here: NAMED VIEW
   * VARIANTS, one view per supported knob setting (`_5m` the way rollup
   * marts ship `_5m`/`_1h` tables), declared in this table so adding a
   * knob setting is one data row, not registrar code. Anything beyond
   * the declared settings stays a one-line builder call +
   * `createOrReplaceTempView` — per-session registration, the same
   * lifecycle as the reference's per-session DDL preamble.
   */
  val variants: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
    "ctr_by_campaign_5m" -> ((s: SparkSession, dir: String) =>
      graft.pipelines.AdPipelines.ctrByCampaign(
        EventQueries.joined(s, dir), windowLength = "5 minutes")),
    "engagement_by_device_5m" -> ((s: SparkSession, dir: String) =>
      graft.pipelines.AdPipelines.engagementByDevice(
        EventQueries.joined(s, dir), windowLength = "5 minutes")))

  /** Mount base tables + native SQL functions + the FULL registry as
    * temp views over `sfDir`. */
  def register(spark: SparkSession, sfDir: String): Unit =
    register(spark, sfDir, graft.SparkEntry.queries.keys.toSeq)

  /**
   * Mount base tables + native SQL functions + the named pipeline
   * queries as temp views over `sfDir`.
   *
   * @param names registry names to mount (unknown names raise); pass a
   *              subset to skip builders whose index-build collects you
   *              don't want to pay at registration
   */
  def register(spark: SparkSession, sfDir: String,
               names: Seq[String]): Unit = {
    baseTables.foreach(t =>
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t))
    // events needs its epoch-ms normalization (TESTDATA nanos parquet)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    GraftFunctionRegistry.register(spark)
    val registry = graft.SparkEntry.queries
    val unknown = names.filterNot(registry.contains)
    require(unknown.isEmpty, s"unknown registry queries: $unknown")
    names.foreach(n => registry(n)(spark, sfDir).createOrReplaceTempView(n))
    // knob-variant views are lazy plans over the same shared join memo —
    // mounting them costs nothing until queried
    variants.foreach { case (n, build) =>
      build(spark, sfDir).createOrReplaceTempView(n)
    }
  }

  /**
   * Mount the physical-layout TABLES as SQL views — opt-in (separate
   * from [[register]] because first mount PROVISIONS the layouts: a
   * one-time partitioned/z-ordered write, cached across JVMs, where
   * plain view registration is lazy). After this call a pure-SQL user
   * gets the layout's scan economics through ordinary WHERE clauses:
   *
   *   - `events_dated` — the date-partitioned layout; a filter on
   *     `event_date` prunes whole directories at FILE LISTING time, so
   *     `WHERE event_date BETWEEN ...` reads only those days' files
   *     (the registered `events_layout_prune` query's mechanics, now
   *     open-ended to any SQL).
   *   - `events_zordered` — the (user_id, value) Z-ordered layout;
   *     Morton clustering tightens per-file min/max on BOTH keys, so
   *     parquet row-group/file skipping serves two-sided box filters.
   *     (The `_graft_stats` manifest path — file-grain skipping before
   *     parquet even opens — needs per-box pruning args and therefore
   *     stays a builder call, `TableLayout.readStatsPruned`; it is
   *     registered as the oracle-checked `events_zorder_box`.)
   */
  def registerLayout(spark: SparkSession, sfDir: String): Unit = {
    graft.sources.TableLayout.eventsDatePartitioned(spark, sfDir)
      .createOrReplaceTempView("events_dated")
    spark.read.parquet(graft.sources.TableLayout.eventsZOrdered(spark, sfDir))
      .createOrReplaceTempView("events_zordered")
    // the IVF cell layout: WHERE cell IN (...) prunes cell directories
    // at listing, the SQL half of similarity_ivf_pruned's read path
    spark.read.parquet(
        graft.sources.TableLayout.embeddingsCellPartitioned(spark, sfDir))
      .createOrReplaceTempView("embeddings_cells")
    // the by-source documents layout (r12): WHERE source IN (...) prunes
    // source directories at listing — the SQL half of docs_layout_prune
    spark.read.parquet(
        graft.sources.TableLayout.documentsSourcePartitioned(spark, sfDir))
      .createOrReplaceTempView("documents_by_source")
  }

  /**
   * Mount a CUSTOM data contract from pure declarations — the contract
   * twin of the knob-variant resolution: the checks are DATA (the
   * [[graft.contracts.Contracts.parseCheck]] spec grammar), held in any
   * SQL-visible relation with a `spec STRING` column, so a pure-SQL user
   * declares thresholds with a `SELECT ... AS spec UNION ALL ...` (or a
   * real config table) and mounts the report with one registrar call:
   *
   *   spark.sql("""CREATE TEMP VIEW my_checks AS
   *     SELECT 'in_range:value:0|80' AS spec
   *     UNION ALL SELECT 'not_null:user_id'""")
   *   GraftSql.registerContract(spark, "my_report", "events", "my_checks",
   *     uniqueKeys = Seq(Seq("event_id")))
   *   spark.sql("SELECT * FROM my_report WHERE NOT pass")
   *
   * Three views mount per contract: `<name>` (the
   * [[graft.contracts.Contracts.validate]] audit report),
   * `<name>_quarantine` (the per-row split over the row-grain checks),
   * and `<name>_monitor_daily` (the windowed violation monitor at daily
   * grain over `tsCol`, when a `tsCol` is given). The spec relation is
   * read ONCE at mount (a contract is bounded config, not a stream);
   * re-mount to pick up edits — the same lifecycle as every temp view
   * here.
   *
   * @param table any mounted base-table name ([[register]]) or temp view
   */
  def registerContract(spark: SparkSession, name: String, table: String,
                       specsView: String,
                       uniqueKeys: Seq[Seq[String]] = Seq.empty,
                       tsCol: Option[String] = None): Unit = {
    val specs = spark.table(specsView).select("spec")
      .collect().map(_.getString(0)).toIndexedSeq
    require(specs.nonEmpty, s"contract '$name': spec relation '$specsView' " +
      "holds no rows")
    val checks = graft.contracts.Contracts.parseChecks(specs)
    val src = spark.table(table)
    graft.contracts.Contracts.validate(src, checks, uniqueKeys)
      .createOrReplaceTempView(name)
    graft.contracts.Contracts.quarantine(src, checks)
      .createOrReplaceTempView(s"${name}_quarantine")
    tsCol.foreach { ts =>
      graft.contracts.Contracts.violationMonitor(src, checks,
          windowLength = "1 day", tsCol = ts)
        .createOrReplaceTempView(s"${name}_monitor_daily")
    }
  }
}
