package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/**
 * Session-scoped memo of persisted intermediate frames shared across
 * registry queries — the batch analogue of the reference's sharing edges
 * (the STATEMENT SET's shared scan+join, flink/flink_job.sql:74-120, and
 * the ctr_results topic, flink/anomaly_job.sql:21).
 *
 * Concurrency: the global monitor guards only the MAP; each entry is a
 * cell that builds its frame under its own lock. Heavy builders (the
 * cluster-propagation loop, the IVF k-means fit — both run Spark actions
 * at build time) therefore never serialize unrelated queries behind the
 * object monitor; two threads demanding the same key race to the cell
 * and the loser blocks on that cell alone. Nested memoization (a builder
 * memoizing its own inputs) re-enters the map lock briefly and then
 * builds in a DIFFERENT cell — no deadlock as long as builder
 * dependencies form a DAG, which registry builders do. (This is also why
 * not ConcurrentHashMap.computeIfAbsent: nested computeIfAbsent on one
 * CHM throws "Recursive update" when keys share a bin.)
 *
 * Lifecycle: entries for stopped sessions are swept on every access so a
 * long-lived JVM that cycles sessions (test suites, notebooks) does not
 * pin dead sessions or their cached lineage forever.
 */
object SharedFrames {

  /** Double-checked-locked build cell: `df` builds once under the cell's
    * own monitor; `builtFrame` peeks without triggering a build (clear()
    * must not build never-demanded entries just to unpersist them). */
  private final class Cell(mk: () => DataFrame) {
    @volatile private var value: DataFrame = _
    def df: DataFrame = {
      if (value == null) synchronized { if (value == null) value = mk() }
      value
    }
    def builtFrame: Option[DataFrame] = Option(value)
  }

  private val frames =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), Cell]

  def memo(spark: SparkSession, sfDir: String, tag: String,
           persist: Boolean = true)
          (build: => DataFrame): DataFrame = {
    val cell = synchronized {
      frames.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
      frames.getOrElseUpdate((spark, sfDir, tag), new Cell(() =>
        if (persist) build.persist(StorageLevel.MEMORY_AND_DISK) else build))
    }
    cell.df
  }

  /** Drop every memo for `spark`, unpersisting the frames that were
    * actually built. Frames a builder persisted INSIDE a memoized plan
    * (LSH band indexes etc.) are not tracked here — follow with
    * `spark.catalog.clearCache()` to drop those too. Used by Bench
    * between the warmup pass and the timed loop so warm-dir caches don't
    * occupy executor storage while the timed dir is measured. */
  def clear(spark: SparkSession): Unit = synchronized {
    frames.filterInPlace { case ((s, _, _), cell) =>
      if (s eq spark) { cell.builtFrame.foreach(_.unpersist()); false } else true
    }
  }
}
