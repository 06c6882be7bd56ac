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
    * own monitor. `discard()` unpersists whatever the cell built — if a
    * build is in flight it blocks on the cell monitor until the build
    * completes, and a cell discarded BEFORE its build finishes unpersists
    * its own result on completion (ADVICE r6: a cell removed from the map
    * mid-build used to finish building a persisted frame that nothing
    * could ever unpersist). Never-demanded cells stay unbuilt — discard
    * must not run builders just to drop their caches. */
  private final class Cell(mk: () => DataFrame) {
    @volatile private var value: DataFrame = _
    private var discarded = false
    def df: DataFrame = {
      if (value == null) synchronized {
        if (value == null) {
          value = mk()
          if (discarded) value.unpersist()
        }
      }
      value
    }
    def discard(): Unit = synchronized {
      discarded = true
      if (value != null) value.unpersist()
    }
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
  def clear(spark: SparkSession): Unit = {
    // Collect-then-discard: cell monitors are taken OUTSIDE the map lock.
    // An in-flight builder holds its cell monitor and may re-enter memo()
    // (nested memoization) which takes the map lock — discarding under
    // the map lock would deadlock against exactly that pair.
    val dropped = synchronized {
      val cells = frames.collect { case ((s, _, _), c) if s eq spark => c }.toList
      frames.filterInPlace { case ((s, _, _), _) => !(s eq spark) }
      cells
    }
    dropped.foreach(_.discard())
  }
}
