package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/**
 * Session-scoped memo of persisted intermediate frames shared across
 * registry queries — the batch analogue of the reference's sharing edges
 * (the STATEMENT SET's shared scan+join, flink/flink_job.sql:74-120, and
 * the ctr_results topic, flink/anomaly_job.sql:21).
 *
 * Concurrency: a plain synchronized map, NOT ConcurrentHashMap.computeIfAbsent
 * — builders recursively memoize their own inputs (ctr builds joined), and
 * nested computeIfAbsent on one CHM is forbidden (IllegalStateException
 * "Recursive update" when the keys share a bin). The object monitor is
 * reentrant, so nested memo calls from the same thread are safe.
 *
 * Lifecycle: entries for stopped sessions are swept on every access so a
 * long-lived JVM that cycles sessions (test suites, notebooks) does not
 * pin dead sessions or their cached lineage forever.
 */
object SharedFrames {

  private val frames =
    scala.collection.mutable.HashMap.empty[(SparkSession, String, String), DataFrame]

  def memo(spark: SparkSession, sfDir: String, tag: String,
           persist: Boolean = true)
          (build: => DataFrame): DataFrame = synchronized {
    frames.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    frames.get((spark, sfDir, tag)) match {
      case Some(df) => df
      case None =>
        val df = if (persist) build.persist(StorageLevel.MEMORY_AND_DISK) else build
        frames.put((spark, sfDir, tag), df)
        df
    }
  }

  /** Drop every memo for `spark`, unpersisting the memoized frames.
    * Frames a builder persisted INSIDE a memoized plan (LSH band indexes
    * etc.) are not tracked here — follow with
    * `spark.catalog.clearCache()` to drop those too. Used by Bench
    * between the warmup pass and the timed loop so warm-dir caches don't
    * occupy executor storage while the timed dir is measured. */
  def clear(spark: SparkSession): Unit = synchronized {
    frames.filterInPlace { case ((s, _, _), df) =>
      if (s eq spark) { df.unpersist(); false } else true
    }
  }
}
