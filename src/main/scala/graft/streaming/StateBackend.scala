package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Streaming state-backend selection. The reference deployment runs its
 * job state on RocksDB (reference `docker-compose.yml:76-78`, SURVEY T6);
 * Spark's equivalent is the `RocksDBStateStoreProvider`, selected via the
 * session conf `spark.sql.streaming.stateStore.providerClass`. The
 * default HDFS-backed provider keeps every key's state on the JVM heap —
 * fine for tests, but a 100 TB deployment's join/dedup/session state must
 * spill off-heap, which is exactly what the RocksDB provider gives
 * (memtable + on-disk SST files per state store, changelog-checkpointed).
 *
 * A query captures the provider from the session conf AT START and keeps
 * it for the checkpoint lineage's lifetime (Spark persists state in the
 * provider's own format, so the two backends' checkpoints are not
 * interchangeable — restarts must keep the provider they started with).
 * [[withProvider]] therefore scopes the conf around the `start()` calls
 * and restores the previous value, so concurrently-built jobs in the same
 * session are unaffected.
 *
 * Exercised (not just cited) by StreamingJobsSpec's restart-recovery test
 * running the full main-job topology — interval join + two windowed aggs,
 * stop, restart, exactly-once — under RocksDB.
 */
object StateBackend {

  /** FQCN of Spark's RocksDB state store provider (spark-sql built-in;
    * the rocksdbjni native library ships in Spark's jars directory). */
  val RocksDb: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val Key = "spark.sql.streaming.stateStore.providerClass"

  /**
   * Runs `body` (typically one or more `writeStream.start()` calls) with
   * the session's state-store provider set to `provider`, restoring the
   * prior conf afterwards. `None` = leave the session default untouched.
   */
  def withProvider[A](spark: SparkSession, provider: Option[String])
                     (body: => A): A = provider match {
    case None => body
    case Some(cls) =>
      val old = spark.conf.getOption(Key)
      spark.conf.set(Key, cls)
      try body
      finally old match {
        case Some(v) => spark.conf.set(Key, v)
        case None    => spark.conf.unset(Key)
      }
  }
}
