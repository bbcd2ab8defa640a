package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-level ledger for operator-internal persists.
  *
  * Many operators persist an intermediate frame that several branches
  * of their (lazy) result plan re-read — the persist must outlive the
  * operator call, because only the CALLER knows when the result has
  * been materialized. A bare `.persist()` solves that by leaking: the
  * SQL CacheManager holds a strong reference until `clearCache()`, so
  * a long-lived session accumulates row-scale cached frames and every
  * later query runs under eviction pressure (the round-8 bench
  * contamination class).
  *
  * `trackedPersist` keeps the laziness (plan pins still see the real
  * operator shape, materialization still reuses the cache) but
  * records the frame in this ledger; the harness — `Verify` after
  * each query dump, `QueriesSpec` after each materialization, or any
  * long-lived user session between queries — calls `release()` to
  * free every operator-internal cache in one sweep. Releasing after
  * materialization is always safe: a released frame recomputes from
  * lineage if re-read.
  *
  * Iterative operators (Graph, Dedup's connected components, BPE,
  * IRLS) materialize inside their own loop and free their own frames
  * generation-by-generation — they do not use the ledger.
  */
object TrackedCache {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  def track(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    live.add(df)
    df
  }

  /** Register an ALREADY-persisted (or checkpointed) frame without
    * re-persisting — for operators whose result deliberately stays
    * cached past return (e.g. a converged iterative result whose
    * recomputation would replay the whole loop). `release()` then
    * frees it with everything else; unpersisting a checkpoint-backed
    * frame is a harmless no-op. */
  def adopt(df: DataFrame): DataFrame = {
    live.add(df)
    df
  }

  /** Unpersist every ledgered frame (idempotent; unpersisting an
    * already-evicted or already-cleared frame is a no-op). */
  def release(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }

  def liveCount: Int = live.size()

  implicit final class Trackable(private val df: DataFrame) extends AnyVal {
    /** `.persist(level)` + ledger registration — see [[TrackedCache]]. */
    def trackedPersist(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      track(df, level)
  }
}
