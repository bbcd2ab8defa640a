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
  * IRLS) materialize inside their own loop and free their own
  * intermediate frames generation-by-generation; their FINAL
  * checkpoint blocks (which a DataFrame-level unpersist cannot free)
  * go through [[adoptRdds]] so `release()` covers them too.
  *
  * Scope constraint: the ledger is JVM-global and SINGLE-SESSION by
  * design — the harness mains (Verify/Bench) and the test suite run
  * one SparkSession at a time. With two concurrent sessions, one
  * session's `release()` would free frames the other is still
  * materializing: plain persists survive via lineage recompute, but
  * adopted iterative results would silently replay their whole
  * convergence loop on the next read. Do not share this ledger
  * across concurrent sessions.
  */
object TrackedCache {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val liveRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

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

  /** Register checkpoint RDD blocks (e.g. a `localCheckpoint`'s
    * backing RDDs, which a DataFrame-level `unpersist` cannot free)
    * for the same `release()` sweep. A localCheckpoint has NO lineage
    * to recompute from, so a checkpoint-backed frame must not be
    * re-read after release — the harness contract (materialize the
    * result, then release) already guarantees that ordering. */
  def adoptRdds(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
    rdds.foreach(liveRdds.add)

  /** `localCheckpoint()` (eager) + RDD-ledger registration — the
    * deterministic replacement for "the ContextCleaner reclaims the
    * blocks when the frame dies": `release()` frees them at the next
    * harness sweep instead of waiting for a driver GC, so a long
    * Verify/Bench session never accumulates checkpoint blocks.
    *
    * FAILURE-MODE CONTRACT: a checkpoint has NO lineage, so unlike a
    * plain persist (which silently recomputes after unpersist), a
    * frame returned here HARD-FAILS ("checkpoint block not found") if
    * re-read after `release()`. Callers must fully materialize the
    * result (collect / write / hash) BEFORE the next release sweep —
    * the Verify/Bench harness does this by construction; code holding
    * results across release() must copy them out first. */
  def trackedLocalCheckpoint(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    adoptRdds(org.apache.spark.sql.GraftBridge.leafRdds(c))
    c
  }

  /** Unpersist every ledgered frame and checkpoint RDD (idempotent;
    * unpersisting an already-evicted or already-cleared entry is a
    * no-op). */
  def release(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
    var rdd = liveRdds.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      rdd = liveRdds.poll()
    }
  }

  def liveCount: Int = live.size()
  def liveRddCount: Int = liveRdds.size()

  implicit final class Trackable(private val df: DataFrame) extends AnyVal {
    /** `.persist(level)` + ledger registration — see [[TrackedCache]]. */
    def trackedPersist(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      track(df, level)

    /** `.localCheckpoint()` + RDD-ledger registration — see
      * [[TrackedCache.trackedLocalCheckpoint]]. */
    def trackedLocalCheckpoint(): DataFrame =
      TrackedCache.trackedLocalCheckpoint(df)
  }
}
