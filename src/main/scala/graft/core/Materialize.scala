package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

/** Cache-hygiene helpers for query-shaped compositions.
  *
  * The problem they solve: a query that persists a shared intermediate
  * (the shingle relation, a retrieval pool) and returns a LAZY plan
  * over it leaves that relation pinned in the session's CacheManager
  * after the caller's action — nothing ever unpersists it, so a
  * long-lived session accumulates MEMORY_AND_DISK relations until
  * someone calls clearCache() (which would also nuke the user's own
  * caches — hostile in a shared session).
  *
  * The fix is a scoped lifecycle: persist the intermediate, build the
  * result plan over it, MATERIALIZE the result once via an eager
  * localCheckpoint, release the intermediate, and hand back the
  * checkpointed result. Checkpoint blocks differ from cache entries in
  * the way that matters: they are owned by the RDD and freed by the
  * ContextCleaner as soon as the result DataFrame becomes unreachable,
  * whereas a CacheManager entry is pinned forever regardless of
  * reachability. Net: after the caller consumes the result, NOTHING
  * stays cached.
  *
  * Scale contract: the materialized relation is the RESULT (pairs,
  * labels, flags — bounded output), not the corpus-sized intermediate;
  * the intermediate's cache lives only for the duration of the single
  * materializing job, exactly as long as it is useful. On a real
  * cluster localCheckpoint trades executor-loss tolerance for speed —
  * for fault-critical pipelines keep the library's lazy entry points
  * and manage the documented cache lifecycle explicitly.
  */
object Materialize {

  /** Materialize `result` eagerly, then release `caches`. The release
    * runs even when the checkpoint job fails — otherwise a failed run
    * would leave the caches pinned in the CacheManager, exactly the
    * leak this helper exists to prevent. */
  def drained(result: DataFrame,
      caches: org.apache.spark.sql.Dataset[_]*): DataFrame =
    try result.localCheckpoint(true)
    finally caches.foreach(_.unpersist(blocking = true))

  /** Persist one shared intermediate for the duration of `body`'s
    * single materializing run. */
  def withCached(df: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val c = df.persist(MEMORY_AND_DISK)
    try body(c).localCheckpoint(true)
    finally { c.unpersist(blocking = true); () }
  }

  /** Two-intermediate variant (e.g. a pool and its pairwise sims,
    * where the second is itself built over the first). */
  def withCached2(a: DataFrame)(mkB: DataFrame => DataFrame)(
      body: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val ca = a.persist(MEMORY_AND_DISK)
    try {
      val cb = mkB(ca).persist(MEMORY_AND_DISK)
      try body(ca, cb).localCheckpoint(true)
      finally { cb.unpersist(blocking = true); () }
    } finally { ca.unpersist(blocking = true); () }
  }
}
