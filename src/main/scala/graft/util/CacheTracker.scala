package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared cache-ownership helper behind `Dedup.releaseCaches` and
  * `AnalyticsQueries.releaseCaches` (one implementation, not two
  * drifting copies): persisted intermediates are MEMORY_AND_DISK —
  * blocks evicted from memory move to disk and stay until unpersist,
  * so long-lived sessions sweeping many corpora must release between
  * corpora. Unpersisting is always safe: already-computed results are
  * unaffected, un-executed lazy plans recompute.
  */
final class CacheTracker {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def trackPersist(df: DataFrame): DataFrame = tracked.synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked += p
    p
  }

  def release(): Unit = tracked.synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Unpersist ONE tracked frame and forget it — for early releases
    * (e.g. a dispatch decision abandoning a probe frame) that would
    * otherwise leave a dead reference pinned until [[release]].
    */
  def releaseOne(df: DataFrame): Unit = tracked.synchronized {
    df.unpersist(blocking = false)
    val i = tracked.indexWhere(_ eq df)
    if (i >= 0) tracked.remove(i)
  }
}
