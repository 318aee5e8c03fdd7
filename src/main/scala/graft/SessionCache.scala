package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A (SparkSession, sfDir)-keyed cache for materialized (localCheckpoint'd)
  * DataFrames shared across operators — the "write the intermediate once,
  * run N jobs against it" shape.
  *
  * Lifetime: entries for a session are evicted when its SparkContext ends
  * (listener registered on first insert), so checkpointed blocks are not
  * pinned past the session and stopped-session entries cannot leak for the
  * JVM's life. `invalidate(session)` / `invalidateAll()` exist for tests
  * that regenerate fixture parquet under an unchanged path within one
  * session — the cache cannot detect that, and would otherwise serve stale
  * data silently.
  */
final class SessionCache {
  private val m = new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrElseUpdate(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          invalidate(s)
      })
    }
    m.computeIfAbsent((s, key), _ => build)
  }

  /** Drop all entries owned by `s` (also called automatically at context end). */
  def invalidate(s: SparkSession): Unit = {
    m.keySet.removeIf(k => k._1 eq s)
    hooked.remove(s)
  }

  def invalidateAll(): Unit = { m.clear(); hooked.clear() }

  private[graft] def size: Int = m.size
}
