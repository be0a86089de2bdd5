package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-lifetime bookkeeping for the plan/memo caches that are keyed
  * by SparkSession (Tables.dfCache, Dedup.pairCache, KMeans.fitCache).
  *
  * Those caches are TrieMaps with no eviction, so in a long-lived
  * multi-session JVM a stopped session (and every DataFrame it pinned)
  * would be retained forever. Each cache registers an evictor once; each
  * session is tracked once, and when its context ends all evictors run
  * for it.
  */
object SessionCaches {

  private val evictors =
    new java.util.concurrent.ConcurrentLinkedQueue[SparkSession => Unit]()
  private val tracked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Register a callback that drops one cache's entries for a session.
    * Call once per cache object (from its companion's initializer). */
  def registerEvictor(f: SparkSession => Unit): Unit = evictors.add(f)

  /** Ensure `spark`'s cache entries are evicted when its application
    * ends. Idempotent per session; call on every cache insert. */
  def track(spark: SparkSession): Unit =
    if (tracked.add(spark)) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          tracked.remove(spark)
          evictors.forEach(f => f(spark))
        }
      })
    }
}
