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

  /** Run every evictor for `spark` NOW — the spec hook for eviction
    * contracts (onApplicationEnd cannot fire per-session in a shared
    * test context). Production eviction stays listener-driven. */
  private[graft] def evictNow(spark: SparkSession): Unit = {
    tracked.remove(spark)
    evictors.forEach(f => f(spark))
  }

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

/** The per-(session, key) DataFrame-memo discipline in one place
  * (bigram pairs, DSIR features/selection — the corpus-sized
  * intermediates that must be materialized ONCE per session, not once
  * per query invocation):
  *   - the builder returns an already-persisted frame;
  *   - an EMPTY build is never memoized (its plan snapshots the empty
  *     file listing and would freeze the query at this key even after
  *     data lands) — it is unpersisted and returned as-is;
  *   - a lost putIfAbsent race unpersists the loser's copy;
  *   - entries evict (and unpersist) when the application ends. NOTE:
  *     evictors fire from onApplicationEnd, i.e. at CONTEXT stop —
  *     there is no per-newSession()-sibling death hook in Spark — so
  *     the unpersist is belt-and-braces for a future finer-grained
  *     eviction trigger, not a today-observable behavior change
  *     (Spark reclaims all blocks at context stop anyway).
  * Future fixes to any of these rules now exist exactly once. */
final class DfMemo[K] {
  import org.apache.spark.sql.DataFrame
  private val m = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, K), DataFrame]
  // Unpersist each evicted frame. Today this is belt-and-braces: the
  // evictor only fires at context stop (see the class doc note), where
  // Spark reclaims the blocks anyway — but if a finer-grained
  // per-session eviction trigger is ever added, this is the line that
  // keeps a dead newSession() sibling's DISK_ONLY blocks from
  // outliving it.
  SessionCaches.registerEvictor(s =>
    m.keySet.toSeq.filter(_._1 eq s).foreach { k =>
      m.remove(k).foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
    })

  def get(s: SparkSession, k: K)(build: => DataFrame): DataFrame = {
    SessionCaches.track(s)
    m.get((s, k)).getOrElse {
      val built = build
      if (built.limit(1).isEmpty) {
        built.unpersist(blocking = false); built
      } else m.putIfAbsent((s, k), built) match {
        case Some(winner) => built.unpersist(blocking = false); winner
        case None => built
      }
    }
  }
}
