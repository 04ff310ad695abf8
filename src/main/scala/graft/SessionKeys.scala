package graft

import org.apache.spark.sql.SparkSession

/** Stable, never-recycled integer id per live SparkSession, for keyed
  * caches.
  *
  * Caches across the repo keyed per-session entries (persisted staging
  * tables, harness connections) on `System.identityHashCode(session)`.
  * Identity hashes RECYCLE once a session is garbage-collected, so a
  * keyed cache could serve an entry bound to a stopped SparkContext to
  * an unrelated later session — r14's unnest fuzz suite died exactly
  * this way (`assertNotStopped` under AQE) via the Tables frame cache.
  * Ids here are handed out monotonically against WEAK keys: a dead
  * session's id is never reissued, so a collision is impossible; the
  * (tiny) cache entries of dead ids are unreachable rather than wrong,
  * and the existing release hooks still evict live entries.
  */
object SessionKeys {
  private val ids = new java.util.WeakHashMap[SparkSession, Integer]()
  private val next = new java.util.concurrent.atomic.AtomicInteger()

  def id(spark: SparkSession): Int = ids.synchronized {
    var v = ids.get(spark)
    if (v == null) {
      v = Integer.valueOf(next.incrementAndGet())
      ids.put(spark, v)
    }
    v.intValue()
  }
}
