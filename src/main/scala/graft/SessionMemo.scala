package graft

import org.apache.spark.sql.SparkSession

/** Per-session memo with a WEAK session key: a churned-and-dropped
  * SparkSession takes its cached values with it instead of pinning
  * them (and, via DataFrame values, the session itself) for the life
  * of the JVM. The inner per-session map is strongly keyed only on
  * value types. Used by [[Tables]] (plan construction) and
  * `graft.ops.Similarity` (trained model tables).
  */
private[graft] final class SessionMemo[K, V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[K, V]]()

  private def memoFor(s: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[K, V] =
    bySession.synchronized {
      var m = bySession.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[K, V]()
        bySession.put(s, m)
      }
      m
    }

  def getOrCompute(s: SparkSession, key: K)(compute: => V): V =
    memoFor(s).computeIfAbsent(key, _ => compute)

  def clear(): Unit = bySession.synchronized(bySession.clear())

  def sessionCount: Int = bySession.synchronized(bySession.size)
}
