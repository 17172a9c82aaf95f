package graft

import org.apache.spark.sql.SparkSession

/** Small per-(session, key) memo for resolved DataFrames/plans. Entries of
  * stopped sessions are evicted on access so the cache never retains a
  * stopped SparkSession (values reference their session).
  */
private[graft] final class SessionCache[V] {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()

  def getOrElseUpdate(spark: SparkSession, key: String)(build: (SparkSession, String) => V): V = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, key), { case (s, k) => build(s, k) })
  }
}
