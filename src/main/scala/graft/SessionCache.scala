package graft

import org.apache.spark.sql.SparkSession

/** Small per-(session, key) memo for resolved DataFrames/plans/models.
  *
  * Two eviction paths keep the cache from retaining state it shouldn't
  * (ADVICE r8 — a long-lived session scanning many directories must not
  * accumulate unbounded persisted partitions):
  *
  *  - entries of STOPPED sessions are dropped on access (their executor
  *    state is already gone, so `onEvict` is NOT called for them — an
  *    `unpersist` against a stopped context would throw);
  *  - beyond `maxEntries`, the least-recently-used LIVE entry is evicted
  *    and `onEvict` runs (callers caching `.persist()`ed frames pass
  *    `_.unpersist(false)` so the executor blocks are actually freed).
  *
  * The bound is per-cache, and every cached value here is model-sized or a
  * narrow no-text projection, so `maxEntries` copies is the deliberate
  * steady-state working set, not a leak.
  */
private[graft] final class SessionCache[V](
    maxEntries: Int = 64,
    onEvict: V => Unit = (_: V) => ()) {

  // access-order LinkedHashMap = LRU; all access under one lock (call sites
  // are driver-side plan/model construction, not a hot path)
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), V](16, 0.75f, true)

  def getOrElseUpdate(spark: SparkSession, key: String)(build: (SparkSession, String) => V): V =
    cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey._1.sparkContext.isStopped) it.remove()
      val k = (spark, key)
      val existing = cache.get(k)
      if (existing != null) existing
      else {
        val v = build(spark, key)
        cache.put(k, v)
        while (cache.size > maxEntries) {
          val eldest = cache.entrySet().iterator().next()
          cache.remove(eldest.getKey)
          try onEvict(eldest.getValue)
          catch { case scala.util.control.NonFatal(_) => () }
        }
        v
      }
    }

  /** Visible for tests. */
  private[graft] def size: Int = cache.synchronized(cache.size)
}

private[graft] object SessionCache {
  /** Materialize a memoized frame AND cut its lineage (eager
    * localCheckpoint): a plain `.persist()` keeps the full logical tree,
    * and every downstream ACTION re-analyzes + re-canonicalizes it to
    * find the cache hit — measured 0.5 s of driver CPU per action on a
    * 477-row cached cluster assignment whose lineage spanned 8 label-
    * propagation generations. Checkpointing keeps the data distributed
    * (no collect) and hands consumers a leaf plan. The data is cached by
    * the checkpoint itself (MEMORY_AND_DISK), so no extra persist; pair
    * with `onEvict = _.unpersist(false)` as before — on a checkpointed
    * frame it simply releases the blocks.
    */
  def cut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.localCheckpoint(true)
}
