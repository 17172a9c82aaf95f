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
  *    and `onEvict` runs (callers caching frames pass
  *    [[SessionCache.release]] so the executor blocks are actually freed —
  *    both plan-cache entries and checkpoint RDD blocks).
  *
  * The bound is per-cache, and every cached value here is model-sized or a
  * narrow no-text projection, so `maxEntries` copies is the deliberate
  * steady-state working set, not a leak.
  *
  * Builds run OUTSIDE the lock: since [[SessionCache.cut]] made memo
  * builders eager (a full Spark job materializes the frame), holding the
  * JVM-wide cache lock across the build would serialize unrelated
  * sessions/threads — and nested builds (pair stats → capped index →
  * shingle index) would hold several locks across jobs. A lost race means
  * two builds of the same value; the loser is released via `onEvict`.
  */
private[graft] final class SessionCache[V](
    maxEntries: Int = 64,
    onEvict: V => Unit = (_: V) => ()) {

  // access-order LinkedHashMap = LRU
  private val cache =
    new java.util.LinkedHashMap[(SparkSession, String), V](16, 0.75f, true)

  def getOrElseUpdate(spark: SparkSession, key: String)(build: (SparkSession, String) => V): V = {
    val k = (spark, key)
    val hit = cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey._1.sparkContext.isStopped) it.remove()
      Option(cache.get(k))
    }
    hit.getOrElse {
      val v = build(spark, key) // eager materialization — never under the lock
      val (winner, evicted) = cache.synchronized {
        val raced = cache.get(k)
        if (raced != null) (raced, List(v)) // lost the race: release ours
        else {
          cache.put(k, v)
          val out = scala.collection.mutable.ListBuffer.empty[V]
          while (cache.size > maxEntries) {
            val eldest = cache.entrySet().iterator().next()
            cache.remove(eldest.getKey)
            out += eldest.getValue
          }
          (v, out.toList)
        }
      }
      evicted.foreach(e =>
        try onEvict(e) catch { case scala.util.control.NonFatal(_) => () })
      winner
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
    * the checkpoint itself (MEMORY_AND_DISK); evict with [[release]] —
    * `Dataset.unpersist` alone only consults the SQL CacheManager and
    * would strand the checkpoint's RDD blocks until a JVM GC.
    */
  def cut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.localCheckpoint(true)

  /** [[cut]] for a frame whose physical LAYOUT is the point — a
    * `repartition(key)[.sortWithinPartitions(key)]` leaf feeding
    * key-equal self-joins or per-iteration joins. Under AQE the eager
    * localCheckpoint's executed plan is an AdaptiveSparkPlanExec whose
    * `outputPartitioning` reads `UnknownPartitioning(0)`, so the
    * checkpointed LogicalRDD FORGETS it was hash-partitioned and every
    * consumer re-shuffles — observed in the r15 q_vec_neardup_lsh plan:
    * both self-join sides re-exchanged on `cell` directly above the
    * leaf, i.e. the r14 "partitioned leaf" memos never physically
    * carried their layout. Disabling AQE for just this one
    * materialization lets LogicalRDD capture the HashPartitioning (and
    * any sortWithinPartitions ordering), which consumers'
    * EnsureRequirements then recognize — the join runs with ZERO
    * Exchange (and zero Sort when the ordering is captured too). The
    * frame is a built-once memo leaf, so AQE's runtime re-optimization
    * buys nothing here; the conf flip is restored in a finally and the
    * build path is already synchronous per memo contract.
    */
  def cutLayout(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val conf = df.sparkSession.conf
    val key = "spark.sql.adaptive.enabled"
    val prev = conf.get(key)
    conf.set(key, "false")
    try df.localCheckpoint(true) finally conf.set(key, prev)
  }

  /** Free a memoized frame's storage on eviction: the plan-cache entry
    * (persisted frames) AND, for [[cut]] frames, the checkpointed RDD's
    * blocks — the LogicalRDD leaf holds the only reference, and waiting
    * for ContextCleaner GC (30 min periodic default) is the unbounded-
    * storage window ADVICE r8 flagged. A consumer holding a frame past
    * its eviction would now fail loudly (checkpoint block lost) instead
    * of silently recomputing — acceptable: every operator re-fetches
    * from the memo per call, so only a use-after-evict bug can hit it.
    */
  def release(df: org.apache.spark.sql.DataFrame): Unit = {
    df.unpersist(false)
    df.queryExecution.logical.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(false)
      case _ => ()
    }
  }
}
