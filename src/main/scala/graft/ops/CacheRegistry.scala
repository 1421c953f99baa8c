package graft.ops

import org.apache.spark.sql.DataFrame

/** Explicit ownership for operator-internal `persist()` calls.
  *
  * Pair operators (Dedup, Similarity) persist shared subplans that feed
  * several plan branches. A returned DataFrame is lazy, so the operator
  * cannot unpersist before the caller's action runs — and relying on
  * `spark.catalog.clearCache()` + GC to reap them is nondeterministic
  * (ContextCleaner is weak-ref driven; measured 5-15x bench degradation
  * when blocks and broadcasts accumulate across a 50-query suite).
  *
  * Instead every operator-internal persist is registered here, and the
  * harness (Bench / Verify / Profile — or any long-lived session) calls
  * [[drain]] after each action to `unpersist(blocking = true)` everything
  * synchronously. Blocking matters: non-blocking unpersist queues async
  * block removal that races the next query's memory demand.
  *
  * Scope: the registry is process-global and assumes the harness runs
  * queries one at a time (all three shipped harnesses do). A concurrent
  * multi-query harness calling [[drain]] would unpersist caches belonging
  * to in-flight plans of OTHER queries in the same JVM — correct results
  * (caches recompute) but silent recomputation; such a harness should
  * scope draining per query via [[release]] of the frames it owns.
  */
object CacheRegistry {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (default storage level) and record it for [[drain]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Unpersist ONE registered frame early (blocking) — for iterative
    * operators that supersede a cached plan mid-query (e.g. each label-
    * propagation round replaces the previous round's table) and must not
    * hold O(rounds) dead caches until the harness drains.
    */
  def release(df: DataFrame): Unit = {
    live.remove(df)
    df.unpersist(blocking = true)
  }

  /** Synchronously unpersist every registered DataFrame; returns how many. */
  def drain(): Int = {
    var n = 0
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = true)
      n += 1
      df = live.poll()
    }
    n
  }
}
