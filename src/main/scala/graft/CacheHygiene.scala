package graft

import org.apache.spark.sql.SparkSession

/** Session cache hygiene — the engine-side answer to the round-7 verdict's
  * bench self-distortion finding: iterative operators `localCheckpoint()`
  * their fixpoint state (q85/q113/q125/q138/q161/q162, the shared
  * token-edge builds) and streaming backfills load per-operator state-store
  * providers; neither is released when the query's action completes, so a
  * long-lived session accumulates block-manager storage and state-store
  * maintenance work until late queries report up to 10× their true warm
  * cost (BENCH_r07 q152 9.76 s vs 0.94 s in a fresh JVM).
  *
  * `release` returns the session to storage baseline between queries:
  *   - unpersists every persisted RDD (localCheckpoint blocks included —
  *     safe once the consuming action has finished; the NEXT execution of
  *     any query rebuilds its own checkpoints from source),
  *   - drops every cached plan (`spark.catalog.clearCache()`),
  *   - unloads all streaming state-store providers and their maintenance
  *     task (`StateStore.stop()` — the next streaming query lazily
  *     restarts maintenance).
  *
  * This is an engine feature, not just a bench fix: any long-lived
  * deployment (a query server looping over tenant jobs) needs the same
  * between-jobs release or it leaks block-manager memory for the process
  * lifetime. Called by `Bench`, `Verify`, and `Profile` after every query;
  * pinned by `CacheHygieneSpec` (storage returns to baseline, and queries
  * re-run correctly afterwards).
  */
object CacheHygiene {

  /** Release all session-held storage: persisted RDD blocks, cached plans,
    * streaming state-store providers. `blocking = true` waits for block
    * removal (deterministic for specs); benches use fire-and-forget.
    *
    * CAUTION for embedders: this unpersists EVERY persisted RDD in the
    * session and clears ALL plan-level caches (`catalog.clearCache` has
    * no per-entry selector) — correct for the harness, which owns the
    * whole session. A deployment embedding the engine alongside its own
    * RDD-level caches passes `keep` with the RDD ids to preserve;
    * DataFrame (`.cache()`) plan caches cannot be selectively kept and
    * should be re-established after release.
    */
  def release(spark: SparkSession, blocking: Boolean = false,
              keep: Set[Int] = Set.empty): Unit = {
    val sc = spark.sparkContext
    if (sc.isStopped) return // nothing to release; the caller revives
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!keep.contains(id)) rdd.unpersist(blocking)
    }
    spark.catalog.clearCache()
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Number of RDDs the block manager still tracks as persisted — the
    * observable `release` drives to zero.
    */
  def persistedRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
