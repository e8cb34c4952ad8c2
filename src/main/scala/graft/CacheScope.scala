package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-lifetime cache hygiene for operator-internal persists.
  *
  * Operators that scan an intermediate frame multiple times (shingle
  * tables in `dedup.Dedup`, the offset catalog in
  * `operators.PrefixSum`) persist it so the expensive subtree runs
  * once. The frame, however, outlives the query: a long-lived session
  * (bench loop, notebook, service) that never unpersists accumulates
  * MEMORY_AND_DISK partitions until executor storage churns — the
  * cross-query cache-pressure whiplash observed in rounds 2–3.
  *
  * The fix is scoped tracking: operators register every internal
  * persist here instead of calling `.persist()` directly, and the
  * harness (Bench/Verify, or any caller via `withScope`) releases all
  * of them once the query's action completes. Unpersist is non-blocking
  * — eviction proceeds asynchronously while the next query plans.
  */
object CacheScope {

  // Per-thread tracking: operators register persists while PLANNING
  // on the caller's thread, so a thread-local queue scopes each
  // session/query correctly even when several sessions plan
  // concurrently in one JVM — one thread's releaseAll can never drop
  // another's live caches.
  private val tracked = ThreadLocal.withInitial(
    () => new ConcurrentLinkedQueue[DataFrame]())

  /** Persist `df` (idempotent) and register it for release at the end
    * of the current query scope. */
  def track(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val c = df.persist(level)
    tracked.get().add(c)
    c
  }

  /** Release every cache registered on this thread since the last
    * call. Safe to call when nothing is tracked; safe to call twice. */
  def releaseAll(): Unit = {
    val q = tracked.get()
    var d = q.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = q.poll()
    }
  }

  /** Run `body`, then release all caches it registered — even on
    * failure. The unit of scoping is "one query, one action". */
  def withScope[T](body: => T): T =
    try body finally releaseAll()
}
