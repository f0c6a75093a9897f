package graft.operators

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped caching for multi-consumer intermediates.
  *
  * LSH-style pipelines persist a sketch DataFrame because it feeds several
  * joins of one logical result; without a hook on "the result was computed",
  * a plain `.persist` leaks its blocks for the life of the session — across
  * a 38-query battery the leaked caches compound. This ties the cache's
  * lifetime to the first completed ACTION whose plan contains the cached
  * subtree: the blocks exist exactly while they are being reused, then go.
  *
  * Unpersist-before-action is harmless by construction (Spark would just
  * recompute), so a listener miss degrades to performance, never
  * correctness.
  */
object CacheScope {

  /** A registered scope awaiting its releasing action. `done` is shared
    * with the listener so the sweep can drop already-released scopes (and
    * their captured plan/DataFrame references) immediately instead of
    * holding them until TTL. */
  private final case class Scope(createdAtMs: Long, done: AtomicBoolean, release: () => Unit)
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[Scope]()

  /** Fallback TTL: a scope whose result was never executed would otherwise
    * hold its blocks (and its listener registration) for the session's
    * life. Stale scopes are swept on the next unpersistAfterUse call —
    * amortized cleanup, no background thread. */
  private val staleTtlMs: Long = sys.env.getOrElse("GRAFT_CACHE_TTL_MS", "600000").toLong

  private def sweepStale(): Unit = {
    val now = System.currentTimeMillis()
    val it = pending.iterator()
    while (it.hasNext) {
      val s = it.next()
      if (s.done.get()) it.remove()
      else if (now - s.createdAtMs > staleTtlMs) { s.release(); it.remove() }
    }
  }

  /** Returns `result` unchanged; registers a one-shot session listener that
    * unpersists `cached` (and deregisters itself) after the first
    * success/failure of a query whose analyzed plan contains the cached
    * subtree.
    *
    * Caller contract: execute the returned result exactly once, promptly.
    * The FIRST completed action anywhere in the session whose plan contains
    * the cached subtree (sameResult match) releases the cache — a
    * concurrent identical query releases it early, which degrades to
    * recompute, never to wrong results. If the result is never executed,
    * the TTL sweep above reclaims the blocks on a later scope creation. */
  def unpersistAfterUse(result: DataFrame, cached: DataFrame): DataFrame = {
    sweepStale()
    val session = cached.sparkSession
    val target = cached.queryExecution.analyzed
    val done = new AtomicBoolean(false)
    val listener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val hit =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Throwable => true } // when in doubt, release
        if (hit && done.compareAndSet(false, true)) {
          cached.unpersist(blocking = false)
          session.listenerManager.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        maybeRelease(qe)
    }
    session.listenerManager.register(listener)
    pending.add(Scope(System.currentTimeMillis(), done, () =>
      if (done.compareAndSet(false, true)) {
        cached.unpersist(blocking = false)
        session.listenerManager.unregister(listener)
      }))
    result
  }
}
