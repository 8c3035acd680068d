package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scope registry for operator-internal caches whose RESULT is
  * lazy.
  *
  * Several operators ([[graft.ops.Similarity.lshNearPairs]],
  * [[graft.graph.Algorithms.bipartiteProjection]],
  * [[graft.graph.Algorithms.linkPredictionScores]]) persist an
  * intermediate frame that feeds multiple consumers of a lazily-returned
  * result; the operator cannot unpersist it itself without forcing its
  * own output. Untracked, those blocks accumulate for the session
  * lifetime across repeated invocations. The registry is the explicit
  * handle: operators `track` the frames they persist, and harness-level
  * callers ([[Verify]], [[Bench]], a user's own driver loop) call
  * [[releaseAll]] once the query's result is materialized — bounding
  * live operator caches to one query's worth instead of one session's.
  *
  * Unpersist is non-blocking and idempotent, so releasing between a
  * persist and a re-materialization only costs a recompute, never
  * correctness.
  *
  * ==Concurrency contract: one query at a time per JVM==
  * The registry is JVM-global and [[releaseAll]] is indiscriminate: if
  * two queries run concurrently in one session, a `releaseAll` issued
  * for the first also unpersists caches the second is still reading.
  * That is never a correctness problem (unpersist only forces a
  * recompute) but it silently voids the perf contract of the cache. The
  * harness (Verify/Bench) runs queries strictly sequentially, which is
  * the supported mode; drivers that interleave queries should serialize
  * `releaseAll` with their own query boundaries.
  *
  * ==Never-releasing drivers are bounded too==
  * References here must stay STRONG — Spark's `CacheManager` pins the
  * cached plan regardless, so dropping our reference would leak the
  * cached blocks with no handle left to unpersist them. Instead the
  * registry is a bounded FIFO: tracking past [[maxTracked]] entries
  * unpersists the oldest first. One query tracks at most a handful of
  * frames, so the cap only ever evicts caches from long-finished
  * queries, where unpersist is a free no-op or a harmless recompute.
  */
object OpCaches {
  /** Upper bound on simultaneously tracked frames; far above one
    * query's worth (operators track 1-2 frames each). */
  val maxTracked: Int = 64

  private val tracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  private def release(df: DataFrame): Unit =
    try df.unpersist(blocking = false)
    catch { case _: Exception => () }

  /** Persist `df` at `level` and remember it for the next
    * [[releaseAll]]. Returns `df` for chaining. */
  def track(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      while (tracked.size >= maxTracked) release(tracked.remove(0))
      tracked += df
      df.persist(level)
    }

  /** Unpersist every tracked frame (non-blocking) and forget them. Safe
    * to call at any point; a tracked frame still referenced by an
    * un-materialized result simply recomputes on next use. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(release)
    tracked.clear()
  }

  /** Number of currently tracked frames (spec hook). */
  def trackedCount: Int = synchronized(tracked.size)
}
