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
  */
object OpCaches {
  private val tracked = scala.collection.mutable.ArrayBuffer[DataFrame]()

  /** Persist `df` at `level` and remember it for the next
    * [[releaseAll]]. Returns `df` for chaining. */
  def track(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      tracked += df
      df.persist(level)
    }

  /** Unpersist every tracked frame (non-blocking) and forget them. Safe
    * to call at any point; a tracked frame still referenced by an
    * un-materialized result simply recomputes on next use. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Exception => () }
    }
    tracked.clear()
  }

  /** Number of currently tracked frames (spec hook). */
  def trackedCount: Int = synchronized(tracked.size)
}
