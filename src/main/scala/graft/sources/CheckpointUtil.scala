package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the executor-storage blocks behind `localCheckpoint()`ed
  * frames once their consumers are done with them.
  *
  * A local checkpoint TRUNCATES lineage: the returned frame's plan is
  * a `LogicalRDD` over cached blocks, and those blocks are the only
  * copy of the data — Spark never frees them until the RDD is GC'd.
  * Store builders memoize such frames per advance so three merge
  * advances share one physical screen; without an explicit release the
  * blocks of PAST increments accumulate in executor storage for the
  * lifetime of the session (a WeakHashMap only helps after the ctx key
  * is collected). Callers MUST NOT touch the frame after freeing it —
  * the truncated lineage cannot recompute.
  */
object CheckpointUtil {

  /** Unpersist every checkpointed/cached RDD a frame's plan holds
    * directly (non-blocking). Safe on non-checkpointed frames (no-op).
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Per-advance registry of checkpointed scratch frames: builders
    * `track(ctx, frame)` everything they checkpoint, and the store's
    * `onAdvanceDone` hook calls `freeAll(ctx)` once the engine has
    * written every piece of that advance. Weak keys keep an
    * unreleased entry from pinning the ctx itself.
    */
  final class Scratch {
    private val m = new java.util.WeakHashMap[AnyRef, List[DataFrame]]()
    def track(key: AnyRef, df: DataFrame): DataFrame = {
      m.synchronized {
        m.put(key, df :: Option(m.get(key)).getOrElse(Nil))
      }
      df
    }
    def freeAll(key: AnyRef): Unit =
      m.synchronized(Option(m.remove(key))).getOrElse(Nil).foreach(free)
  }
}
