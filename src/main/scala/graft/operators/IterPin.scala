package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Round-pinning for the engine's iterative graph loops (PageRank,
  * ShortestPath, KCore, LabelPropagation): every round's state is
  * pinned so lineage stays flat (the q34 UnionLoop lesson — an
  * unpinned loop's plan doubles per round).
  *
  * Default pin = `localCheckpoint`, the right local-mode choice (no
  * reliable-storage round trip). But localCheckpoint blocks live in
  * EXECUTOR storage with lineage truncated and no copy in reliable
  * storage: on a real cluster a lost executor mid-loop loses blocks
  * that can no longer be recomputed, killing the whole job — the
  * standard iterative-Spark hazard. The knob
  * `graft.graph.reliableCheckpointEvery=N` switches every N-th pin of
  * each loop to a RELIABLE `checkpoint()` (requires
  * `SparkContext.setCheckpointDir` on fault-tolerant storage; refused
  * loudly when unset — a "reliable" checkpoint that silently could
  * not be taken is worse than none). The pins BETWEEN reliable cuts
  * deliberately do NOT truncate lineage — they `persist`
  * (MEMORY_AND_DISK) instead of localCheckpoint, because a truncated
  * executor-local block is unrecoverable and would void the reliable
  * cut's protection: with persist, a lost executor's partitions
  * recompute through at most N rounds of retained lineage back to
  * the last reliable checkpoint. The trade is bounded plan depth
  * (≤ N rounds) between cuts; N=1 pins every round reliably with
  * flat lineage; unset (the default) keeps today's local behavior.
  *
  * CACHE DISCIPLINE (knob-on mode): persist registers the frame in
  * Spark's CacheManager, which holds it until an explicit unpersist —
  * unlike localCheckpoint blocks, it is NOT freed when the DataFrame
  * is garbage-collected. The pin sequence therefore keeps only the
  * latest two persisted frames live (the round being built reads the
  * previous one; older rounds are recovery-only and lineage covers
  * them) and the loop MUST end with [[IterPin.seal]]: seal reliably
  * checkpoints the final state, unpersists every tracked frame, and
  * returns the sealed result — a long-lived session leaks nothing.
  * Knob-off, seal is the identity.
  */
final class IterPin private[operators] () {
  private var i = -1
  private val cached = scala.collection.mutable.Queue[DataFrame]()

  def apply(df: DataFrame): DataFrame = {
    i += 1
    val pinned = IterPin.pinAt(df, i)
    if (IterPin.reliableMode) {
      // track persisted (between-cut) frames; reliable cuts need no
      // release. Keep the latest two: the in-flight round still reads
      // its predecessor; anything older is recoverable via lineage.
      if (pinned.storageLevel != StorageLevel.NONE) cached.enqueue(pinned)
      while (cached.size > 2) cached.dequeue().unpersist(blocking = false)
    }
    pinned
  }

  /** End-of-loop cleanup for knob-on mode: reliably checkpoint the
    * result (so unpersisting its cached ancestors cannot leave an
    * unprotected tail), release every tracked frame, return the
    * sealed result. Identity when the knob is off.
    */
  def seal(result: DataFrame): DataFrame =
    if (!IterPin.reliableMode) result
    else {
      val out = result.checkpoint()
      cached.dequeueAll(_ => true).foreach(_.unpersist(blocking = false))
      out
    }
}

object IterPin {

  /** One pin sequence per operator invocation: pin index 0 is the
    * loop's input (edge list / initial state), then one per round.
    */
  def loop(): IterPin = new IterPin

  /** 0 = disabled (localCheckpoint only). A malformed property
    * degrades to disabled — config misreads must not kill the graph
    * family.
    */
  private def every: Int =
    sys.props.get("graft.graph.reliableCheckpointEvery")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ > 0).getOrElse(0)

  private[operators] def reliableMode: Boolean = every > 0

  private[operators] def pinAt(df: DataFrame, idx: Int): DataFrame = {
    val n = every
    if (n > 0) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "graft.graph.reliableCheckpointEvery is set but no Spark " +
          "checkpoint directory is configured — call " +
          "SparkContext.setCheckpointDir on reliable storage, or unset " +
          "the knob; a silently-skipped reliable checkpoint would " +
          "defeat the lost-executor protection it exists to provide")
      if (idx % n == 0) df.checkpoint()
      // between cuts: cache WITHOUT truncating lineage — a lost block
      // recomputes from the last reliable checkpoint (≤ N rounds)
      else df.persist(StorageLevel.MEMORY_AND_DISK)
    } else df.localCheckpoint()
  }
}
