package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the aggregate alternative to
  * `row_number().over(partitionBy(g).orderBy(score.desc)) <= k`.
  *
  * Why it exists: the window form shuffles EVERY scored row to its
  * group's reducer and sorts there (WindowGroupLimit trims, but only
  * after the exchange). An aggregate's partial/merge contract lets
  * each map task reduce its slice to ≤ k rows per group BEFORE the
  * shuffle — at 100 TB with millions of candidates per group and
  * k = 10, the exchange shrinks by orders of magnitude.
  *
  * Ordering is total and deterministic: score DESC, then id ASC as the
  * tie-break — identical to the ranking-window formulation, so both
  * forms hash-match the same oracle.
  *
  * Buffer: a bounded min-heap (worst candidate at head for O(log k)
  * eviction), serialized with the JVM serializer (opaque to Catalyst —
  * the price of the imperative buffer; the rows it carries are tiny).
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {

  require(k > 0, "k must be positive")

  // rank key: ascending = better (higher score, then lower id).
  // PriorityQueue is a MAX-heap under its ordering, so using the rank
  // key directly puts the WORST kept candidate at the head — O(log k)
  // eviction of the right element.
  private val worstFirst: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: mutable.PriorityQueue[Scored] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(b: mutable.PriorityQueue[Scored], s: Scored)
      : mutable.PriorityQueue[Scored] = {
    if (b.size < k) b.enqueue(s)
    else if (worstFirst.compare(s, b.head) < 0) { b.dequeue(); b.enqueue(s) }
    b
  }

  override def reduce(b: mutable.PriorityQueue[Scored], s: Scored) =
    offer(b, s)

  override def merge(a: mutable.PriorityQueue[Scored],
      b: mutable.PriorityQueue[Scored]) = {
    b.foreach(offer(a, _))
    a
  }

  /** best→worst; position+1 is the rank. */
  override def finish(b: mutable.PriorityQueue[Scored]): Seq[Scored] =
    b.dequeueAll.reverse.toSeq

  override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
    Encoders.javaSerialization[mutable.PriorityQueue[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
