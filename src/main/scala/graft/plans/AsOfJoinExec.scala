package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical sort-merge as-of join.
  *
  * Declares `ClusteredDistribution` on each side's keys and per-side
  * ordering `(keys…, ts)`, so `EnsureRequirements` inserts the hash
  * exchanges and sorts — exactly the machinery a built-in shuffled join
  * gets. Each co-located partition pair then merges in ONE linear pass:
  * the right iterator advances monotonically, retaining a copy of the
  * latest right row at-or-before the current left timestamp.
  *
  * Shuffle shape versus the union+window formulation
  * (`operators.AsOfJoin.asOf`): each side moves its own columns only
  * (the union pads every row to BOTH sides' width), and the merge holds
  * O(1) state instead of a window frame. MEASURED trade-off (SURVEY.md
  * §9, 2 M events, local[32]): the union+window form is 2-5× faster
  * wall-clock even at 13 payload columns/side, because local shuffles
  * are memory-bandwidth-cheap and its sort+window pipeline is
  * whole-stage-codegen'd while this merge loop is interpreted
  * (~1 µs/row). Use `asOf` by default; this operator is the
  * whole-operator Catalyst extension surface — and the shape whose
  * byte savings matter once the exchange crosses a real network.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  // rows stream out in left's (keys, ts) order, partitioned like left
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val (lOut, rOut) = (left.output, right.output)
    val (lKeys, rKeys, lTs, rTs, pay) = (leftKeys, rightKeys, leftTs, rightTs, payload)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      // ONE generated projection does the payload selection AND the
      // UnsafeRow conversion parents require, reading straight off
      // JoinedRow(leftRow, fullRightRow). Bind against NULLABLE right
      // attrs — nullability flows from the input schema into
      // BoundReference, and non-null right attrs would elide the null
      // check the no-match nullRight row needs.
      val joinedSchema = lOut ++ rOut.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(
        lOut ++ pay.map(_.withNullability(true)), joinedSchema)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      val rBuf = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // latest right row consumed whose key matched some left key —
      // copied, because sorted iterators reuse their row buffers
      var matched: InternalRow = null
      var matchedKey: UnsafeRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTsRow = lTsProj(lRow)
        var done = false
        while (!done && rBuf.hasNext) {
          val rKey = rKeyProj(rBuf.head)
          val c = keyOrd.compare(rKey, lKey)
          if (c > 0) done = true // right ahead: stop, keep for later left keys
          else if (c < 0) rBuf.next() // right behind every remaining left key
          else if (tsOrd.compare(rTsProj(rBuf.head), lTsRow) <= 0) {
            matched = rBuf.head.copy(); matchedKey = rKey.copy(); rBuf.next()
          } else done = true // same key but in the future of this left row
        }
        val m =
          if (matchedKey != null && keyOrd.compare(matchedKey, lKey) == 0) matched
          else nullRight
        resultProj(joined(lRow, m))
      }
    }
  }
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Inject via
  * `GraftExtensions` (`spark.sql.extensions`) or
  * `GraftFunctions.ensureRegistered` (post-hoc, driver-owned sessions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case aj: AsOfJoinPlan =>
      AsOfJoinExec(planLater(aj.left), planLater(aj.right),
        aj.leftKeys, aj.rightKeys, aj.leftTs, aj.rightTs, aj.rightPayload) :: Nil
    case _ => Nil
  }
}
