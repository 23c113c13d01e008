package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Logical as-of join: for each left row, the latest right row with
  * `rightTs <= leftTs` in the same key group (left-outer semantics —
  * unmatched left rows keep null payload). The whole-operator custom
  * Catalyst path for the semantics the reference resolves through ES
  * point lookups (reference pyCassElastic.py:337-343) and Spark has no
  * built-in operator for; `AsOfJoinStrategy` plans it into the
  * sort-merge `AsOfJoinExec`.
  *
  * Contract matches `operators.AsOfJoin.asOf`: right must be unique
  * per (keys, ts); ts non-null; payload names must not collide with
  * left's columns.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute) extends BinaryNode {

  /** Right's non-key, non-ts columns — the carried match payload. */
  def rightPayload: Seq[Attribute] = right.output.filterNot(a =>
    rightKeys.exists(_.exprId == a.exprId) || a.exprId == rightTs.exprId)

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: deterministic conjuncts referencing only the LEFT
  * side commute with the as-of join (each left row's match depends
  * only on the right side), so they sink below the operator. Catalyst's
  * own `PushDownPredicates` cannot see through an unknown node — this
  * rule restores the pushdown, and once the filter sits directly on the
  * scan, `FileSourceStrategy` turns it into parquet `PushedFilters`.
  *
  * Right/payload conjuncts must NOT push: a payload filter observes the
  * null-padded post-join row, and a right-side filter would change
  * which row is "latest at-or-before".
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(push.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
