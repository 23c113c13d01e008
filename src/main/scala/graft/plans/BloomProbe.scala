package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Probe an `xxhash64` value against a BROADCAST array of hash-sliced
  * Bloom filters: the row's slice is `floorMod(hash, slices)` (the
  * exact arithmetic of Spark's `pmod`, which assigns the slices on
  * the build side), and only that slice's filter is consulted.
  *
  * Why not `might_contain(lit(bytes), hash)` per slice — measured,
  * §9.37: at full provisioning the filter set IS the provisioned
  * bits (~120 MB at 100 M items / 1% fpp, 25 slices), and a binary
  * literal of that size is untenable twice over. (1) `Literal`
  * hex-renders binary values IN FULL on every plan-string pass
  * (`SparkPlanInfo`, UI listeners, explain) — a 16 GB driver OOM'd in
  * `TreeNode.argString` before the first 100 M-provisioned tick
  * finished. (2) The bytes ride the TASK BINARY (115 MiB observed)
  * and re-ship EVERY tick. A broadcast handle renders as its id,
  * ships KBs per task binary, executors fetch the blocks once and
  * keep them across ticks, and the filters deserialize ONCE PER
  * EXECUTOR (a per-task `readFrom` would copy the provisioned bitmap
  * per running task). Reads of a built filter are thread-safe
  * (immutable word array), so concurrent tasks share the instances.
  *
  * Semantics: null hash → null (callers that need "null claims
  * maybe" coalesce, as with `might_contain`); ABSENT slice → false —
  * definitely new, no seen fingerprint hashes to that slice (the
  * empty-slice lemma of [[graft.dedup.BloomDedup.newRowsStacked]]);
  * present slice → `mightContainLong` (no false negatives within the
  * slice). Codegen stays inside whole-stage codegen via one
  * reference-object call per row — the same shape Spark's own
  * `BloomFilterMightContain` generates.
  */
case class SlicedBloomProbe(child: Expression, slices: Int,
    filters: Broadcast[Array[BloomFilter]])
  extends UnaryExpression {

  require(slices >= 1, s"slices must be >= 1, got $slices")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash argument, got " +
        child.dataType.catalogString)

  // one .value resolution per (de)serialized instance, not per row
  @transient private lazy val local: Array[BloomFilter] = {
    val arr = filters.value
    require(arr.length == slices,
      s"broadcast filter array has ${arr.length} slots, expression " +
        s"expects $slices — the probe and the build disagree on slicing")
    arr
  }

  def probe(hash: Long): Boolean = {
    val f = local(java.lang.Math.floorMod(hash, slices.toLong).toInt)
    f != null && f.mightContainLong(hash)
  }

  override protected def nullSafeEval(h: Any): Any =
    probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("slicedBloomProbe", this,
      classOf[SlicedBloomProbe].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $ref.probe($h);")
  }

  override def prettyName: String = "graft_sliced_bloom_probe"

  override protected def withNewChildInternal(
      newChild: Expression): SlicedBloomProbe = copy(child = newChild)
}

object SlicedBloomProbe {
  /** Column form (not SQL-registrable — the broadcast handle cannot
    * arrive as an argument expression).
    */
  def column(hash: Column, slices: Int,
      filters: Broadcast[Array[BloomFilter]]): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      SlicedBloomProbe(
        org.apache.spark.sql.graft.GraftBridge.expression(hash),
        slices, filters))
}
