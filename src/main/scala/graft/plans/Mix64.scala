package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Seeded 64-bit avalanche mix: `splitmix64(h ^ seed)` (the Stafford
  * variant-13 finalizer SplitMix64 itself uses). One of these per
  * seed over ONE shared `xxhash64(shingle)` column replaces the
  * per-seed `xxhash64(concat(shingle, "#s"))` family in the accept
  * loop's MinHash signatures — the concat form allocates a fresh
  * UTF8String per seed per shingle row (32 seeds × ~700k shingle rows
  * per 3k-doc tick measured as the tick's dominant constant, §9.37),
  * where this is five instructions of long arithmetic fused into
  * whole-stage codegen.
  *
  * Statistically the family must behave as INDEPENDENT hash functions
  * per seed — the r14 lesson: the banding signature's LINEAR seeded
  * family (base + s·base2) correlates across seeds (one small shingle
  * wins every seed) and is unusable as a Jaccard estimator. XOR with
  * a distinct seed followed by a FULL-AVALANCHE mix has no such
  * structure (every output bit depends on every input bit), and the
  * estimator quality is MEASURED, not assumed — `probe_mix_estimator`
  * pins J≈0 pairs estimating ≈0 and near-dup pairs estimating their
  * exact Jaccard, side by side with the concat family.
  *
  * Wrapping long multiplication is deliberate and cannot use SQL
  * arithmetic: Spark 4 runs ANSI mode, where the multiply would
  * overflow-throw; here it is Java's wrapping `*` in both eval and
  * the generated code.
  */
case class Mix64(child: Expression, seed: Long) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(h: Any): Any =
    Mix64.mix(h.asInstanceOf[Long] ^ seed)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $h ^ ${seed}L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override def prettyName: String = "graft_mix64"

  override protected def withNewChildInternal(
      newChild: Expression): Mix64 = copy(child = newChild)
}

object Mix64 {
  /** The splitmix64 finalizer (Stafford mix13) — reference for eval
    * and tests; the generated code inlines the same arithmetic.
    */
  def mix(h: Long): Long = {
    var z = h
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def column(hash: Column, seed: Long): Column =
    org.apache.spark.sql.graft.GraftBridge.column(
      Mix64(org.apache.spark.sql.graft.GraftBridge.expression(hash), seed))
}
