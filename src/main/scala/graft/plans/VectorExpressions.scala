package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding arithmetic — the scale
  * path for similarity search over `array<float>` columns.
  *
  * The higher-order-function form (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`, VectorOps) is semantically right but evaluates
  * interpreted: one lambda frame and one boxed java.lang.Double per
  * element per row. At 100 TB × 64-plus dims that is the hot loop of
  * the whole workload. These expressions generate a tight primitive
  * `for` loop via `doGenCode` — no boxing, no lambda dispatch, fused
  * into whole-stage codegen — and keep BIT-IDENTICAL results to the
  * HOF form (same sequential left-to-right accumulation, same
  * float→double widening before multiply), so either form matches the
  * same DuckDB oracle.
  *
  * Null semantics mirror the HOF composition exactly:
  *  - null array (either side) → null (BinaryExpression default);
  *  - length mismatch → null (zip_with pads with null, the null
  *    poisons the fold);
  *  - any null element → null (same poisoning);
  *  - both empty → fold inits: dot = 0.0, cosine = null.
  *  - cosine with a zero-norm side → null (try_divide semantics; the
  *    ONE deliberate deviation — the HOF composition's Divide throws
  *    under ANSI mode, and an engine function should degrade to null
  *    on a degenerate vector, not kill a 100 TB job).
  *
  * Elements may be float or double on either side independently;
  * floats are widened exactly as `cast(x as double)` does.
  */
trait VectorBinaryExpression extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Java accessor snippet for codegen, widening floats to double. */
  protected def elemCode(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** dot(a, b) = Σ aᵢ·bᵢ as one codegen'd primitive loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += elemAt(x, i, leftIsFloat) * elemAt(y, i, rightIsFloat)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${elemCode(x, i, leftIsFloat)} * ${elemCode(y, i, rightIsFloat)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖) in a SINGLE pass — three
  * accumulators in one loop, where the composed HOF form traverses
  * both arrays three times. Zero denominator → null (see trait doc).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = elemAt(x, i, leftIsFloat)
      val yv = elemAt(y, i, rightIsFloat)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = ${elemCode(x, i, leftIsFloat)};
         |    double $yv = ${elemCode(y, i, rightIsFloat)};
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $dot / $denom; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
