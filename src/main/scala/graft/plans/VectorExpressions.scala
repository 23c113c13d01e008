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

/** matvec(vec, flatMat) — all `rows = len(flatMat)/len(vec)` dot
  * products of a row-major flattened matrix against one vector, in a
  * single codegen'd nested primitive loop returning `array<double>`.
  *
  * Why an expression and not `array(dot, dot, ...)`: a random
  * projection at rd planes × d dims inlined as rd separate literal
  * arrays explodes generated code size (rd × d literal doubles per
  * PROJECTION NODE; §9.15 measured an rd=64, d=512 projection falling
  * off the codegen cliff ~50× slower), while one flattened literal is
  * a single constant reference and one loop. Arithmetic is
  * bit-identical to the per-plane sequential fold: row r accumulates
  * flat[r·n + j] · vec[j] left-to-right.
  *
  * Null semantics: null inputs → null; empty vec or a flat length
  * not divisible by len(vec) → null; any null element → null.
  */
case class MatVecProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val mat = b.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val m = mat.numElements()
    if (n == 0 || m % n != 0) return null
    val rows = m / n
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      var j = 0
      while (j < n) {
        if (vec.isNullAt(j) || mat.isNullAt(r * n + j)) return null
        acc += elemAt(mat, r * n + j, rightIsFloat) * elemAt(vec, j, leftIsFloat)
        j += 1
      }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val rows = ctx.freshName("rows")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val done = ctx.freshName("done")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |if ($n == 0 || $m % $n != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $rows = $m / $n;
         |  double[] $out = new double[$rows];
         |  boolean $done = false;
         |  for (int $r = 0; $r < $rows && !$done; $r++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      if ($x.isNullAt($j) || $y.isNullAt($r * $n + $j)) {
         |        ${ev.isNull} = true; $done = true; break;
         |      }
         |      $acc += ${elemCode(y, s"($r * $n + $j)", rightIsFloat)}
         |        * ${elemCode(x, j, leftIsFloat)};
         |    }
         |    $out[$r] = $acc;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
