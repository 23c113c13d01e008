package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_nearest_centroid(emb, centroids, cells)` — coarse-quantizer
  * assignment as ONE codegen'd k×d primitive loop.
  *
  * Returns the element of `cells` whose centroid (same position in
  * `centroids`) maximizes cosine(emb, centroid); cosine ties resolve
  * to the FIRST maximal position, so with cell ids sorted ascending
  * the lowest id wins (IvfKnn's documented tie rule).
  *
  * Why an expression and not composition: the two composed forms both
  * fail at realistic codebook sizes — k inlined cosine expressions
  * make janino compilation time explode past k ≈ 64 (observed: k=200
  * never finished on 2k rows), and the HOF `zip_with`+`aggregate`
  * argmax allocates one lambda frame and boxed Double per element per
  * cell (~1 ms/row at k=200×64d). Here the centroid matrix is a
  * `double[][]` reference object hoisted out of the loop (evaluated
  * ONCE from the foldable literal children at plan time), the
  * embedding is copied to a primitive buffer, and the per-cell pass
  * is dot+norm madds — k×d flops and nothing else.
  *
  * Per-cell cosine is bit-identical to `graft_cosine` (same
  * sequential accumulation, float widened before multiply; the
  * embedding-norm factor is computed once — same value, same
  * rounding, as recomputing it per cell).
  *
  * Null semantics: null/any-null-element embedding → null; a centroid
  * of mismatched length or zero norm is never selected; no selectable
  * centroid (e.g. empty embedding) → null.
  */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = {
    def vecOk(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val centsOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val cellsOk = third.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (!vecOk(first.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: first argument must be array<float|double>, got ${first.dataType.catalogString}")
    else if (!centsOk || !cellsOk || !second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: centroids must be a foldable array<array<double>> and cells a foldable array<int>")
    else TypeCheckResult.TypeCheckSuccess
  }

  private def embIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Foldable children materialized once: double[][] + int[]. Null
    * anywhere in the literals (null outer array, null centroid, null
    * component, null cell id) fails here with a descriptive error
    * instead of an anonymous NPE mid-execution — foldable-but-null
    * inputs pass checkInputDataTypes, so this is the first point the
    * values are actually seen.
    */
  @transient private lazy val (centroids, cells): (Array[Array[Double]], Array[Int]) = {
    val cRaw = second.eval(null)
    val idsRaw = third.eval(null)
    require(cRaw != null && idsRaw != null,
      s"$prettyName: centroids and cells literals must not be null")
    val c = cRaw.asInstanceOf[ArrayData]
    val cents = Array.tabulate(c.numElements()) { i =>
      val a = c.getArray(i)
      require(a != null, s"$prettyName: centroid $i is null — " +
        "the centroids array must not contain null elements")
      require(!(0 until a.numElements()).exists(a.isNullAt),
        s"$prettyName: centroid $i contains null components")
      a.toDoubleArray()
    }
    val idsArr = idsRaw.asInstanceOf[ArrayData]
    require(!(0 until idsArr.numElements()).exists(idsArr.isNullAt),
      s"$prettyName: cells array contains null ids")
    val ids = idsArr.toIntArray()
    require(cents.length == ids.length,
      s"$prettyName: ${cents.length} centroids vs ${ids.length} cell ids")
    (cents, ids)
  }

  /** Shared by eval and the generated code (called as a static-shaped
    * method on the reference object — the loop is identical either
    * way, and JIT compiles it to the same primitive code).
    */
  def assign(emb: Array[Double]): Int = {
    val n = emb.length
    var na = 0.0
    var i = 0
    while (i < n) { na += emb(i) * emb(i); i += 1 }
    val normA = math.sqrt(na)
    var best = -1
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var dot = 0.0
        var nb = 0.0
        var j = 0
        while (j < n) {
          val yv = cent(j)
          dot += emb(j) * yv
          nb += yv * yv
          j += 1
        }
        val denom = normA * math.sqrt(nb)
        if (denom != 0.0) {
          val cos = dot / denom
          if (cos > bestCos) { bestCos = cos; best = c }
        }
      }
      c += 1
    }
    best
  }

  /** ArrayData → primitive buffer; null if any element is null. */
  def toBuffer(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      buf(i) = if (embIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    buf
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = first.eval(input)
    if (a == null) return null
    val buf = toBuffer(a.asInstanceOf[ArrayData])
    if (buf == null) return null
    val best = assign(buf)
    if (best < 0) null else cells(best)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // the whole expression (incl. the materialized matrix) rides along
    // as one reference object; generated code calls its primitive loop
    val self = ctx.addReferenceObj("nearestCentroid", this, classOf[NearestCentroid].getName)
    val embCode = first.genCode(ctx)
    val buf = ctx.freshName("buf")
    val best = ctx.freshName("best")
    ev.copy(code =
      code"""
        ${embCode.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = -1;
        if (!${embCode.isNull}) {
          double[] $buf = $self.toBuffer(${embCode.value});
          if ($buf != null) {
            int $best = $self.assign($buf);
            if ($best >= 0) {
              ${ev.isNull} = false;
              ${ev.value} = $self.cellAt($best);
            }
          }
        }
      """)
  }

  /** Codegen accessor. */
  def cellAt(i: Int): Int = cells(i)

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
