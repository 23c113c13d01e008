package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.similarity.VectorOps

class VectorExpressionsSpec extends SparkSpec {

  private def floats(rows: Seq[(Long, Seq[Float], Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("id", "a", "b")
  }

  test("native dot and cosine are BIT-identical to the HOF forms") {
    GraftFunctions.ensureRegistered(spark)
    val gen = Gen.listOfN(64, Gen.chooseNum(-10f, 10f))
    checkProp(Gen.zip(gen, gen), cases = 40) { case (xs, ys) =>
      val df = floats(Seq((1L, xs, ys)))
      val hofA = VectorOps.asDouble(col("a"))
      val hofB = VectorOps.asDouble(col("b"))
      val r = df.select(
        VectorOps.dot(hofA, hofB).as("dot_hof"),
        VectorOps.dotNative(col("a"), col("b")).as("dot_nat"),
        VectorOps.cosine(hofA, hofB).as("cos_hof"),
        VectorOps.cosineNative(col("a"), col("b")).as("cos_nat")).head()
      // exact bit equality, not approx: same fold order, same widening
      java.lang.Double.doubleToLongBits(r.getDouble(1)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(0))
      java.lang.Double.doubleToLongBits(r.getDouble(3)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(2))
    }
  }

  test("null semantics mirror the HOF composition") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    // (label, a, b) with nullable arrays/elements, as array<double> SQL
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('null_side', CAST(null AS ARRAY<DOUBLE>), array(1.0d, 2.0d)),
        |  ('len_mismatch', array(1.0d), array(1.0d, 2.0d)),
        |  ('null_elem', array(1.0d, CAST(null AS DOUBLE)), array(1.0d, 2.0d)),
        |  ('empty', array(), array()),
        |  ('zero_norm', array(0.0d, 0.0d), array(1.0d, 2.0d))
        |AS t(label, a, b)""".stripMargin)
    val out = df.select(col("label"),
      VectorOps.dotNative(col("a"), col("b")).as("dot"),
      VectorOps.cosineNative(col("a"), col("b")).as("cos"))
      .collect().map(r => r.getString(0) ->
        (r.isNullAt(1), r.isNullAt(2))).toMap
    out("null_side") shouldBe ((true, true))
    out("len_mismatch") shouldBe ((true, true))
    out("null_elem") shouldBe ((true, true))
    // empty: dot = fold init 0.0; cosine = 0/0 -> null (try_divide
    // semantics — the HOF Divide would THROW here under ANSI mode,
    // which is the one deliberate deviation: an engine function
    // should degrade to null on a degenerate vector, not kill the job)
    out("empty") shouldBe ((false, true))
    out("zero_norm") shouldBe ((false, true))

    // the three null-propagation cases agree with the HOF composition
    // (no division-by-zero involved there)
    val hof = df.filter(col("label").isin("null_side", "len_mismatch", "null_elem"))
      .select(col("label"),
        VectorOps.dot(col("a"), col("b")).as("dot_hof"),
        VectorOps.cosine(col("a"), col("b")).as("cos_hof"))
      .collect().map(r => r.getString(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    hof.values.foreach(_ shouldBe ((true, true)))
  }

  test("graft_dot / graft_cosine resolve in SQL after registration") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c""".stripMargin)
      .head()
    r.getDouble(0) shouldBe 11.0
    r.getDouble(1) shouldBe 1.0 +- 1e-12
  }

  test("mixed float/double inputs widen exactly like cast") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((Seq(1.5f, -2.25f, 0.1f), Seq(3.0, 4.0, 5.0)))
      .toDF("f", "d")
    val r = df.select(
      VectorOps.dotNative(col("f"), col("d")).as("nat"),
      VectorOps.dot(VectorOps.asDouble(col("f")), col("d")).as("hof")).head()
    java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
      java.lang.Double.doubleToLongBits(r.getDouble(1))
  }

  test("native expressions stay inside whole-stage codegen") {
    GraftFunctions.ensureRegistered(spark)
    // non-foldable input (a local Seq fixture would be constant-folded
    // into a LocalTableScan before any codegen happens)
    val df = spark.range(4)
      .select(col("id"),
        array(col("id").cast("float"), lit(2.0f)).as("a"),
        array(lit(3.0f), col("id").cast("float")).as("b"))
      .select(col("id"), VectorOps.cosineNative(col("a"), col("b")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes a WholeStageCodegen stage in the plan string;
    // the expression must sit INSIDE such a stage (no fallback project)
    plan should include regex "\\*\\(\\d+\\) Project \\[.*graft_cosine"
    // and the codegen path actually compiles and computes correctly
    val r = df.filter(col("id") === 1).head().getDouble(1)
    r shouldBe ((3.0 + 2.0) / (math.sqrt(5.0) * math.sqrt(10.0))) +- 1e-12
  }
}
