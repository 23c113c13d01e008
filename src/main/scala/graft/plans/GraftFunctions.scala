package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native expressions as SQL functions.
  *
  * Two routes, both public Spark API:
  *  - `GraftExtensions` via `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (cluster-wide, the idiomatic deployment path);
  *  - `GraftFunctions.ensureRegistered(spark)` for sessions built
  *    elsewhere (the driver harness owns its own SparkSession, so
  *    operators that need these functions call this idempotently).
  *
  * After either, `graft_dot(a, b)` / `graft_cosine(a, b)` resolve in
  * SQL and via `functions.call_function` from the Column API.
  */
object GraftFunctions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (new FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid"),
      (args: Seq[Expression]) => NearestCentroid(args(0), args(1), args(2))),
    (new FunctionIdentifier("graft_matvec"),
      new ExpressionInfo(classOf[MatVecProduct].getName, "graft_matvec"),
      (args: Seq[Expression]) => MatVecProduct(args(0), args(1))),
    // Spark's own runtime-filter expressions, surfaced for BloomDedup:
    // internal-only in the builtin registry (InjectRuntimeFilter plants
    // them directly), but public classes — registering them here gives
    // the engine a codegen'd, UDF-free bloom build/probe path.
    (new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))),
    (new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1))))

  /** Idempotently register on an existing session (classic runtime):
    * the native expressions plus the as-of whole-operator planner
    * strategy and its filter-pushdown optimizer rule (the
    * `spark.experimental` route — public API for sessions we don't
    * build ourselves).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val registry = classic.sessionState.functionRegistry
    all.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
    val exp = classic.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsOfJoin
  }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // injected into the operator-optimization batch: runs to fixed
    // point WITH the built-in pushdown rules, unlike extraOptimizations
    ext.injectOptimizerRule(_ => PushFilterThroughAsOfJoin)
  }
}
