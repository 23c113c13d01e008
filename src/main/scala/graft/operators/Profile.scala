package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the null/cardinality/range summary a pipeline
  * computes before trusting a new drop of data (schema drift, broken
  * joins and truncated loads all show up here first).
  *
  * One row per profiled column: (col_name, n_null, n_distinct,
  * min_s, max_s). Values are stringified through a caller-supplied
  * formatter so type-specific rendering (timestamp format, double
  * rounding) is explicit and cross-engine-stable.
  *
  * Scale: ONE pass over the table. All metrics for all columns ride a
  * single aggregate (Catalyst plans the multiple DISTINCT aggregates
  * via one Expand — a constant small factor, not extra scans), and the
  * resulting single metrics row is exploded driver-free into the
  * per-column layout. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` — the plan shape is unchanged and the
  * Expand disappears.
  */
object Profile {

  /** A column to profile and how to render its min/max as strings. */
  final case class Spec(name: String, render: Column => Column = identity)

  def profile(df: DataFrame, specs: Seq[Spec]): DataFrame = {
    require(specs.nonEmpty, "profile needs at least one column")
    val aggs = specs.flatMap { s =>
      val c = col(s.name)
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${s.name}__nn"),
        countDistinct(c).as(s"${s.name}__nd"),
        s.render(min(c)).cast("string").as(s"${s.name}__mn"),
        s.render(max(c)).cast("string").as(s"${s.name}__mx"))
    }
    val metricsRow = df.agg(aggs.head, aggs.tail: _*)
    val perCol = specs.map { s =>
      struct(
        lit(s.name).as("col_name"),
        col(s"${s.name}__nn").as("n_null"),
        col(s"${s.name}__nd").as("n_distinct"),
        col(s"${s.name}__mn").as("min_s"),
        col(s"${s.name}__mx").as("max_s"))
    }
    metricsRow.select(explode(array(perCol: _*)).as("m")).select("m.*")
  }
}
