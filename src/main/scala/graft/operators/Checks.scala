package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the engine-side
  * generalization of the reference's test oracle, whose whole job is
  * "after sync, every ES doc exists in C* and all common fields
  * match" (checkSync, reference tests/testSyncClass.py:273-333): a
  * referential-integrity check plus field equality. A pipeline wants
  * the same assertions continuously: primary-key uniqueness, foreign
  * keys resolving, columns non-null, values in range.
  *
  * Each check emits one (check name, n_violations, n_rows) row.
  * Row-level checks (notNull, inRange, satisfies) share ONE aggregate
  * pass over the table — violation counts are conditional sums, so N
  * checks cost one scan, not N. Uniqueness is one hash aggregate on
  * the key; referential integrity is one left-anti join (broadcast
  * when the referenced key set is small). Nothing collects to the
  * driver but the per-check counters.
  */
object Checks {

  sealed trait Check { def name: String }
  /** Every row's `cols` combination appears once. SQL UNIQUE
    * semantics: rows with a null anywhere in the key are exempt
    * (combine with NotNull when null keys are themselves violations).
    */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** `col` is never null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** `col` ∈ [lo, hi] (nulls are not violations — combine with
    * NotNull when they should be).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** Arbitrary row predicate that must hold. */
  final case class Satisfies(label: String, predicate: Column) extends Check {
    def name = s"satisfies($label)"
  }
  /** Every non-null `cols` combination exists in `ref`'s `refCols`. */
  final case class RefersTo(cols: Seq[String], ref: DataFrame, refCols: Seq[String])
      extends Check {
    require(cols.size == refCols.size,
      s"refers_to: ${cols.size} probe columns vs ${refCols.size} referenced — " +
        "a zip would silently validate only the shorter prefix")
    def name = s"refers_to(${cols.mkString(",")})"
  }

  private def violation(c: Check): Option[Column] = c match {
    case NotNull(col0) => Some(col(col0).isNull)
    case InRange(col0, lo, hi) =>
      Some(col(col0).isNotNull && !col(col0).between(lo, hi))
    case s: Satisfies => Some(!coalesce(s.predicate, lit(false)))
    case _ => None
  }

  /** The single shared pass for every row-level check: count(*) plus
    * one conditional sum per check, over ONE scan of `df`. Exposed so
    * the spec can pin the one-scan plan; `run` consumes its head row.
    * Sums are null-guarded so a ZERO-ROW table reports 0 violations
    * (sum over no rows is SQL NULL, not 0).
    */
  def rowLevelAgg(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowAggs = count(lit(1)).as("__n") +:
      checks.flatMap(c => violation(c).map(v =>
        coalesce(sum(when(v, 1L).otherwise(0L)), lit(0L)).as(c.name)))
    df.agg(rowAggs.head, rowAggs.tail: _*)
  }

  /** Run all checks; output (check_name, n_violations, n_rows), one
    * row per check, `n_rows` = table row count (the denominator a
    * monitor alerts on).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val rowLevel = checks.filter(violation(_).isDefined)
    val aggRow = rowLevelAgg(df, rowLevel).head
    val nRows = aggRow.getLong(0)
    val rowResults = rowLevel.zipWithIndex.map { case (c, i) =>
      (c.name, aggRow.getLong(i + 1))
    }

    val uniqueResults = checks.collect { case u @ Unique(cols) =>
      // SQL UNIQUE-constraint semantics: a row with a null anywhere in
      // the key is exempt (nulls compare UNKNOWN, so they never
      // duplicate each other) — null keys are NotNull's business, and
      // exempting them here keeps not_null + unique from double-
      // reporting the same rows. Mirrors RefersTo's null exemption.
      val dups = df.na.drop("any", cols)
        .groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__c"))
        .filter(col("__c") > 1)
        .agg(sum(col("__c"))).head
      (u.name, if (dups.isNullAt(0)) 0L else dups.getLong(0))
    }

    val refResults = checks.collect { case r @ RefersTo(cols, ref, refCols) =>
      val probe = df.select(cols.map(col): _*)
        .na.drop("any") // null FKs are NotNull's business
      val target = ref.select(refCols.zip(cols).map {
        case (rc, c) => col(rc).as(c)
      }: _*).distinct()
      (r.name, probe.join(target, cols, "left_anti").count())
    }

    (rowResults ++ uniqueResults ++ refResults)
      .map { case (n, v) => (n, v, nRows) }
      .toDF("check_name", "n_violations", "n_rows")
  }
}
