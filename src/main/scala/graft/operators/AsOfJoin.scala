package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row whose
  * timestamp is <= the left row's, within the same key group — the
  * event-attribution / point-in-time-lookup operator Spark has no
  * built-in for.
  *
  * Shape: a naive formulation is a range θ-join
  * (`l.key = r.key AND r.ts <= l.ts` + a per-left max) whose physical
  * plan is a per-key cross product — quadratic in events-per-key and
  * hopeless at 100 TB. This operator instead UNIONS the two sides
  * (right rows flagged 0, left rows 1), sorts each key group once by
  * `(ts, side)`, and carries the last-seen right payload forward with
  * a running `last(_, ignoreNulls)` window. One shuffle on the key,
  * one sort, linear in group size; `side` ordering makes an
  * equal-timestamp right row visible to the left row (ties match,
  * i.e. `<=` not `<`).
  *
  * Contract: right must be unique per (keys, ts) — pre-dedup with the
  * engine's LWW merge if it isn't (deterministic results require a
  * deterministic choice among equal timestamps). Right's non-key,
  * non-ts columns become the output payload (null when no match —
  * left-join semantics); their names must not collide with left's.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val leftCols = left.columns

    val lpType = left.select(struct(leftCols.map(col): _*).as("_lp"))
      .schema("_lp").dataType
    val rpType = right.select(struct(payload.map(col): _*).as("_rp"))
      .schema("_rp").dataType

    val l = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(1).as("_side"),
        struct(leftCols.map(col): _*).as("_lp"),
        lit(null).cast(rpType).as("_rp")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(lpType).as("_lp"),
        struct(payload.map(col): _*).as("_rp")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_lp").getField(c).as(c)) ++
        payload.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Same semantics with a BROADCAST right side: the right table
    * (small — a slowly-changing dimension, price history, config
    * timeline) collects to a driver map `key → ts-sorted payloads`,
    * ships once to every executor, and each LEFT row resolves its
    * match with a local binary search.
    *
    * The left side — the 100 TB fact stream — is NEVER shuffled,
    * sorted, or even repartitioned: one narrow mapPartitions over the
    * scan. That beats both other forms whenever right fits in memory,
    * for the same reason a broadcast hash join beats a sort-merge
    * join. Guarded by `maxRightRows` (driver + executor memory bound).
    *
    * Contract as [[asOf]]: right unique per (keys, ts); non-null ts.
    */
  def asOfBroadcast(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String,
      maxRightRows: Int = 1000000): DataFrame = {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{Encoders, Row}

    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rightRows = right
      .select((keys :+ tsCol) ++ payloadCols map col: _*)
      .limit(maxRightRows + 1).collect()
    require(rightRows.length <= maxRightRows,
      s"asOfBroadcast right side exceeds maxRightRows=$maxRightRows; " +
        "use asOf (union+window) for a large right side")

    def cmp(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
    val k = keys.length
    // key tuple → (sorted ts array, payload rows in the same order)
    val lookup: Map[Seq[Any], (Array[Any], Array[Seq[Any]])] = rightRows
      .groupBy(r => (0 until k).map(r.get))
      .map { case (key, rs) =>
        val sorted = rs.sortWith((x, y) => cmp(x.get(k), y.get(k)) < 0)
        (key, (sorted.map(_.get(k): Any),
          sorted.map(r => (k + 1 until r.length).map(r.get): Seq[Any])))
      }
    val bc = left.sparkSession.sparkContext.broadcast(lookup)

    val leftSchema = left.schema
    val leftIdx = keys.map(leftSchema.fieldIndex)
    val tsIdx = leftSchema.fieldIndex(tsCol)
    val rightSchema = right.schema
    val outSchema = StructType(leftSchema.fields ++
      payloadCols.map(c => rightSchema(c).copy(nullable = true)))
    val nPay = payloadCols.length

    left.mapPartitions { rows =>
      rows.map { r =>
        val ts = r.get(tsIdx)
        val payload =
          if (ts == null) None
          else bc.value.get(leftIdx.map(r.get)).flatMap { case (tss, pays) =>
            var lo = 0; var hi = tss.length - 1; var ans = -1
            while (lo <= hi) { // greatest i with tss(i) <= ts
              val mid = (lo + hi) >>> 1
              if (cmp(tss(mid), ts) <= 0) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) Some(pays(ans)) else None
          }
        Row.fromSeq(r.toSeq ++ payload.getOrElse(Seq.fill(nPay)(null)))
      }
    }(Encoders.row(outSchema))
  }

  /** Same semantics through the custom whole-operator Catalyst path:
    * [[graft.plans.AsOfJoinPlan]] → `AsOfJoinStrategy` →
    * sort-merge [[graft.plans.AsOfJoinExec]]. Each side shuffles its
    * OWN columns once and the partitions merge in a single linear pass
    * — no null-padded union doubling row width, no window function;
    * see AsOfJoinExec's doc for the scale argument. Filters on left
    * columns still reach the scan via `PushFilterThroughAsOfJoin`.
    */
  def asOfNative(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.GraftFunctions.ensureRegistered(spark)
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Shared lineage (both sides off one DataFrame) would leave the two
    // children sharing expression IDs; the analyzer's
    // DeduplicateRelations can't see through a custom node, so re-alias
    // the right side to fresh IDs ourselves.
    val rp =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graft.GraftBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lp, rp,
        keys.map(attr(lp, _)), keys.map(attr(rp, _)),
        attr(lp, tsCol), attr(rp, tsCol)))
  }
}
