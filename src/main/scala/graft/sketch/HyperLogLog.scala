package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog as a DISTRIBUTED, MERGEABLE table — approximate
  * distinct counts whose stored state is `m` registers per group, no
  * matter how many items stream through. Spark's built-in
  * `approx_count_distinct` answers one query; THIS form keeps the
  * sketch itself as data — per-shard/per-day sketches union and merge
  * by per-register MAX (the HLL merge law), so yesterday's registers
  * never rescan yesterday's corpus: the same incremental discipline
  * as AdditiveRollup (additive state) and CountMin (counter state),
  * completed with max-state.
  *
  * Layout: one row per non-empty (keys..., register, r) where
  * r = max over items of rho(item) — the leading-zero rank of the
  * item's hash suffix. Estimation is the canonical Flajolet et al.
  * form: E = α·m² / Σ 2^(−M_j) (absent registers contribute 2⁰ = 1),
  * with the linear-counting small-range correction m·ln(m/V) when
  * E ≤ 2.5 m and V (empty registers) > 0.
  *
  * Determinism across engines: the hash is the md5 60-bit base (same
  * route as MinHash/CountMin — DuckDB re-derives it), registers and
  * ranks are integer arithmetic, and Σ 2^(−r) is a sum of exact
  * dyadic rationals — order-independent in IEEE doubles. Only the
  * final ln/divide touches inexact arithmetic, rounded to 2 decimals
  * at the oracle boundary.
  */
object HyperLogLog {

  /** m = 64 registers (b = 6 bits): α = 0.709 per the HLL paper's
    * constants. The md5 base leaves 54 hash bits for the rank, so
    * rho ∈ [1, 55].
    */
  val M = 64
  val Alpha = 0.709

  private def hash60(item: Column): Column =
    conv(substring(md5(item), 1, 15), 16, 10).cast("long")

  /** (keys..., register, r) — the sketch table, ≤ m rows per group. */
  def build(df: DataFrame, itemCol: Column, keys: Seq[String] = Nil): DataFrame = {
    val v = hash60(itemCol)
    df.filter(itemCol.isNotNull)
      .select((keys.map(col) :+ pmod(v, lit(M.toLong)).as("register")
        :+ v.as("_v")): _*)
      .withColumn("_w", expr(s"_v div $M"))
      .withColumn("_rho",
        when(col("_w") === 0, lit(55L))
          .otherwise(lit(54L) - floor(log2(col("_w"))).cast("long")))
      .groupBy((keys.map(col) :+ col("register")): _*)
      .agg(max("_rho").as("r"))
  }

  /** Merge shard sketches with the SAME keys: per-register max. */
  def merge(sketches: Seq[DataFrame], keys: Seq[String] = Nil): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy((keys.map(col) :+ col("register")): _*)
      .agg(max("r").as("r"))
  }

  /** Per-group estimates: (keys..., hll_estimate). */
  def estimate(sketch: DataFrame, keys: Seq[String] = Nil): DataFrame = {
    val grouped =
      if (keys.isEmpty) sketch.agg(
        sum(pow(lit(2.0), -col("r"))).as("_z"), count(lit(1)).as("_np"))
      else sketch.groupBy(keys.map(col): _*)
        .agg(sum(pow(lit(2.0), -col("r"))).as("_z"), count(lit(1)).as("_np"))
    grouped
      .withColumn("_e",
        lit(Alpha * M * M) / (col("_z") + (lit(M) - col("_np"))))
      .withColumn("_vz", lit(M.toLong) - col("_np"))
      .withColumn("hll_estimate",
        when(col("_e") <= lit(2.5 * M) && col("_vz") > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / col("_vz")))
          .otherwise(col("_e")))
      .drop("_z", "_np", "_e", "_vz")
  }
}
