package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional layout trick:
  * sort data by the bit-interleaved key of two (or more) filter
  * columns before writing, and every file's min/max footer stats
  * become narrow in BOTH dimensions, so a scan filtered on either
  * column (or both) skips most files. One expression + one
  * `sortWithinPartitions` at write time buys two-dimensional pruning
  * that a single-column sort gives only one of — the standard
  * lakehouse OPTIMIZE ZORDER shape, as a plain codegen'd column.
  *
  * Two layers: the raw interleave over already-reduced ints
  * (`zValue(x, y)` — reproducible verbatim in the oracle SQL,
  * f13), and the full LAYOUT path (`zValue(df, cols)` +
  * [[writeZOrdered]]): rank buckets from ONE `percentile_approx`
  * aggregate make the curve distribution-agnostic (approximate
  * quantiles are exactly right — boundaries only steer layout,
  * never results), then a range-partitioned, in-partition-sorted
  * write clusters row groups into small key-space hyper-rectangles.
  * The ZOrderSpec measures the payoff: a both-dims predicate reads
  * < 30% of the rows an unordered layout surfaces.
  */
object ZOrder {

  /** Bit-interleaved z-value of two columns already reduced to
    * [0, 2^bits): x occupies even bit positions, y odd.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be 1..31 (2*bits fits a long)")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _) // disjoint bit positions: + == |
  }

  /** The same expression as SQL text (for oracles / SQL surfaces). */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** Bucket index (0..2^bits-1) of `c` under precomputed ascending
    * boundaries: count of boundaries <= value, capped. Boundaries
    * ride as a literal array — no join, stays in codegen.
    */
  private def bucketOf(c: Column, bounds: Seq[Double], bits: Int): Column =
    least(
      size(filter(typedlit(bounds), b => b <= c.cast("double"))),
      lit((1 << bits) - 1)).cast("long")

  /** Interleave the low `bits` of each bucket column: bit i of
    * column j lands at position i * n + j (n-dimensional Morton).
    */
  private def interleave(bs: Seq[Column], bits: Int): Column = {
    val n = bs.length
    val terms = for {
      i <- 0 until bits
      (b, j) <- bs.zipWithIndex
    } yield (shiftright(b, i) % 2) * lit(1L << (i * n + j))
    terms.reduce(_ + _)
  }

  /** The z-value column for `cols` with 2^bits rank buckets per
    * dimension; boundary lists come from one `percentile_approx`
    * pass over `df` (distribution-agnostic layout).
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val qs = (1 until (1 << bits)).map(i => i.toDouble / (1 << bits))
    val row = df.agg(
      percentile_approx(col(cols.head).cast("double"), typedlit(qs), lit(10000))
        .as(cols.head),
      cols.tail.map(c =>
        percentile_approx(col(c).cast("double"), typedlit(qs), lit(10000))
          .as(c)): _*).head()
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      bucketOf(col(c), row.getSeq[Double](i), bits)
    }
    interleave(buckets, bits)
  }

  /** Write `df` clustered by the z-curve over `cols`: range-partition
    * on the z-value, sort within partitions, drop the helper column.
    * Small parquet row groups multiply the skipping granularity — the
    * writer option is the caller's knob.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      bits: Int = 8, numFiles: Int = 32, blockSize: Int = 1 << 20): Unit =
    df.withColumn("_z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize.toString)
      .parquet(path)
}
