package graft.operators

import org.apache.spark.sql.Column
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
  * The arithmetic is pure bit shifts over non-negative ints reduced
  * to `bits` (caller masks/mods first), reproducible verbatim in any
  * SQL dialect — the oracle re-derives it term for term.
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
}
