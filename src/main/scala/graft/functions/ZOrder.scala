package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data layout — the
  * file-skipping lever for scans filtered on TWO columns at once: sort
  * by a bit-interleaved key and both dimensions cluster simultaneously,
  * so parquet min/max footers prune files for either predicate (a plain
  * sort clusters only its leading column). This is a layout-time
  * optimization: pay one range-partitioned sort at write, save scan IO
  * on every read after.
  *
  * The interleave is unrolled in Scala over a literal bit count, so the
  * whole key is one codegen'd long expression — no UDF, no HOF — and
  * plain shift/mask arithmetic an independent engine reproduces.
  */
object ZOrder {

  /** Morton-interleave two non-negative int columns, `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Inputs must
    * already be bucketed/clamped to [0, 2^bits); 2·bits ≤ 62. */
  def morton2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long"); val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** SQL text of [[morton2]] for a DuckDB oracle — the identical
    * unrolled shift/mask sum. */
  def morton2Sql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x) >> $i) & 1) * ${1L << (2 * i)} + ((($y) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Clamp a long column into [0, 2^bits) by unsigned saturation —
    * negative values to 0, overflow to the max code. */
  def clampCode(c: Column, bits: Int): Column =
    least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1))

  /** Driver-side [[morton2]] on literals — for computing z-range bounds
    * of a box predicate. The key is monotone in EACH coordinate (x's
    * bits occupy fixed positions, likewise y's), so every point of the
    * box [xlo,xhi]×[ylo,yhi] has a key in
    * [morton2(xlo,ylo), morton2(xhi,yhi)]: a coarse scan interval that
    * prunes parquet files by footer stats. The interval also contains
    * z-curve excursions OUTSIDE the box, so callers must re-apply the
    * exact box predicate after the range scan. */
  def morton2Long(x: Long, y: Long, bits: Int): Long = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      ((x >> i) & 1L) * (1L << (2 * i)) + ((y >> i) & 1L) * (1L << (2 * i + 1))
    }.sum
  }
}
