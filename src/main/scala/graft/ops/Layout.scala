package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Storage-layout keys for multi-dimensional data clustering.
  *
  * A 100 TB table is pruned, not scanned: parquet keeps per-row-group
  * min/max for every column, and Spark's scan skips row groups whose
  * stats exclude the predicate. Sorting by ONE column makes only that
  * column's stats tight; interleaving the bits of several columns into a
  * single sort key (the Z-order / Morton curve) keeps the stats of ALL
  * interleaved columns simultaneously narrow, so selective predicates on
  * any of them skip most of the files — the trick behind the lakehouse
  * `OPTIMIZE ZORDER BY` maintenance command, available here as a plain
  * `Column` to feed `repartitionByRange`/`sortWithinPartitions` before a
  * write. Pure bit arithmetic (`shiftright`/`&`/`<<`/`|`), fully inside
  * whole-stage codegen, and — unlike hash-based clustering — replayable
  * bit-for-bit by any engine with 64-bit integer ops, which is what lets
  * the gate query's oracle recompute the key in SQL.
  *
  * Inputs are masked to their low `bits` bits, so callers bucket or
  * scale each dimension into `[0, 2^bits)` first (a negative or
  * overflowing value silently wraps to its low bits — by design: the
  * key is a LAYOUT hint, and a wrapped outlier costs locality, never
  * correctness). Keys, like the data, never leave the executors.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of each column into one
    * BIGINT sort key. Bit `j` of `cols(c)` lands at position
    * `j * n + (n - 1 - c)`, so the FIRST column owns the most
    * significant bit of each group — equal-prefix rows agree on the
    * leading bits of every dimension. `bits * cols.size` must fit in a
    * non-negative 64-bit long (≤ 63 bits). */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs >= 1 column")
    require(bits >= 1, s"bits must be positive, got $bits")
    val n = cols.size
    require(bits * n <= 63,
      s"bits * cols ($bits * $n) must be <= 63 to fit a signed long")
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    val terms = for {
      (c, ci) <- masked.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)),
      j * n + (n - 1 - ci))
    terms.reduce(_ bitwiseOR _)
  }

  /** The common two-dimensional case. */
  def zorderKey2(a: Column, b: Column, bits: Int = 16): Column =
    zorderKey(Seq(a, b), bits)
}
