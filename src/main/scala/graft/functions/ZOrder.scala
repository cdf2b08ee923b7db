package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column data skipping.
  *
  * Sorting a 100 TB table by one column gives perfect parquet
  * min/max pruning on that column and none on any other; sorting by
  * the Morton code of two columns gives good pruning on BOTH —
  * each file covers a small rectangle of the (x, y) key space. This is
  * the layout strategy Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
  * built here from Spark primitives: a pure bit-arithmetic expression
  * tree (stays inside whole-stage codegen — no UDF) + range
  * repartitioning on the code.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative integral
    * columns: x occupies even bit positions, y odd. Result fits a
    * long for bits ≤ 31. */
  def interleave2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Write `df` z-ordered by two key columns: range-partition on the
    * Morton code (equal codes never straddle files), sort within each
    * partition, one parquet file per partition with tight min/max
    * stats on BOTH keys. `numFiles` sizes the layout (at 100 TB this
    * is files-per-partition after the date/bucket split). */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    val z = interleave2(
      pmod(col(xCol), lit(1L << bits)), pmod(col(yCol), lit(1L << bits)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
