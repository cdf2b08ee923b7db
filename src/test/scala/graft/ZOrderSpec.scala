package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Morton-code correctness and the file-level locality it buys. */
class ZOrderSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum

  test("interleave2 matches the reference bit-twiddle") {
    val pairs = for (x <- 0L to 7L; y <- 0L to 7L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", ZOrder.interleave2($"x", $"y", 3).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 3), s"($x,$y)")
    }
  }

  test("writeZOrdered: each file covers a tight rectangle of BOTH keys") {
    val grid = (for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong))
    val dir = TestSpark.tempDir("graft-zorder")
    ZOrder.writeZOrdered(grid.toDF("x", "y"), dir, "x", "y", numFiles = 4, bits = 2)
    val files = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min($"x").as("x0"), max($"x").as("x1"),
        min($"y").as("y0"), max($"y").as("y1"))
      .collect()
    assert(files.length === 4)
    // z-order on a 4×4 grid into 4 files = the 4 quadrants: every file
    // spans at most 2 values of x AND at most 2 of y (a single-column
    // sort would span all 4 values of the other key in every file)
    files.foreach { r =>
      assert(r.getAs[Long]("x1") - r.getAs[Long]("x0") <= 1, r.toString)
      assert(r.getAs[Long]("y1") - r.getAs[Long]("y0") <= 1, r.toString)
    }
  }
}
