package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FormatRoundTrip

/** CSV/JSON/ORC sinks and sources are lossless: every format's
  * round-tripped aggregate profile must be identical (and identical to
  * the parquet original, which the oracle gate checks). */
class FormatRoundTripSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("roundTripProfile: all formats agree on every checksum column") {
    val rows = FormatRoundTrip.roundTripProfile(spark, TestSpark.sfDir).collect()
    assert(rows.map(_.getAs[String]("format")).sorted.toSeq === Seq("csv", "json", "orc"))
    val profiles = rows.map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("n_users"),
      r.getAs[Long]("sum_value_c"), r.getAs[Long]("min_ts_us"), r.getAs[Long]("max_ts_us")))
    assert(profiles.distinct.length === 1, s"formats disagree: ${rows.mkString(", ")}")
    assert(profiles.head._1 > 0)
  }
}
