package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** DSV2 price connector: schema, parallel per-source partitions,
  * tick semantics, and agreement with the driver-side Ingest path. */
class PriceDataSourceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def read(ticks: Int) =
    spark.read.format("graft.sources.PriceDataSource")
      .option("ticks", ticks.toString)
      .option("startEpochSec", "1735689600")
      .load()

  test("connector exposes the declared 9-column raw schema") {
    assert(read(1).schema === graft.pipeline.Schemas.rawSchema)
  }

  test("3 sources x N ticks rows; one partition per source") {
    val df = read(4)
    assert(df.count() === 12L)
    assert(df.rdd.getNumPartitions === 3)
    val bySource = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource === Map("coingecko" -> 4L, "coincap" -> 4L, "blockchain_info" -> 4L))
  }

  test("null columns flow through (blockchain_info) and ticks share timestamps") {
    val df = read(2)
    val bi = df.filter(col("source") === "blockchain_info").collect()
    assert(bi.forall(_.isNullAt(5))) // market_cap_usd
    assert(df.select(countDistinct(col("extracted_at"))).collect().head.getLong(0) === 2L)
  }

  test("connector rows equal the driver-side Ingest rows for the same ticks") {
    val viaConnector = read(3)
      .select("source", "price_usd", "extracted_at").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getTimestamp(2))).toSet
    val p = new graft.pipeline.Pipeline(spark, TestSpark.tempDir("graft-dsv2"))
    (0 until 3).foreach { t =>
      p.runOnce(Some(new java.sql.Timestamp((1735689600L + t * 3600L) * 1000L)))
    }
    val viaIngest = p.catalog.table(graft.pipeline.Ingest.RawTable)
      .select("source", "price_usd", "extracted_at").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getTimestamp(2))).toSet
    assert(viaConnector === viaIngest)
  }
}
