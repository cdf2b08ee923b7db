package graft.pipeline

/** Forked-JVM EXTERNAL writer for the [[graft.sources.GraftCatalog]]
  * round-trip spec: a session that knows NOTHING about this repo's
  * facade objects — only the two catalog configs the reference's own
  * deployment sets for Iceberg
  * (Iceberg-dbt-project/spark/spark-defaults.conf:3-9) — creates a
  * namespace, a day-partitioned table, appends three batches via
  * `df.writeTo(...).append()` (extract_bitcoin_prices.py:193), lands a
  * fourth commit through SQL `INSERT INTO`, CTASes a mart, and reads
  * everything back by multi-part identifier including `VERSION AS OF`.
  * The spec then re-opens the SAME warehouse with the in-process
  * LakeCatalog facade and asserts snapshot-log and row parity — the
  * "external session appends, facade sees the commits" contract.
  *
  * args(0) = warehouse directory. Prints CAT_WRITE_OK on success.
  */
object CatalogWriteProbe {
  def main(args: Array[String]): Unit = {
    val wh = args(0)
    val spark = graft.Sessions.build("4")
    try {
      spark.conf.set("spark.sql.catalog.lake", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.lake.warehouse", wh)

      spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.raw")
      // idempotence — the reference re-runs this every DAG tick
      spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.raw")
      spark.sql(
        """CREATE TABLE lake.raw.bitcoin_prices (
          |  id BIGINT, name STRING, price_usd DOUBLE,
          |  extracted_at TIMESTAMP)
          |PARTITIONED BY (days(extracted_at))""".stripMargin)

      import spark.implicits._
      (1 to 3).foreach { i =>
        val df = Seq((i.toLong, s"row$i", i * 10.0,
          java.sql.Timestamp.valueOf(f"2026-01-0$i%d 00:00:00")))
          .toDF("id", "name", "price_usd", "extracted_at")
        df.writeTo("lake.raw.bitcoin_prices").append()
      }
      // SQL insert path — must land as commit 4 through the same seam
      spark.sql(
        """INSERT INTO lake.raw.bitcoin_prices VALUES
          |  (4L, 'row4', 40.0, TIMESTAMP '2026-01-04 00:00:00')""".stripMargin)
      // CTAS through the catalog (non-atomic create + first-commit write)
      spark.sql(
        """CREATE TABLE lake.raw.mart AS
          |SELECT id, price_usd FROM lake.raw.bitcoin_prices
          |WHERE id <= 2""".stripMargin)

      // external read-back by identifier + SQL time travel
      val n = spark.table("lake.raw.bitcoin_prices").count()
      val v2 = spark.sql(
        "SELECT count(*) FROM lake.raw.bitcoin_prices VERSION AS OF 2")
        .first().getLong(0)
      val mart = spark.table("lake.raw.mart").count()
      println(s"CAT_ROWS=$n CAT_V2=$v2 CAT_MART=$mart")
      require(n == 4 && v2 == 2 && mart == 2,
        s"external round-trip mismatch: rows=$n v2=$v2 mart=$mart")
      println("CAT_WRITE_OK")
    } finally spark.stop()
  }
}
