package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** End-to-end reference-pipeline semantics (SURVEY §5.2): N hourly
  * ticks with deterministic fixture sources → raw → staging → mart,
  * checked against hand-computed goldens, plus the failure paths
  * (skip-on-source-failure, abort-when-all-fail) and the snapshot log.
  */
class PipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-08-12 $h%02d:00:00")

  test("two ticks produce 6 raw rows, one shared timestamp per batch") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    assert(p.runOnce(Some(ts(1))) === 3L)
    assert(p.runOnce(Some(ts(2))) === 3L)
    val raw = p.catalog.table(Ingest.RawTable)
    assert(raw.count() === 6L)
    // one shared extracted_at per batch (extract_bitcoin_prices.py:151)
    assert(TestSpark.collectSet[Timestamp](raw.select("extracted_at"), "extracted_at")
      === Set(ts(1), ts(2)))
    // logical schema is the declared 9 columns — p_date stays hidden
    assert(raw.columns.toSeq === Schemas.rawSchema.fieldNames.toSeq)
  }

  test("staging renames, coalesces nulls to 0, derives extraction_date") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    p.runOnce(Some(ts(1)))
    val stg = p.catalog.table(Transform.StgTable)
    assert(stg.columns.toSeq === Seq("data_source", "crypto_symbol", "price_usd",
      "price_eur", "price_brl", "market_cap_usd", "volume_24h_usd",
      "price_change_24h_pct", "extracted_at", "extraction_date"))
    // blockchain_info's null measures must be 0 after COALESCE
    val bi = stg.filter(org.apache.spark.sql.functions.col("data_source") === "blockchain_info")
      .collect().head
    assert(bi.getAs[Double]("market_cap_usd") === 0.0)
    assert(bi.getAs[Double]("volume_24h_usd") === 0.0)
    assert(bi.getAs[Double]("price_change_24h_pct") === 0.0)
    assert(stg.filter("extraction_date = DATE'2026-08-12'").count() === 3L)
  }

  test("mart matches the hand-computed golden over two same-day ticks") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    p.runOnce(Some(ts(1))) // tick 0: curve = 50000.0
    p.runOnce(Some(ts(2))) // tick 1: curve = 50125.0
    val mart = p.catalog.table(Transform.FctTable).collect()
      .map(r => r.getAs[String]("data_source") ->
        ((r.getAs[Double]("min_price_usd"), r.getAs[Double]("max_price_usd"),
          r.getAs[Double]("avg_price_usd"), r.getAs[Long]("records")))).toMap
    assert(mart.size === 3) // one row per source, single date, single symbol
    assert(mart("coingecko") === ((50000.0, 50125.0, 50062.5, 2L)))
    assert(mart("coincap") === ((50012.5, 50137.5, 50075.0, 2L)))
    assert(mart("blockchain_info") === ((49992.75, 50117.75, 50055.25, 2L)))
  }

  test("incremental mart equals the full-refresh mart across multi-day ticks") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    def dayTs(d: Int, h: Int) = Timestamp.valueOf(f"2026-08-$d%02d $h%02d:00:00")
    // ticks across two dates; incremental pipeline maintains FctIncTable
    p.runOnceIncremental(Some(dayTs(10, 1)))
    p.runOnceIncremental(Some(dayTs(10, 2)))
    p.runOnceIncremental(Some(dayTs(11, 1)))
    // full refresh over the same raw history for comparison
    Transform.run(spark, p.catalog)
    val cols = Seq("extraction_date", "data_source", "crypto_symbol",
      "min_price_usd", "max_price_usd", "avg_price_usd", "records")
    val full = p.catalog.table(Transform.FctTable)
      .selectExpr(cols: _*).collect().map(_.toSeq).toSet
    val inc = p.incMartScan.selectExpr(cols: _*).collect().map(_.toSeq).toSet
    assert(inc === full)
    assert(inc.map(_.head).size === 2) // two date partitions
  }

  test("incremental run rewrites only the touched date partition") {
    val wh = TestSpark.tempDir("graft-wh")
    val p = new Pipeline(spark, wh)
    def dayTs(d: Int, h: Int) = Timestamp.valueOf(f"2026-08-$d%02d $h%02d:00:00")
    p.runOnceIncremental(Some(dayTs(10, 1)))
    p.runOnceIncremental(Some(dayTs(11, 1)))
    val day10Dir = java.nio.file.Paths.get(
      graft.pipeline.LakeMeta.dataPath(wh, "raw.fct_bitcoin_daily_inc"),
      "extraction_date=2026-08-10")
    import scala.jdk.CollectionConverters._
    def listing = {
      val s = java.nio.file.Files.list(day10Dir)
      try s.iterator().asScala.map(f =>
        f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap
      finally s.close()
    }
    val before = listing
    p.runOnceIncremental(Some(dayTs(11, 2))) // touches only day 11
    assert(listing === before) // day-10 partition files untouched
    // and day 11 reflects both its ticks
    val day11 = p.incMartScan
      .filter(org.apache.spark.sql.functions.col("extraction_date") === "2026-08-11")
      .collect().map(r => r.getAs[Long]("records")).toSeq
    assert(day11.forall(_ == 2L))
  }

  test("runObserved emits metrics from the materialization job itself") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    p.runOnce(Some(ts(1)))
    p.runOnce(Some(ts(2)))
    val (rows, nullPrices) = Transform.runObserved(spark, p.catalog)
    assert(rows === p.catalog.table(Ingest.RawTable).count())
    assert(nullPrices === 0L) // staging coalesces nulls before observe
  }

  test("transform re-run is idempotent (full-refresh CTAS, W4)") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    p.runOnce(Some(ts(1)))
    val before = p.martScan.collect().toSet
    Transform.run(spark, p.catalog) // re-run with unchanged raw
    assert(p.martScan.collect().toSet === before)
  }

  test("failed source is skipped; all-failed batch aborts without write") {
    val dir = TestSpark.tempDir("graft-wh")
    val partial = new Pipeline(spark, dir,
      sources = Seq(new CoinGeckoFixture, new FailingSource()))
    assert(partial.runOnce(Some(ts(1))) === 1L) // skip-on-failure
    assert(partial.catalog.table(Ingest.RawTable).count() === 1L)

    val allDown = new Pipeline(spark, dir, sources = Seq(new FailingSource()))
    assert(allDown.runOnce(Some(ts(2))) === 0L) // abort, no write, no snapshot
    assert(allDown.catalog.table(Ingest.RawTable).count() === 1L)
    assert(allDown.catalog.snapshots(Ingest.RawTable).count() === 1L)
  }

  test("snapshot log: one append snapshot per tick, Iceberg-shaped") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    p.runOnce(Some(ts(1))); p.runOnce(Some(ts(2))); p.runOnce(Some(ts(3)))
    val snaps = p.snapshots.collect()
    assert(snaps.length === 3)
    assert(snaps.map(_.getAs[Long]("snapshot_id")).toSeq === Seq(1L, 2L, 3L))
    assert(snaps.forall(_.getAs[String]("operation") == "append"))
    assert(snaps.forall(_.getAs[Long]("added_records") == 3L))
  }

  test("canonical ad-hoc queries: raw limit 10, latest 5, mart scan") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    (1 to 4).foreach(h => p.runOnce(Some(ts(h))))
    assert(p.rawLimit10.count() === 10L)   // 12 rows limited to 10
    val latest = p.latest5.collect()
    assert(latest.length === 5)
    assert(latest.map(_.getAs[Timestamp]("extracted_at")).forall(t =>
      t == ts(4) || t == ts(3))) // 3 rows @h4 + 2 rows @h3
    assert(p.martScan.count() === 3L)
  }

  test("case class and StructType raw schema declarations agree (§1.2)") {
    import spark.implicits._
    val enc = implicitly[org.apache.spark.sql.Encoder[Schemas.BitcoinPrice]]
    assert(enc.schema.fieldNames.toSeq === Schemas.rawSchema.fieldNames.toSeq)
    assert(enc.schema.fields.map(_.dataType).toSeq
      === Schemas.rawSchema.fields.map(_.dataType).toSeq)
  }

  test("runSchedule: catchup=false runs only the latest interval (dag.py:19)") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    val got = p.runSchedule(Seq(ts(1), ts(2), ts(3)))
    assert(got === Seq(ts(1) -> "skipped", ts(2) -> "skipped", ts(3) -> "success"))
    // only ONE batch landed — the backlog was not backfilled
    assert(p.catalog.snapshots(Ingest.RawTable).count() === 1L)
    assert(p.runSchedule(Seq(ts(1), ts(2), ts(3)), catchup = true)
      .forall(_._2 == "success")) // backfill runs every tick
    assert(p.catalog.snapshots(Ingest.RawTable).count() === 4L)
  }

  test("runSchedule: retries re-attempt an aborted extract; retries=0 fails it") {
    // fails on the first fetch, succeeds afterwards — a transient outage
    class FlakySource extends PriceSource {
      val name = "flaky_api"
      private var calls = 0
      def fetch(extractedAt: Timestamp, tick: Long) = {
        calls += 1
        if (calls == 1) scala.util.Failure(new java.io.IOException("502"))
        else (new CoinGeckoFixture).fetch(extractedAt, tick)
      }
    }
    val noRetry = new Pipeline(spark, TestSpark.tempDir("graft-wh"),
      sources = Seq(new FlakySource))
    assert(noRetry.runSchedule(Seq(ts(1))) === Seq(ts(1) -> "failed"))

    val withRetry = new Pipeline(spark, TestSpark.tempDir("graft-wh"),
      sources = Seq(new FlakySource))
    assert(withRetry.runSchedule(Seq(ts(1)), retries = 1)
      === Seq(ts(1) -> "success"))
    assert(withRetry.catalog.table(Ingest.RawTable).count() === 1L)
  }
}
