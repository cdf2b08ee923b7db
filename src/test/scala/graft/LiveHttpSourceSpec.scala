package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.pipeline._

/** The live HTTP sources' payload→row mapping against canned API
  * payloads (shaped exactly like each API's documented response), plus
  * the offline degradation path: with no egress the live roster is the
  * all-sources-down case the pipeline already tolerates. */
class LiveHttpSourceSpec extends AnyFunSuite {
  private val ts = Timestamp.valueOf("2026-08-12 01:00:00")

  test("CoinGecko payload: nullable native numerics via .get()") {
    val p = Http.parse(
      """{"bitcoin":{"usd":50000.0,"eur":46000.5,"brl":272500.0,
        |"usd_market_cap":9.85e11,"usd_24h_vol":1.75e10}}""".stripMargin)
    val row = new CoinGeckoLive().parsePayload(p, ts)
    assert(row.price_usd === Some(50000.0))
    assert(row.price_eur === Some(46000.5))
    assert(row.market_cap_usd === Some(9.85e11))
    assert(row.change_24h_pct === None) // absent key → null, like dict.get
    assert(row.extracted_at === ts)
  }

  test("CoinCap payload: string casts, 0 defaults, hardcoded FX") {
    val p = Http.parse(
      """{"data":{"priceUsd":"50012.500000","marketCapUsd":"985246187500.00"}}""")
    val row = new CoinCapLive().parsePayload(p, ts)
    assert(row.price_usd === Some(50012.5))
    assert(row.price_eur === Some(50012.5 * 0.85)) // FX derived, py:84
    assert(row.price_brl === Some(50012.5 * 5.50))
    assert(row.volume_24h_usd === Some(0.0)) // float(data.get(k, 0))
  }

  test("CoinCap payload: present-but-null field fails the source (float(None) raises)") {
    val p = Http.parse("""{"data":{"priceUsd":null}}""")
    assertThrows[IllegalArgumentException](new CoinCapLive().parsePayload(p, ts))
  }

  test("Blockchain.info payload: last prices, null cap/volume/change") {
    val p = Http.parse(
      """{"USD":{"last":49992.75},"EUR":{"last":45743.37},"BRL":{"last":274960.13}}""")
    val row = new BlockchainInfoLive().parsePayload(p, ts)
    assert(row.price_usd === Some(49992.75))
    assert(row.market_cap_usd === None)
    assert(row.volume_24h_usd === None)
    assert(row.change_24h_pct === None)
  }

  test("all sources down: the live roster degrades to the all-failed abort path") {
    // An unroutable endpoint (nothing listens on localhost:1) makes
    // every fetch fail fast and deterministically — with or without
    // machine egress — instead of depending on the sandbox having no
    // network and burning connect timeouts against the real APIs.
    val spark = TestSpark.spark
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"),
      sources = LiveSources.all(timeoutMs = 1500,
        urlOverride = Some("http://127.0.0.1:1/down")))
    assert(p.runOnce(Some(ts)) === 0L) // every fetch Failure → abort, no write
  }
}
