package graft.pipeline

import java.sql.Timestamp
import scala.util.Try
import Schemas.BitcoinPrice

/** Price-source abstraction replacing the reference's three REST
  * fetchers (extract_bitcoin_prices.py:40-115). Each fetcher there
  * returns `dict | None` under a try/except with a 10 s timeout; here
  * each source returns `Try[BitcoinPrice]` and the ingest layer keeps
  * the same partial-failure tolerance (skip failed sources, abort when
  * all fail — extract_bitcoin_prices.py:150-177).
  *
  * Zero-egress environment → deterministic fixture implementations that
  * reproduce each API's quirks exactly (SURVEY §2.1, §7.1):
  *  - CoinCap derives EUR/BRL from USD with hardcoded FX (py:84-85) and
  *    parses string payloads to float (py:78,86-88);
  *  - Blockchain.info carries null market cap / volume / change
  *    (py:109-111) — the row that forces staging's COALESCE path.
  */
trait PriceSource {
  def name: String

  /** Fetch one quote. `extractedAt` is stamped by the caller because the
    * reference shares ONE timestamp per batch across all sources
    * (extract_bitcoin_prices.py:151) — a semantic that fixes the mart
    * grain cardinality. `tick` is the batch sequence number (the
    * Airflow hourly run index, dag.py:19); fixtures derive their
    * deterministic price curve from it. */
  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice]
}

/** Deterministic base price curve shared by the fixtures: a smooth
  * tick-indexed walk, so N pipeline runs produce a predictable mart. */
private[pipeline] object PriceCurve {
  def usd(tick: Long): Double = 50000.0 + 250.0 * (tick % 17) - 125.0 * (tick % 5)
}

/** CoinGecko-shaped source (reference extract_bitcoin_prices.py:40-67):
  * native numerics for all currencies plus market cap, volume, change. */
final class CoinGeckoFixture extends PriceSource {
  val name = "coingecko"
  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] = Try {
    val usd = PriceCurve.usd(tick)
    BitcoinPrice(name, "BTC",
      Some(usd), Some(usd * 0.92), Some(usd * 5.45),
      Some(usd * 19_700_000.0), Some(usd * 350_000.0),
      Some((tick % 11).toDouble - 5.0), extractedAt)
  }
}

/** CoinCap-shaped source (reference extract_bitcoin_prices.py:70-92):
  * the upstream payload is all strings, so this fixture round-trips
  * through String.toDouble (py:78,86-88), and EUR/BRL are *derived*
  * from USD with the reference's hardcoded FX rates (py:84-85). */
final class CoinCapFixture extends PriceSource {
  val name = "coincap"
  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] = Try {
    val priceStr = f"${PriceCurve.usd(tick) + 12.5}%.6f"
    val capStr = f"${PriceCurve.usd(tick) * 19_700_000.0}%.2f"
    val volStr = f"${PriceCurve.usd(tick) * 340_000.0}%.2f"
    val chgStr = f"${(tick % 7).toDouble - 3.0}%.4f"
    val usd = priceStr.toDouble
    BitcoinPrice(name, "BTC",
      Some(usd), Some(usd * 0.85), Some(usd * 5.50),
      Some(capStr.toDouble), Some(volStr.toDouble), Some(chgStr.toDouble),
      extractedAt)
  }
}

/** Blockchain.info-shaped source (reference
  * extract_bitcoin_prices.py:95-115): per-currency last prices only;
  * market cap, volume and 24h change are null (py:109-111). */
final class BlockchainInfoFixture extends PriceSource {
  val name = "blockchain_info"
  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] = Try {
    val usd = PriceCurve.usd(tick) - 7.25
    BitcoinPrice(name, "BTC",
      Some(usd), Some(usd * 0.915), Some(usd * 5.48),
      None, None, None, extractedAt)
  }
}

/** A source that always fails — exercises the skip-on-failure path
  * (reference extract_bitcoin_prices.py:65-67,153-172). */
final class FailingSource(val name: String = "down_api") extends PriceSource {
  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] =
    scala.util.Failure(new java.io.IOException(s"$name: connection refused"))
}

object PriceSource {
  /** The reference's source roster (extract_bitcoin_prices.py:153-172). */
  def fixtures: Seq[PriceSource] =
    Seq(new CoinGeckoFixture, new CoinCapFixture, new BlockchainInfoFixture)
}
