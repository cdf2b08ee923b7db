package graft.pipeline

import java.sql.Timestamp
import scala.util.Try
import com.fasterxml.jackson.databind.JsonNode
import Schemas.BitcoinPrice

/** LIVE HTTP price sources — the reference's three REST fetchers
  * (extract_bitcoin_prices.py:40-115) with their exact semantics:
  * 10 s timeout, raise-for-status, and each API's parse quirks
  * (CoinGecko native numerics via dict.get → nullable; CoinCap string
  * payloads through float() with 0 defaults and hardcoded EUR/BRL FX;
  * Blockchain.info per-currency `last` with null cap/volume/change).
  * Any failure — network, status, missing key — surfaces as
  * `Failure`, which the ingest layer's skip-on-failure tolerance
  * handles exactly like the reference (py:150-177): failed sources
  * skipped, all-failed batch aborted.
  *
  * The engine defaults to the deterministic fixtures
  * ([[PriceSource.fixtures]]) because this build environment has no
  * egress — an offline run of the live roster is simply the
  * "all sources down" path. Parsing is factored into `parsePayload`
  * so the payload → row mapping is spec-tested against canned JSON
  * regardless of connectivity. */
private[graft] object Http {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** GET url → parsed JSON; non-2xx raises (requests.raise_for_status). */
  def getJson(url: String, timeoutMs: Int): JsonNode = {
    val client = java.net.http.HttpClient.newBuilder()
      // requests follows redirects (CoinCap 301s to its new host);
      // java.net.http defaults to NEVER
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
    mapper.readTree(resp.body())
  }

  def parse(json: String): JsonNode = mapper.readTree(json)
}

/** CoinGecko live (py:40-67): nullable native numerics via .get(). */
final class CoinGeckoLive(timeoutMs: Int = 10000,
                          urlOverride: Option[String] = None) extends PriceSource {
  val name = "coingecko"
  private val url = urlOverride.getOrElse(
    "https://api.coingecko.com/api/v3/simple/price" +
    "?ids=bitcoin&vs_currencies=usd,eur,brl" +
    "&include_market_cap=true&include_24hr_vol=true&include_24hr_change=true")

  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] =
    Try(parsePayload(Http.getJson(url, timeoutMs), extractedAt))

  private[graft] def parsePayload(root: JsonNode, ts: Timestamp): BitcoinPrice = {
    val d = root.get("bitcoin") // KeyError → NPE → Failure, like py
    def opt(k: String): Option[Double] =
      Option(d.get(k)).filterNot(_.isNull).map(_.asDouble)
    BitcoinPrice(name, "BTC", opt("usd"), opt("eur"), opt("brl"),
      opt("usd_market_cap"), opt("usd_24h_vol"), opt("usd_24h_change"), ts)
  }
}

/** CoinCap live (py:70-92): string payloads through float() with 0
  * defaults; EUR/BRL derived from USD with hardcoded FX. */
final class CoinCapLive(timeoutMs: Int = 10000,
                        urlOverride: Option[String] = None) extends PriceSource {
  val name = "coincap"
  private val url = urlOverride.getOrElse("https://api.coincap.io/v2/assets/bitcoin")

  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] =
    Try(parsePayload(Http.getJson(url, timeoutMs), extractedAt))

  private[graft] def parsePayload(root: JsonNode, ts: Timestamp): BitcoinPrice = {
    val d = root.get("data")
    // float(data.get(k, 0)): MISSING key → 0.0 default, but a key
    // PRESENT with null raises in Python (float(None) TypeError) and
    // must fail the source here too, not fabricate a 0.0 price
    def num(k: String): Double = d.get(k) match {
      case null => 0.0
      case n if n.isNull =>
        throw new IllegalArgumentException(s"$k is null (float(None) raises)")
      case n => n.asText.toDouble
    }
    val usd = num("priceUsd")
    BitcoinPrice(name, "BTC", Some(usd), Some(usd * 0.85), Some(usd * 5.50),
      Some(num("marketCapUsd")), Some(num("volumeUsd24Hr")),
      Some(num("changePercent24Hr")), ts)
  }
}

/** Blockchain.info live (py:95-115): per-currency `last`; market cap,
  * volume and change are ALWAYS null — the COALESCE-forcing rows. */
final class BlockchainInfoLive(timeoutMs: Int = 10000,
                               urlOverride: Option[String] = None) extends PriceSource {
  val name = "blockchain_info"
  private val url = urlOverride.getOrElse("https://blockchain.info/ticker")

  def fetch(extractedAt: Timestamp, tick: Long): Try[BitcoinPrice] =
    Try(parsePayload(Http.getJson(url, timeoutMs), extractedAt))

  private[graft] def parsePayload(root: JsonNode, ts: Timestamp): BitcoinPrice = {
    def last(ccy: String): Double = root.get(ccy).get("last").asDouble // missing → NPE → Failure
    BitcoinPrice(name, "BTC",
      Some(last("USD")), Some(last("EUR")), Some(last("BRL")),
      None, None, None, ts)
  }
}

object LiveSources {
  /** The reference's live roster (py:153-172). Offline this degrades
    * to the all-failed abort path by construction. `urlOverride`
    * points every source at one test endpoint (e.g. an unroutable
    * localhost port) so the degradation path is testable
    * deterministically, with or without egress. */
  def all(timeoutMs: Int = 10000,
          urlOverride: Option[String] = None): Seq[PriceSource] = Seq(
    new CoinGeckoLive(timeoutMs, urlOverride),
    new CoinCapLive(timeoutMs, urlOverride),
    new BlockchainInfoLive(timeoutMs, urlOverride))
}
