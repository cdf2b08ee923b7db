package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Schemas of the reference's three-table medallion lineage.
  *
  * The reference declares the raw schema twice — SQL DDL
  * (reference extract_bitcoin_prices.py:131-145) and a programmatic
  * StructType (extract_bitcoin_prices.py:180-190) — which must agree.
  * We keep the same dual declaration (case class for typed Datasets,
  * StructType for the generic layer) and assert agreement in tests.
  */
object Schemas {

  /** Raw row — extract_bitcoin_prices.py:132-142. All value columns
    * nullable (blockchain_info emits null market cap/volume/change,
    * extract_bitcoin_prices.py:109-111). Monetary values are DOUBLE,
    * not DECIMAL — deliberate reference semantic preserved for oracle
    * parity (SURVEY §1.3). */
  final case class BitcoinPrice(
      source: String,
      symbol: String,
      price_usd: Option[Double],
      price_eur: Option[Double],
      price_brl: Option[Double],
      market_cap_usd: Option[Double],
      volume_24h_usd: Option[Double],
      change_24h_pct: Option[Double],
      extracted_at: Timestamp)

  val rawSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("symbol", StringType),
    StructField("price_usd", DoubleType),
    StructField("price_eur", DoubleType),
    StructField("price_brl", DoubleType),
    StructField("market_cap_usd", DoubleType),
    StructField("volume_24h_usd", DoubleType),
    StructField("change_24h_pct", DoubleType),
    StructField("extracted_at", TimestampType)))

  /** Staging row — the stg_bitcoin_prices model (reference
    * README.md:370-384): renamed columns, COALESCE(_, 0) on the six
    * numeric measures, derived extraction_date. */
  final case class StgBitcoinPrice(
      data_source: String,
      crypto_symbol: String,
      price_usd: Double,
      price_eur: Double,
      price_brl: Double,
      market_cap_usd: Double,
      volume_24h_usd: Double,
      price_change_24h_pct: Double,
      extracted_at: Timestamp,
      extraction_date: java.sql.Date)

  /** Mart row — fct_bitcoin_daily (reference README.md:386-400):
    * grain (extraction_date, data_source, crypto_symbol). */
  final case class FctBitcoinDaily(
      extraction_date: java.sql.Date,
      data_source: String,
      crypto_symbol: String,
      min_price_usd: Double,
      max_price_usd: Double,
      avg_price_usd: Double,
      records: Long)
}
