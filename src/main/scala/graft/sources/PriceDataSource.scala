package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.{PriceSource, Schemas}

/** DataSourceV2 connector for the price-quote sources — the "real
  * connector" mapping of the reference's three REST fetchers (SURVEY
  * §2.1 S1–S3; extract_bitcoin_prices.py:40-115). Usage:
  *
  *   spark.read.format("graft.sources.PriceDataSource")
  *     .option("ticks", "24")            // number of hourly batches
  *     .option("startEpochSec", "...")   // first batch timestamp
  *     .load()
  *
  * Connector layout mirrors how a production REST/Kafka source is
  * built on the DSV2 API: the driver plans one InputPartition PER
  * SOURCE (so fetches run in parallel across executors, each with its
  * own connection/session), and each partition's reader emits that
  * source's quote for every tick. Failed fetches are skipped by the
  * reader — the connector-level expression of the reference's
  * partial-failure tolerance (extract_bitcoin_prices.py:153-172).
  *
  * In this offline environment the fetchers are the deterministic
  * fixtures; swapping in HTTP-backed PriceSource impls changes nothing
  * in the connector.
  */
class PriceDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Schemas.rawSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PriceTable
}

class PriceTable extends Table with SupportsRead {
  override def name(): String = "graft_prices"
  override def schema(): StructType = Schemas.rawSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PriceScanBuilder(
      options.getLong("ticks", 1L),
      options.getLong("startEpochSec", 1735689600L), // 2025-01-01T00:00:00Z
      options.getLong("intervalSec", 3600L))
}

class PriceScanBuilder(ticks: Long, startEpochSec: Long, intervalSec: Long)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = Schemas.rawSchema
  override def toBatch: Batch = this

  /** One partition per source: parallel fetch, isolated failure. */
  override def planInputPartitions(): Array[InputPartition] =
    Array("coingecko", "coincap", "blockchain_info")
      .map(n => PricePartition(n, ticks, startEpochSec, intervalSec))
  override def createReaderFactory(): PartitionReaderFactory = new PriceReaderFactory
}

case class PricePartition(sourceName: String, ticks: Long,
                          startEpochSec: Long, intervalSec: Long) extends InputPartition

class PriceReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PricePartition]
    val source: PriceSource = p.sourceName match {
      case "coingecko" => new graft.pipeline.CoinGeckoFixture
      case "coincap" => new graft.pipeline.CoinCapFixture
      case "blockchain_info" => new graft.pipeline.BlockchainInfoFixture
      case other => new graft.pipeline.FailingSource(other)
    }
    new PartitionReader[InternalRow] {
      private var tick = -1L
      private var row: Schemas.BitcoinPrice = _

      override def next(): Boolean = {
        while (tick + 1 < p.ticks) {
          tick += 1
          val ts = new java.sql.Timestamp((p.startEpochSec + tick * p.intervalSec) * 1000L)
          source.fetch(ts, tick) match {
            case scala.util.Success(r) => row = r; return true
            case scala.util.Failure(_) => // skip-on-failure (py:153-172)
          }
        }
        false
      }

      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(row.source),
        UTF8String.fromString(row.symbol),
        row.price_usd.map(Double.box).orNull,
        row.price_eur.map(Double.box).orNull,
        row.price_brl.map(Double.box).orNull,
        row.market_cap_usd.map(Double.box).orNull,
        row.volume_24h_usd.map(Double.box).orNull,
        row.change_24h_pct.map(Double.box).orNull,
        row.extracted_at.getTime * 1000L) // micros since epoch

      override def close(): Unit = ()
    }
  }
}
