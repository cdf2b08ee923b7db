package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema
  * (see /root/repo/TESTDATA.md and FIXTURES.md §B).
  *
  * All queries read parquet directly so Catalyst's vectorized parquet
  * scan, column pruning and predicate pushdown apply. At 100 TB these
  * would be catalog tables / Iceberg scans; the shape of every
  * downstream plan (scan → prune → push) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events table's `ts` physical type has varied across testdata
    * generations — TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects; the legacy conf surfaces it as a raw nanos LONG) and
    * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ). Normalize both to a session-zone TimestampType so
    * every downstream query sees one stable type. The nanos→micros
    * conversion is exact integer math (`div`, not double division,
    * which would lose precision on ~1.7e18 ns epochs) and lossless for
    * this data (no sub-microsecond components at any sf); the NTZ cast
    * is value-preserving under the engine's pinned UTC session zone. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already a session-zone timestamp
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")

  /** Defensive-normalization philosophy: the DuckDB oracle recomputes
    * every gate from the RAW parquet, so queries should follow the
    * file's types the way the oracle does — pinning types here could
    * manufacture Spark-vs-oracle drift. The exceptions are columns a
    * native kernel hard-requires: `embedding` must be array<float>
    * (SortedLongJaccard-style vector kernels and VecAggregates resolve
    * on FloatType); a testdata regeneration that widens it to
    * list<double> would otherwise fail analysis for the whole
    * similarity family — the same failure mode that broke all 51
    * events queries when `ts` changed physical type (see [[events]]). */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val raw = load(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(_, _) =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case _ => raw
    }
  }

  /** Register every table as a temp view (used by tests / ad-hoc SQL).
    * `events` goes through the nanos→micros conversion above so SQL
    * users see a real TimestampType ts. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      // route through the per-table loaders so SQL users get the same
      // normalizations (events ts flavor, embeddings element type) as
      // DataFrame callers — a raw load here would reintroduce the
      // type-drift failure mode for the view path only
      val df = n match {
        case "events" => events(spark, dir)
        case "embeddings" => embeddings(spark, dir)
        case _ => load(spark, dir, n)
      }
      df.createOrReplaceTempView(n)
    }
}
