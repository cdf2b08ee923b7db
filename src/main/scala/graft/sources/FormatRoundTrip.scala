package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Source/sink format coverage: write the events table to each
  * text/binary format Spark ships (CSV, JSON lines, ORC — parquet is
  * the primary path exercised everywhere else), read it back, and
  * aggregate each round-tripped copy. Identical aggregates across
  * formats — checked against the DuckDB oracle computed straight from
  * the parquet — prove the sinks and sources are lossless, including
  * microsecond timestamps (explicit timestampFormat on the text
  * formats; Java shortest-round-trip doubles in CSV/JSON).
  *
  * Scale posture: writes are parallel per-partition (one file per
  * task, no driver funnel); reads carry an explicit schema so the text
  * formats skip the sampling inference pass a 100 TB read can't
  * afford.
  */
object FormatRoundTrip {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def roundTripProfile(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt")
    try {
      val profiles = Seq("csv", "json", "orc").map { fmt =>
        val path = s"$tmp/$fmt"
        val w: DataFrameWriter[Row] = events.write.mode("overwrite").format(fmt)
          .option("timestampFormat", TsFmt)
        (if (fmt == "csv") w.option("header", "true") else w).save(path)
        val r: DataFrameReader = s.read.format(fmt)
          .schema(events.schema).option("timestampFormat", TsFmt)
        val back = (if (fmt == "csv") r.option("header", "true") else r).load(path)
        back.agg(
            count(lit(1)).as("n_rows"),
            count_distinct(col("user_id")).as("n_users"),
            // integer checksum (floor-cents): exact under any summation
            // order, unlike a global float sum rounded at 4 decimals
            sum(floor(col("value") * 100).cast("long")).as("sum_value_c"),
            min(unix_micros(col("ts"))).as("min_ts_us"),
            max(unix_micros(col("ts"))).as("max_ts_us"))
          .select(lit(fmt).as("format"), col("n_rows"), col("n_users"),
            col("sum_value_c"), col("min_ts_us"), col("max_ts_us"))
      }.reduce(_.unionByName(_))
      // materialize before deleting the round-trip files (the tiny
      // 3-row profile is what callers consume, lazily)
      val rows = profiles.collect().toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), profiles.schema)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
  }
}
