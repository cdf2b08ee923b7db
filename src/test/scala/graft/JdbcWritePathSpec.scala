package graft

import java.sql.{DriverManager, Timestamp}
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{DbtModels, Ingest, Pipeline, SqlEndpoint}

/** The dbt-over-Thrift WRITE path (SURVEY §3.2 entry point B,
  * profiles.yml:4-11 semantics): a JDBC client compiles the
  * reference's RAW model Jinja and materializes each `table` model by
  * executing DDL+CTAS over the wire against the served session —
  * exactly what `dbt run` does against the reference's Spark Thrift
  * endpoint. The resulting mart must equal the engine-built,
  * oracle-gated mart (q_pipeline_mart's computation) row for row.
  *
  * SqlEndpointSpec covers the read path (queries over JDBC); this
  * closes the write path: DDL routing, shared temp-view resolution of
  * the source relation inside a CTAS, cross-model refs where the
  * downstream model reads the table the wire just created. */
class JdbcWritePathSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("dbt-style CTAS over Hive JDBC builds the same mart as the engine") {
    // Fixture warehouse, 3 hourly ticks — the q_pipeline_mart shape.
    val p = new Pipeline(spark, TestSpark.tempDir("graft-jdbc-wh"))
    (1 to 3).foreach { h =>
      p.runOnce(Some(Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")))
    }
    val expected = p.martScan.collect()
      .map(r => (String.valueOf(r.get(r.fieldIndex("extraction_date"))),
        r.getAs[String]("data_source"), r.getAs[String]("crypto_symbol"),
        r.getAs[Double]("min_price_usd"), r.getAs[Double]("max_price_usd"),
        math.round(r.getAs[Double]("avg_price_usd") * 1e9),
        r.getAs[Long]("records"))).sortBy(t => (t._1, t._2, t._3))
    assert(expected.nonEmpty)

    // The profile's source relation: the raw layer served as a view
    // (shared with JDBC clients via singleSession).
    p.catalog.table(Ingest.RawTable).createOrReplaceTempView("bitcoin_prices")

    val dbLoc = TestSpark.tempDir("graft-jdbc-db")
    val port = TestSpark.endpointPort
    val server = SqlEndpoint.start(spark, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 40) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "anonymous", "")
        catch { case _: Exception => attempts += 1; Thread.sleep(500) }
      }
      assert(conn != null, "could not connect to the thrift endpoint")
      try {
        val st = conn.createStatement()
        st.execute(s"CREATE DATABASE IF NOT EXISTS jdbc_raw LOCATION '$dbLoc'")
        // Compile the RAW reference Jinja; refs resolve to the wire-
        // side schema, sources through the reference profile map.
        val compiled = DbtModels.order(DbtModels.ReferenceModels.map(
          DbtModels.compile(_, n => s"jdbc_raw.$n", DbtModels.ReferenceSources)))
        assert(compiled.map(_.name) ===
          Seq("stg_bitcoin_prices", "fct_bitcoin_daily"))
        compiled.foreach { c =>
          assert(c.materialized === "table") // both reference models pin it
          // dbt-spark full-refresh `table` materialization over Thrift
          st.execute(s"DROP TABLE IF EXISTS jdbc_raw.${c.name}")
          st.execute(s"CREATE TABLE jdbc_raw.${c.name} USING PARQUET AS ${c.sql}")
        }
        // singleSession: the owning session sees the wire-built tables.
        val got = spark.table("jdbc_raw.fct_bitcoin_daily").collect()
          .map(r => (String.valueOf(r.get(r.fieldIndex("extraction_date"))),
            r.getAs[String]("data_source"), r.getAs[String]("crypto_symbol"),
            r.getAs[Double]("min_price_usd"), r.getAs[Double]("max_price_usd"),
            math.round(r.getAs[Double]("avg_price_usd") * 1e9),
            r.getAs[Long]("records"))).sortBy(t => (t._1, t._2, t._3))
        assert(got === expected)
        // and the wire can read its own product back (dbt test stage)
        val rs = st.executeQuery(
          "SELECT COUNT(*) AS n FROM jdbc_raw.fct_bitcoin_daily")
        assert(rs.next() && rs.getLong(1) === expected.length.toLong)
        st.execute("DROP DATABASE IF EXISTS jdbc_raw CASCADE")
      } finally conn.close()
    } finally server.stop()
  }
}
