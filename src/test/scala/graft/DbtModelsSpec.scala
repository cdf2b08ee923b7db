package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.pipeline._

/** The dbt-model compiler: Jinja subset extraction, ref-graph
  * ordering, and end-to-end `dbt run` equivalence against the
  * hand-built Transform pipeline. */
class DbtModelsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-08-12 $h%02d:00:00")

  test("compile extracts config, refs, and renders relations") {
    val mart = DbtModels.compile(DbtModels.ReferenceModels(1),
      name => name, DbtModels.ReferenceSources)
    assert(mart.materialized === "table")
    assert(mart.refs === Seq("stg_bitcoin_prices"))
    assert(mart.sql.contains("FROM stg_bitcoin_prices"))
    assert(!mart.sql.contains("{{"))

    val stg = DbtModels.compile(DbtModels.ReferenceModels(0),
      name => name, DbtModels.ReferenceSources)
    assert(stg.refs === Seq.empty) // source relation, not a ref edge
    assert(stg.sql.contains("FROM bitcoin_prices"))
    assert(stg.sql.startsWith("SELECT")) // config block stripped
  }

  test("order runs upstream models first and rejects cycles") {
    val compiled = DbtModels.ReferenceModels
      .map(DbtModels.compile(_, identity, DbtModels.ReferenceSources))
    assert(DbtModels.order(compiled).map(_.name)
      === Seq("stg_bitcoin_prices", "fct_bitcoin_daily"))
    val a = DbtModels.Compiled("a", "SELECT 1", "view", Seq("b"))
    val b = DbtModels.Compiled("b", "SELECT 1", "view", Seq("a"))
    assertThrows[IllegalArgumentException](DbtModels.order(Seq(a, b)))
  }

  test("dbt run over the RAW model text equals the hand-built Transform") {
    val p = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    p.runOnce(Some(ts(1))); p.runOnce(Some(ts(2)))
    val wantMart = p.martScan.collect().toSet
    val wantStg = p.catalog.table(Transform.StgTable).collect().toSet

    // fresh warehouse: build ONLY via the compiled raw model text
    val p2 = new Pipeline(spark, TestSpark.tempDir("graft-wh"))
    // ingest without transforming (runOnce also transforms; that's
    // fine — dbt run below rebuilds both tables from raw)
    p2.runOnce(Some(ts(1))); p2.runOnce(Some(ts(2)))
    p2.catalog.table(Ingest.RawTable).createOrReplaceTempView("bitcoin_prices")
    val built = DbtModels.run(spark, p2.catalog, DbtModels.ReferenceModels,
      DbtModels.ReferenceSources)
    assert(built.keySet === Set("stg_bitcoin_prices", "fct_bitcoin_daily"))
    assert(p2.catalog.table(Transform.StgTable).collect().toSet === wantStg)
    assert(p2.catalog.table(Transform.FctTable).collect().toSet === wantMart)
    assert(wantMart.nonEmpty)
  }
}
