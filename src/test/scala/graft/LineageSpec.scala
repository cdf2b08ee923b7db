package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Joins, Relational}
import graft.plans.Lineage

/** Column-level lineage over real registry queries: every output
  * column must trace to exactly the source-table leaves it derives
  * from (derivation semantics — predicate columns don't count). */
class LineageSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("star revenue: measures trace to lineitem, dims to their tables") {
    val l = Lineage.columns(Joins.starRevenue(spark, dir))
    assert(l("revenue") === Set("lineitem" -> "l_extendedprice",
      "lineitem" -> "l_discount"))
    assert(l("region_name") === Set("region" -> "r_name"))
    assert(l("nation_name") === Set("nation" -> "n_name"))
    assert(l("n_items") === Set.empty)
  }

  test("fact-fact join: segment revenue spans three tables correctly") {
    val l = Lineage.columns(Joins.segmentRevenue(spark, dir))
    assert(l("segment") === Set("customer" -> "c_mktsegment"))
    assert(l("order_year") === Set("orders" -> "o_orderdate"))
    assert(l("revenue") === Set("lineitem" -> "l_extendedprice",
      "lineitem" -> "l_discount"))
  }

  test("windows and scalar chains propagate through") {
    val l = Lineage.columns(Relational.giniRevenue(spark, dir))
    // gini derives from the spend (orders) and the rank, which itself
    // orders by spend + custkey
    assert(l("gini").contains("orders" -> "o_totalprice"))
    assert(l("segment") === Set("customer" -> "c_mktsegment"))
  }

  test("lineage extraction covers the whole registry without throwing") {
    // fixture-building entries do real work at construction (warehouse
    // ticks, MV builds, stream fixtures) — lineage only needs ANALYSIS,
    // so restrict the sweep to the direct-query majority
    val skip = Set("q_pipeline_mart", "q_pipeline_snapshots",
      "q_pipeline_asof", "q_pipeline_incmart", "q_pipeline_dbtrun",
      "q_mv_rewrite", "q_mv_rewrite_inc", "q_stream_dedup",
      "q_stream_enrich", "q_stream_join", "q_stream_stateful",
      "q_stream_docdedup", "q_windowed_counts", "q_sliding_counts",
      "q_session_window", "q_format_roundtrip", "q_zorder",
      "q_dq_checks")
    val names = SparkEntry.queries.keys.filterNot(skip).toSeq.sorted
    var covered = 0
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val l = Lineage.columns(df)
      assert(l.keySet === df.columns.toSet, s"$n: lineage keys != columns")
      if (l.values.exists(_.nonEmpty)) covered += 1
    }
    // the overwhelming majority of queries must trace at least one
    // column to a real source leaf
    assert(covered >= names.size * 9 / 10, s"only $covered/${names.size} traced")
  }

  test("deeply nested aliases and unions stay linear (single traversal)") {
    import org.apache.spark.sql.functions.col
    // Spark wraps every view in SubqueryAlias; a per-node child re-walk
    // doubles work at each level — 2^34 visits here would hang
    var df = spark.range(3).toDF("id").select(col("id").as("x"))
    for (i <- 1 to 30) df = df.alias(s"a$i")
    val u = df.union(df).alias("u1").union(df.alias("u2")).alias("u3")
    val t0 = System.nanoTime()
    val l = Lineage.columns(u)
    assert((System.nanoTime() - t0) < 30e9, "lineage walk not linear")
    assert(l("x").nonEmpty)
  }

  test("PII audit use: no output of the daily mart touches c_name") {
    val l = Lineage.columns(Relational.dailyMart(spark, dir))
    assert(l.values.flatten.forall { case (_, c) => c != "c_name" })
    assert(l("avg_value") === Set("events" -> "value"))
    assert(l("event_date") === Set("events" -> "ts"))
  }
}
