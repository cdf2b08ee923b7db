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

  test("PII audit use: no output of the daily mart touches c_name") {
    val l = Lineage.columns(Relational.dailyMart(spark, dir))
    assert(l.values.flatten.forall { case (_, c) => c != "c_name" })
    assert(l("avg_value") === Set("events" -> "value"))
    assert(l("event_date") === Set("events" -> "ts"))
  }
}
