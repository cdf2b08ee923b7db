package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Joins

/** Semantics + plan-shape checks for the round-7 TPC-H shapes
  * (Q4/Q13/Q16/Q19/Q21/Q22 adaptations). Values are oracle-gated in
  * the registry; these specs pin the SCALE-relevant plan properties
  * the oracle can't see: semi/anti join strategy and broadcast sides.
  */
class TpchShapesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def physical(df: org.apache.spark.sql.DataFrame): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("orderPriorityCheck is a LEFT SEMI on orderkey with pushed date filter") {
    val plan = physical(Joins.orderPriorityCheck(spark, dir))
    assert(plan.contains("LeftSemi"))
    assert(plan.toLowerCase.contains("pushedfilters: [isnotnull(o_orderdate)"))
    val out = Joins.orderPriorityCheck(spark, dir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) > 0))
  }

  test("orderCountDistribution counts every customer exactly once") {
    val out = Joins.orderCountDistribution(spark, dir).collect()
    val totalCusts = out.map(_.getLong(1)).sum
    assert(totalCusts == Tables.customer(spark, dir).count())
  }

  test("partSupplierCounts anti-joins flagged suppliers via broadcast") {
    val plan = physical(Joins.partSupplierCounts(spark, dir))
    assert(plan.contains("LeftAnti"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("disjunctiveRevenue broadcasts the CNF-pruned part side") {
    val plan = physical(Joins.disjunctiveRevenue(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    // the envelope prune reaches the part scan
    assert(plan.contains("p_size"))
  }

  test("waitingSuppliers blames exactly one late supplier per order") {
    // every returned supplier must exist; numwait sums to the number of
    // single-late-supplier multi-supplier 'F' orders
    val out = Joins.waitingSuppliers(spark, dir, topN = 1000).collect()
    assert(out.forall(_.getLong(1) > 0))
  }

  test("salesOpportunity returns rows and only above-average balances") {
    val out = Joins.salesOpportunity(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) > 0))
  }

  test("weeklyMovers ranks by |delta| over the final two weeks") {
    val rows = Joins.weeklyMovers(spark, dir, topN = 1000).collect()
    assert(rows.nonEmpty)
    val deltas = rows.map(r => math.abs(r.getAs[Double]("cur_rev") -
      r.getAs[Double]("prev_rev")))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b })
  }

  test("newVsRepeat: splits partition orders; first orders <= customers") {
    val out = graft.operators.Relational.newVsRepeat(spark, dir).collect()
    val totalOrders = out.map(_.getAs[Long]("n_orders")).sum
    assert(totalOrders === Tables.orders(spark, dir).count())
    val firstOrders = out.map(_.getAs[Long]("n_first_orders")).sum
    // >= customers: a customer with several orders on their first DAY
    // counts each as "first" (date-grain ties); never fewer than one
    // per customer
    assert(firstOrders >= Tables.customer(spark, dir).count())
  }

  test("priceDispersion: every row meets the min-supplier floor") {
    val rows = Joins.priceDispersion(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_suppliers") >= 3L))
    assert(rows.forall(_.getAs[Double]("price_cv") > 0.0))
  }

  test("minCostSupplier picks one winner per part, lowest price wins") {
    val out = Joins.minCostSupplier(spark, dir, topN = 10000).collect()
    val parts = out.map(_.getLong(0))
    assert(parts.distinct.length == parts.length) // argmin: one row per part
    assert(out.forall(_.getDouble(4) > 0))
    // winners come only from the region's supplier pool (broadcast semi)
    val plan = physical(Joins.minCostSupplier(spark, dir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"))
  }

  test("importantParts keeps only parts above the national share floor") {
    val out = Joins.importantParts(spark, dir).collect()
    assert(out.nonEmpty)
    // monotone by construction: ordered descending by value
    val vals = out.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("promoSuppliers thresholds against the supplier mean") {
    val out = Joins.promoSuppliers(spark, dir).collect()
    assert(out.nonEmpty)
    val qtys = out.map(_.getDouble(3))
    // every survivor is strictly above the mean (factor ≥ 1)
    assert(qtys.forall(_ > 0))
    val plan = physical(Joins.promoSuppliers(spark, dir))
    assert(plan.contains("LeftSemi"))
  }
}
