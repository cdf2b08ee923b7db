package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ControlCharts

/** SPC chart semantics on hand-computed fixtures: the K-truncated
  * EWMA closed form must match the textbook recursion exactly while
  * r ≤ K, and the p / X-MR limits are pinned to hand arithmetic. */
class ControlChartsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("ewmaChart matches the recursive EWMA and its limits") {
    // daily counts x = 2, 1, 3 -> mu = 2, var = 2/3
    // recursion z0=2: z = 2.0, 1.8, 2.04
    val dir = TestSpark.ordersFixture(Seq(
      (1L, "2026-01-01"), (2L, "2026-01-01"),
      (3L, "2026-01-02"),
      (4L, "2026-01-03"), (5L, "2026-01-03"), (6L, "2026-01-03")))
    val rows = ControlCharts.ewmaChart(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("x")).toSeq === Seq(2L, 1L, 3L))
    assert(rows.map(_.getAs[Double]("z")).toSeq === Seq(2.0, 1.8, 2.04))
    // limits at r=1: 2 +- 3*sqrt((2/3)*(0.2/1.8)*(1-0.64)) = 2 +- 0.4899
    assert(rows.head.getAs[Double]("lcl") === 1.5101)
    assert(rows.head.getAs[Double]("ucl") === 2.4899)
    assert(rows.forall(_.getAs[Int]("breach") === 0))
  }

  test("pChart limits and proportions") {
    // day1: 4 events 1 error; day2: 4 events 3 errors
    // pbar = 0.5, halfw = 3*sqrt(0.25/4) = 0.75 -> lcl 0, ucl 1.25
    def ns(sec: Long) = sec * 1000000000L
    val day = 86400L
    val dir = TestSpark.eventsFixture(Seq(
      (1L, 1L, "error", 0.0, ns(10)),
      (2L, 1L, "view", 0.0, ns(20)),
      (3L, 1L, "view", 0.0, ns(30)),
      (4L, 1L, "view", 0.0, ns(40)),
      (5L, 2L, "error", 0.0, ns(day + 10)),
      (6L, 2L, "error", 0.0, ns(day + 20)),
      (7L, 2L, "error", 0.0, ns(day + 30)),
      (8L, 2L, "view", 0.0, ns(day + 40))))
    val rows = ControlCharts.pChart(spark, dir).collect()
    assert(rows.map(r => (r.getAs[Long]("n"), r.getAs[Long]("bad"),
      r.getAs[Double]("p"), r.getAs[Double]("lcl"),
      r.getAs[Double]("ucl"), r.getAs[Int]("breach"))).toSeq ===
      Seq((4L, 1L, 0.25, 0.0, 1.25, 0), (4L, 3L, 0.75, 0.0, 1.25, 0)))
  }

  test("xmrChart moving ranges and limits") {
    // fixture orders are 100.0 each: x = 100, 300, 200
    // mr = null, 200, 100 -> mrbar = 150; xbar = 200 -> 200 +- 399
    val dir = TestSpark.ordersFixture(Seq(
      (1L, "2026-01-01"),
      (2L, "2026-01-02"), (3L, "2026-01-02"), (4L, "2026-01-02"),
      (5L, "2026-01-03"), (6L, "2026-01-03")))
    val rows = ControlCharts.xmrChart(spark, dir).collect()
    assert(rows.map(_.getAs[Double]("x")).toSeq === Seq(100.0, 300.0, 200.0))
    assert(rows(0).isNullAt(rows(0).fieldIndex("mr")))
    assert(rows(1).getAs[Double]("mr") === 200.0)
    assert(rows(2).getAs[Double]("mr") === 100.0)
    assert(rows.last.getAs[Double]("lcl") === -199.0)
    assert(rows.last.getAs[Double]("ucl") === 599.0)
    assert(rows.forall(_.getAs[Int]("breach") === 0))
  }

  test("erlangC: wait probability falls as agents rise, rho < 1") {
    val rows = graft.operators.Inventory.erlangC(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho > 0.0 && rho < 1.0)
      val pw = r.getAs[Double]("p_wait")
      assert(pw >= 0.0 && pw <= 1.0 + 1e-9)
      assert(r.getAs[Double]("asa_hours") >= 0.0)
    }
    val pws = rows.sortBy(_.getAs[Long]("agents")).map(_.getAs[Double]("p_wait"))
    assert(pws.zip(pws.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("processCapability: Cpk <= Cp, spec share consistent") {
    val rows = graft.operators.ControlCharts.processCapability(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cpk") <= r.getAs[Double]("cp") + 1e-9)
      assert(r.getAs[Double]("cp") > 0.0)
      val p = r.getAs[Double]("pct_out_of_spec")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
