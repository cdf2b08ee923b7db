package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Agreement

/** Invariant tests for the agreement/reliability kit (the DuckDB
  * oracles are the exact gate; these pin the mathematical invariants
  * that must hold at ANY scale factor). */
class AgreementSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("bartlettTest: non-negative statistic, correction factor > 1") {
    val r = Agreement.bartlettTest(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("k") == 5L)
    assert(r.head.getAs[Double]("chi2_stat") >= 0.0)
    assert(r.head.getAs[Double]("c_factor") > 1.0)
  }

  test("moodMedianTest: df = k-1, chi2 >= 0, median positive") {
    val r = Agreement.moodMedianTest(spark, dir).collect().head
    assert(r.getAs[Long]("df") == 4L)
    assert(r.getAs[Double]("chi2_stat") >= 0.0)
    assert(r.getAs[Long]("median") > 0L)
  }

  test("cochranQ: Q >= 0, column totals bounded by subject count") {
    val r = Agreement.cochranQ(spark, dir).collect().head
    val n = r.getAs[Long]("n_subjects")
    assert(r.getAs[Double]("q_stat") >= 0.0)
    Seq("n_urgent", "n_high", "n_complete").foreach { c =>
      val v = r.getAs[Long](c)
      assert(v >= 0L && v <= n)
    }
  }

  test("kendallW: W in [0,1], chi2 = m(n-1)W at 4dp") {
    val r = Agreement.kendallW(spark, dir).collect().head
    val w = r.getAs[Double]("w_stat")
    val n = r.getAs[Long]("n_items")
    assert(n == 12L)
    assert(w >= 0.0 && w <= 1.0 + 1e-9)
    assert(math.abs(r.getAs[Double]("chi2_stat") - 5.0 * (n - 1) * w) < 2e-3)
  }

  test("cronbachAlpha: alpha <= 1 and consistent with its variance parts") {
    val r = Agreement.cronbachAlpha(spark, dir).collect().head
    val alpha = r.getAs[Double]("alpha")
    val siv = r.getAs[Double]("sum_item_var")
    val tv = r.getAs[Double]("total_var")
    assert(alpha <= 1.0 + 1e-9)
    assert(siv > 0.0 && tv > 0.0)
    assert(math.abs(alpha - 1.25 * (1.0 - siv / tv)) < 2e-3)
  }

  test("iccOneWay: ICC(1) within (-1, 1], mean squares positive") {
    val r = Agreement.iccOneWay(spark, dir).collect().head
    assert(r.getAs[Long]("k_groups") == 25L)
    assert(r.getAs[Double]("msb") > 0.0)
    assert(r.getAs[Double]("msw") > 0.0)
    val icc = r.getAs[Double]("icc1")
    assert(icc > -1.0 && icc <= 1.0)
  }
}
