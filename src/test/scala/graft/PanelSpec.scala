package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Panel

/** Invariant tests for the panel/causal/spatial kit. */
class PanelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("synthControl: pre+post partition the calendar, finite fit") {
    val r = Panel.synthControl(spark, dir).collect().head
    assert(r.getAs[Long]("n_pre") > 0L)
    assert(r.getAs[Long]("n_post") > 0L)
    assert(r.getAs[Double]("pre_rmse") >= 0.0)
    assert(!r.getAs[Double]("att").isNaN)
  }

  test("eventStudy: 13 relative months, k=-1 coefficient is zero") {
    val rows = Panel.eventStudy(spark, dir).collect()
    assert(rows.length == 13)
    assert(rows.map(_.getAs[Long]("rel_month")).toSeq ==
      (-6L to 6L).toSeq)
    val base = rows.find(_.getAs[Long]("rel_month") == -1L).get
    assert(math.abs(base.getAs[Double]("coef")) < 1e-9)
  }

  test("moransI: weight count matches same-region pairs, I >= -1") {
    val r = Panel.moransI(spark, dir).collect().head
    assert(r.getAs[Long]("n_nations") == 25L)
    // 5 regions × 5 nations each → Σ n_r(n_r−1) = 5·20 = 100
    assert(r.getAs[Long]("w_sum") == 100L)
    val i = r.getAs[Double]("morans_i")
    assert(i >= -1.0 - 1e-9 && i <= 1.0 + 1e-9)
    assert(math.abs(r.getAs[Double]("expected_i") - (-1.0 / 24)) < 1e-3)
  }

  test("fisherExact: p in [0,1], margins consistent") {
    val r = Panel.fisherExact(spark, dir).collect().head
    val p = r.getAs[Double]("p_one_sided")
    assert(p >= 0.0 && p <= 1.0 + 1e-9)
    assert(r.getAs[Long]("n_11") <= r.getAs[Long]("row1"))
    assert(r.getAs[Long]("n_11") <= r.getAs[Long]("col1"))
    assert(r.getAs[Long]("row1") <= r.getAs[Long]("total"))
    assert(r.getAs[Double]("odds_ratio") > 0.0)
  }

  test("hellingerDrift: BC in (0,1], H in [0,1), B = -ln BC") {
    val r = Panel.hellingerDrift(spark, dir).collect().head
    val bc = r.getAs[Double]("bc_coef")
    assert(bc > 0.0 && bc <= 1.0 + 1e-9)
    val h = r.getAs[Double]("hellinger")
    assert(h >= 0.0 && h < 1.0)
    assert(math.abs(r.getAs[Double]("bhattacharyya") - (-math.log(bc))) <
      2e-3)
  }
}
