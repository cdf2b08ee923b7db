package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dependence

/** Invariant tests for the dependence/trend-structure kit (the DuckDB
  * oracles are the exact gate; these pin invariants that must hold at
  * ANY scale factor). */
class DependenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("lombScargle: top-k non-negative powers, sorted descending") {
    val rows = Dependence.lombScargle(spark, dir).collect()
    assert(rows.length == 5)
    val powers = rows.map(_.getAs[Double]("power"))
    assert(powers.forall(_ >= 0.0))
    assert(powers.sameElements(powers.sorted.reverse))
    assert(rows.map(_.getAs[Long]("n_days")).distinct.length == 1)
  }

  test("crossSpectrum: amplitude² = co² + quad² at each period") {
    val rows = Dependence.crossSpectrum(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val co = r.getAs[Double]("co_spectrum")
      val q = r.getAs[Double]("quadrature")
      val amp = r.getAs[Double]("amplitude")
      assert(math.abs(amp * amp - (co * co + q * q)) <
        2e-3 * math.max(1.0, amp * amp))
      val phase = r.getAs[Double]("phase")
      assert(phase >= -math.Pi - 1e-9 && phase <= math.Pi + 1e-9)
    }
  }

  test("piecewiseTrend: slope_change = slope_post - slope_pre, r2 in [0,1]") {
    val r = Dependence.piecewiseTrend(spark, dir).collect().head
    val pre = r.getAs[Double]("slope_pre")
    val post = r.getAs[Double]("slope_post")
    val chg = r.getAs[Double]("slope_change")
    assert(math.abs(chg - (post - pre)) < 2e-3)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    assert(r.getAs[Long]("knot") > 0L)
  }

  test("distanceCorr: dcor in [0,1], dvar symmetric bounds") {
    val r = Dependence.distanceCorr(spark, dir).collect().head
    val dcor = r.getAs[Double]("dcor")
    assert(dcor >= 0.0 && dcor <= 1.0 + 1e-9)
    assert(r.getAs[Double]("dvar_x") > 0.0)
    assert(r.getAs[Double]("dvar_y") > 0.0)
    // dCov² ≤ dVarX·dVarY (Cauchy-Schwarz for distance covariance)
    val dcov = r.getAs[Double]("dcov")
    assert(dcov * dcov <=
      r.getAs[Double]("dvar_x") * r.getAs[Double]("dvar_y") + 1e-6)
  }

  test("copulaFit: tau in (-1,1); theta/lambda consistent with tau") {
    val r = Dependence.copulaFit(spark, dir).collect().head
    val tau = r.getAs[Double]("tau")
    assert(tau > -1.0 && tau < 1.0)
    assert(math.abs(r.getAs[Double]("theta_gumbel") - 1.0 / (1.0 - tau)) <
      2e-3)
    if (tau > 0) {
      val lu = r.getAs[Double]("lambda_upper")
      val ll = r.getAs[Double]("lambda_lower")
      assert(lu > 0.0 && lu < 1.0)
      assert(ll > 0.0 && ll < 1.0)
    }
  }
}
