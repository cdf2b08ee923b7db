package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Survival

/** Survival kit semantics: a hand-computed Kaplan-Meier / Nelson-Aalen
  * life table on a crafted censoring fixture, plus invariants of the
  * log-rank statistic on the real sf0.001 tables. */
class SurvivalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // study end = 2026-12-31 (c4's last order). ChurnGapDays = 180:
  //   c1 first 01-01 last 01-11 -> event, t=10
  //   c2 first 01-01 last 01-21 -> event, t=20
  //   c3 first 01-01 last 01-11 -> event, t=10
  //   c4 first 01-01 last 12-31 -> censored, t=364
  //   c5 first 06-01 last 12-01 -> 30 d inactive -> censored, t=213
  // KM: t=10 n=5 d=2 S=0.6; t=20 n=3 d=1 S=0.6*(2/3)=0.4
  // NA: H=0.4 then 0.7333; var=0.08 then 0.1911
  private lazy val dir = TestSpark.ordersFixture(Seq(
    (1L, "2026-01-01"), (1L, "2026-01-11"),
    (2L, "2026-01-01"), (2L, "2026-01-21"),
    (3L, "2026-01-01"), (3L, "2026-01-11"),
    (4L, "2026-01-01"), (4L, "2026-12-31"),
    (5L, "2026-06-01"), (5L, "2026-12-01")))

  test("kaplanMeier matches the hand-computed life table") {
    val rows = Survival.kaplanMeier(spark, dir).collect()
      .map(r => (r.getAs[Int]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Double]("s_km")))
    assert(rows.toSeq === Seq((10, 5L, 2L, 0.6), (20, 3L, 1L, 0.4)))
  }

  test("nelsonAalen cumulative hazard and variance") {
    val rows = Survival.nelsonAalen(spark, dir).collect()
      .map(r => (r.getAs[Int]("t"), r.getAs[Double]("h_na"),
        r.getAs[Double]("var_na")))
    assert(rows.toSeq === Seq((10, 0.4, 0.08), (20, 0.7333, 0.1911)))
  }

  test("KM hits exactly 0 when d == n at the last event time") {
    // c2's single order ON the study end date makes it censored with
    // duration 0, so c1's event at t=151 has n_risk = d = 1 — the
    // zero-guard path (Spark's non-ANSI log(0) would return NULL;
    // the cumulative hit_zero flag must pin S to exactly 0.0).
    val z = TestSpark.ordersFixture(Seq(
      (1L, "2025-01-01"), (1L, "2025-06-01"),
      (2L, "2026-01-01")))
    val rows = Survival.kaplanMeier(spark, z).collect()
      .map(r => (r.getAs[Int]("t"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Double]("s_km")))
    assert(rows.toSeq === Seq((151, 1L, 1L, 0.0)))
  }

  test("survivalSummary: RMST area and median from the fixture KM") {
    // KM steps: S=1 on [0,10), 0.6 on [10,20), 0.4 on [20,365)
    // RMST(365) = 10 + 0.6*10 + 0.4*345 = 154; median = 20 (S <= 0.5)
    val r = graft.operators.Survival.survivalSummary(spark, dir).head()
    assert(r.getAs[Int]("tau") === 365)
    assert(r.getAs[Double]("rmst") === 154.0)
    assert(r.getAs[Int]("median_t") === 20)
  }

  test("weibullFit: shape/scale/R2 sane on the real curve; exact on " +
      "a crafted Weibull") {
    val r = graft.operators.Survival.weibullFit(spark,
      "/root/testdata/sf0.01").head()
    assert(r.getAs[Long]("n_points") > 100)
    assert(r.getAs[Double]("shape") > 0)
    assert(r.getAs[Double]("scale_days") > 0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 > 0.5 && r2 <= 1.0)
  }

  test("logRank invariants on sf0.001") {
    val r = Survival.logRank(spark, TestSpark.sfDir).head()
    assert(r.getAs[Long]("n_times") > 0)
    assert(r.getAs[Double]("v") > 0.0)
    assert(r.getAs[Double]("chi2") >= 0.0)
    // group-1 observed events cannot exceed total events
    val totalEvents = Survival.durations(spark, TestSpark.sfDir)
      .agg(org.apache.spark.sql.functions.sum("event")).head().getLong(0)
    assert(r.getAs[Double]("o1") <= totalEvents.toDouble)
  }
}
