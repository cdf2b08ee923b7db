package graft.operators

import graft.Caching.CachingOps
import graft.Tables
import graft.functions.Rounding.{round4eps, round6eps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beyond-linear dependence and trend-structure kit: Lomb-Scargle
  * periodogram for IRREGULARLY sampled series, cross-spectrum between
  * two aligned series, piecewise-linear (broken-stick) trend fit,
  * distance correlation, and copula tail-dependence fits — the
  * dependence screens a metrics pipeline runs when Pearson/Spearman
  * (already gated) are known to miss nonlinear or tail structure.
  *
  * Scale shape (whole file): every series here is the CALENDAR-
  * collAPSED daily frame (days grow with the calendar, never with the
  * corpus — replication adds rows per day, not days), so the pair
  * walks (distanceCorr, copulaFit: days² ≈ 5.8M pairs at 6.6 years)
  * and the ×59 period sweeps (lombScargle) are bounded constants at
  * any corpus size — the same contract as the gated siegelSlope /
  * periodogram family. The fact scan is the only data-scaled term and
  * it is one map-side-combined aggregation.
  *
  * Cross-engine parity: daily values are round4eps-quantized, trig
  * values round6eps-quantized with arguments reduced mod the period
  * BEFORE cos/sin, and derived angles (atan2 outputs) re-quantized
  * before feeding further trig — the established libm-parity
  * discipline (see Stats.periodogramTop). */
object Dependence {

  /** The calendar-collapsed (t, x, y) daily frame: day index from the
    * first day, revenue in millions and order count in thousands —
    * both quantized so each engine aggregates identical doubles. */
  private def dailyXY(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("x"),
        (count(lit(1)) / lit(1000.0)).as("y"))
    val base = daily.agg(min(col("d")).as("d0"))
    daily.crossJoin(broadcast(base))
      .select(datediff(col("d"), col("d0")).cast("double").as("t"),
        col("x"), col("y"))
  }

  /** Lomb-Scargle periodogram of an irregularly sampled series — the
    * daily revenue of URGENT-priority orders on the days that have
    * any (a genuinely gappy time grid, where the plain DFT
    * periodogram's implicit regular-sampling assumption breaks).
    * Implements the classic Scargle form with the per-frequency τ
    * phase shift: tan(2ωτ) = Σsin2ωt / Σcos2ωt, then
    * P(ω) = ½[ (Σỹ·cosω(t−τ))²/Σcos²ω(t−τ)
    *         + (Σỹ·sinω(t−τ))²/Σsin²ω(t−τ) ].
    * Reports the top-k candidate periods by power.
    *
    * Scale shape: one fact-scan aggregation to the gappy daily frame,
    * then a ×59 period explode of that calendar-bounded frame, two
    * group-by-period passes (τ, then power) — all map-side combined;
    * the τ frame (59 rows) broadcasts back. Flat at 100×. */
  def lombScargle(s: SparkSession, dir: String, maxP: Int = 60,
      topK: Int = 5): DataFrame = {
    val daily = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("y"))
      .persistMemDisk
    val base = daily.agg(min(col("d")).as("d0"),
      round4eps(avg(col("y"))).as("mu"),
      count(lit(1)).as("n_days"))
    val wp = daily.crossJoin(broadcast(base))
      .withColumn("t", datediff(col("d"), col("d0")))
      .withColumn("p", explode(sequence(lit(2), lit(maxP))))
      // args reduced mod p before trig; 2ωt reduces via (2t) mod p
      .withColumn("ct", round6eps(cos(lit(2.0 * math.Pi) *
        (col("t") % col("p")) / col("p").cast("double"))))
      .withColumn("st", round6eps(sin(lit(2.0 * math.Pi) *
        (col("t") % col("p")) / col("p").cast("double"))))
      .withColumn("c2", round6eps(cos(lit(2.0 * math.Pi) *
        ((col("t") * 2) % col("p")) / col("p").cast("double"))))
      .withColumn("s2", round6eps(sin(lit(2.0 * math.Pi) *
        ((col("t") * 2) % col("p")) / col("p").cast("double"))))
      .persistMemDisk
    val tau = wp.groupBy(col("p"))
      .agg(sum(col("s2")).as("ss2"), sum(col("c2")).as("sc2"))
      .select(col("p"),
        round6eps(atan2(col("ss2"), col("sc2")) / lit(2.0)).as("a"))
      .select(col("p"), round6eps(cos(col("a"))).as("ctau"),
        round6eps(sin(col("a"))).as("stau"))
    val proj = wp.join(broadcast(tau), "p")
      .select(col("p"), (col("y") - col("mu")).as("yc"),
        col("n_days"),
        (col("ct") * col("ctau") + col("st") * col("stau")).as("cc"),
        (col("st") * col("ctau") - col("ct") * col("stau")).as("ss"))
    proj.groupBy(col("p"))
      .agg(max(col("n_days")).as("n_days"),
        sum(col("yc") * col("cc")).as("yc_c"),
        sum(col("yc") * col("ss")).as("yc_s"),
        sum(col("cc") * col("cc")).as("cd"),
        sum(col("ss") * col("ss")).as("sd"))
      .select(col("p").cast("long").as("period"), col("n_days"),
        round4eps(lit(0.5) * (
          when(col("cd") > 0, col("yc_c") * col("yc_c") / col("cd"))
            .otherwise(lit(0.0)) +
          when(col("sd") > 0, col("yc_s") * col("yc_s") / col("sd"))
            .otherwise(lit(0.0)))).as("power"))
      .orderBy(col("power").desc, col("period"))
      .limit(topK)
  }

  /** Cross-periodogram between daily revenue and daily order count at
    * the canonical calendar periods (7/14/30/60/90 days): co-spectrum,
    * quadrature spectrum, cross-amplitude and phase — "do the two
    * series share a cycle, and who leads". (Single-taper squared
    * coherence is identically 1, so it is deliberately not reported.)
    *
    * Scale shape: one fact-scan aggregation to the daily frame, a ×5
    * period explode, one group-by-period moment pass. Flat at 100×. */
  def crossSpectrum(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyXY(s, dir).persistMemDisk
    val base = daily.agg(round4eps(avg(col("x"))).as("mux"),
      round4eps(avg(col("y"))).as("muy"))
    val wp = daily.crossJoin(broadcast(base))
      .withColumn("p", explode(array(Seq(7, 14, 30, 60, 90)
        .map(lit): _*)))
      .withColumn("ct", round6eps(cos(lit(2.0 * math.Pi) *
        (col("t") % col("p")) / col("p").cast("double"))))
      .withColumn("st", round6eps(sin(lit(2.0 * math.Pi) *
        (col("t") % col("p")) / col("p").cast("double"))))
    wp.groupBy(col("p"))
      .agg(sum((col("x") - col("mux")) * col("ct")).as("ax"),
        sum((col("x") - col("mux")) * col("st")).as("bx"),
        sum((col("y") - col("muy")) * col("ct")).as("ay"),
        sum((col("y") - col("muy")) * col("st")).as("by"))
      .select(col("p").cast("long").as("period"),
        round4eps(col("ax") * col("ay") + col("bx") * col("by"))
          .as("co_spectrum"),
        round4eps(col("bx") * col("ay") - col("ax") * col("by"))
          .as("quadrature"),
        round4eps(sqrt(
          (col("ax") * col("ay") + col("bx") * col("by")) *
            (col("ax") * col("ay") + col("bx") * col("by")) +
          (col("bx") * col("ay") - col("ax") * col("by")) *
            (col("bx") * col("ay") - col("ax") * col("by"))))
          .as("amplitude"),
        round4eps(atan2(
          col("bx") * col("ay") - col("ax") * col("by"),
          col("ax") * col("ay") + col("bx") * col("by"))).as("phase"))
      .orderBy(col("period"))
  }

  /** Broken-stick trend: daily revenue (thousands) regressed on
    * (t, max(0, t−knot)) with the knot pinned at the calendar
    * midpoint — the piecewise-linear "did the trend change" fit, in
    * closed form via the centered normal equations (the olsMulti
    * Cramer solve). Reports both segment slopes and R².
    *
    * Scale shape: ONE moment aggregation over the calendar-bounded
    * daily frame (10 sums, map-side combined), then scalar Cramer
    * algebra on the 1-row frame. t and the hinge are exact integer
    * doubles; y is 4dp-quantized. */
  def piecewiseTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e3)).as("y"))
    val base = daily.agg(min(col("d")).as("d0"),
      floor(datediff(max(col("d")), min(col("d"))) / 2).as("knot"))
    val m = daily.crossJoin(broadcast(base))
      .withColumn("t", datediff(col("d"), col("d0")).cast("double"))
      .withColumn("x2", greatest(lit(0.0), col("t") - col("knot")))
      .agg(count(lit(1)).cast("double").as("n"),
        max(col("knot")).cast("double").as("knot"),
        sum(col("t")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("y")).as("sy"),
        sum(col("t") * col("t")).as("s11"),
        sum(col("t") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("t") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val cyy = col("syy") - col("sy") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val b0 = (col("sy") - b1 * col("s1") - b2 * col("s2")) / col("n")
    m.select(col("n").cast("long").as("n_days"),
      col("knot").cast("long").as("knot"),
      round4eps(b0).as("b0"),
      round4eps(b1).as("slope_pre"),
      round4eps(b1 + b2).as("slope_post"),
      round4eps(b2).as("slope_change"),
      round4eps(lit(1.0) - (cyy - b1 * c1y - b2 * c2y) / cyy).as("r2"))
  }

  /** Distance correlation between daily revenue and daily order
    * count — Székely's dCor, which is 0 IFF the series are
    * independent (Pearson, already gated, only sees linear parts).
    * Double-centered via the sufficient-statistic identity
    * ΣAᵢⱼBᵢⱼ = Σab − (2/n)·Σᵢ aᵢ.bᵢ. + a..b../n², so the n² pair
    * frame is aggregated once and never materialized wide.
    *
    * Scale shape: the pair walk is DAYS² (calendar-bounded, the
    * siegelSlope contract — ~5.8M pairs at 6.6 years regardless of
    * corpus size); one pair aggregation keyed by the left day (row
    * sums) plus one global moment pass. The fact scan is the only
    * data-scaled term. */
  def distanceCorr(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyXY(s, dir).persistMemDisk
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.t") =!= col("b.t"))
      .select(col("a.t").as("ti"),
        abs(col("a.x") - col("b.x")).as("ad"),
        abs(col("a.y") - col("b.y")).as("bd"))
    val rows = pairs.groupBy(col("ti"))
      .agg(sum(col("ad")).as("ra"), sum(col("bd")).as("rb"),
        sum(col("ad") * col("bd")).as("sab"),
        sum(col("ad") * col("ad")).as("saa"),
        sum(col("bd") * col("bd")).as("sbb"))
    val g = rows.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("ra")).as("ta"), sum(col("rb")).as("tb"),
      sum(col("sab")).as("sab"), sum(col("saa")).as("saa"),
      sum(col("sbb")).as("sbb"),
      sum(col("ra") * col("rb")).as("rab"),
      sum(col("ra") * col("ra")).as("raa"),
      sum(col("rb") * col("rb")).as("rbb"))
    def centered(sxy: Column, rxy: Column, tx: Column, ty: Column,
        n: Column): Column =
      sxy - lit(2.0) / n * rxy + tx * ty / (n * n)
    val n = col("n")
    val dcov2 = centered(col("sab"), col("rab"), col("ta"), col("tb"), n) /
      (n * n)
    val dvx2 = centered(col("saa"), col("raa"), col("ta"), col("ta"), n) /
      (n * n)
    val dvy2 = centered(col("sbb"), col("rbb"), col("tb"), col("tb"), n) /
      (n * n)
    g.select(n.cast("long").as("n_days"),
      round4eps(sqrt(greatest(dcov2, lit(0.0)))).as("dcov"),
      round4eps(sqrt(dvx2)).as("dvar_x"),
      round4eps(sqrt(dvy2)).as("dvar_y"),
      round4eps(sqrt(greatest(dcov2, lit(0.0)) /
        sqrt(dvx2 * dvy2))).as("dcor"))
  }

  /** Archimedean copula fit by Kendall-τ inversion on (daily revenue,
    * daily order count): Clayton θ = 2τ/(1−τ) with lower-tail
    * dependence λ_L = 2^(−1/θ), Gumbel θ = 1/(1−τ) with upper-tail
    * λ_U = 2 − 2^(1/θ) — the standard moment-matched tail models a
    * risk pipeline fits when linear correlation understates joint
    * extremes (complements the gated empirical tailDependence).
    *
    * Scale shape: τ from one concordant/discordant count over the
    * DAYS² pair frame (calendar-bounded) — exact integer counts, so
    * τ and both θ are engine-exact scalar algebra. */
  def copulaFit(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyXY(s, dir).persistMemDisk
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.t") < col("b.t"))
      .select(((col("a.x") - col("b.x")) * (col("a.y") - col("b.y")))
        .as("prod"))
    val counts = pairs.agg(
      count(lit(1)).cast("double").as("npairs"),
      sum(when(col("prod") > 0, 1L).otherwise(0L)).cast("double")
        .as("nc"),
      sum(when(col("prod") < 0, 1L).otherwise(0L)).cast("double")
        .as("nd"))
    val tau = (col("nc") - col("nd")) / col("npairs")
    counts.select(
      col("npairs").cast("long").as("n_pairs"),
      round4eps(tau).as("tau"),
      round4eps(lit(2.0) * tau / (lit(1.0) - tau)).as("theta_clayton"),
      round4eps(lit(1.0) / (lit(1.0) - tau)).as("theta_gumbel"),
      round4eps(when(tau > 0,
        pow(lit(2.0), lit(-1.0) * (lit(1.0) - tau) / (lit(2.0) * tau)))
        .otherwise(lit(0.0))).as("lambda_lower"),
      round4eps(when(tau > 0,
        lit(2.0) - pow(lit(2.0), lit(1.0) - tau)).otherwise(lit(0.0)))
        .as("lambda_upper"))
  }
  /** Hoeffding's D (1948) between daily revenue and daily order count
    * — the rank test consistent against ANY dependence (Spearman /
    * Kendall / distanceCorr each have blind spots; D detects every
    * departure from independence): with pooled midranks R, S and the
    * bivariate dominance count Qᵢ (Hollander-Wolfe tie convention:
    * strictly-below pairs weigh 1, one-coordinate ties ½, double ties
    * ¼ — all binary-exact quarters),
    *   D = 30·[(n−2)(n−3)D₁ + D₂ − 2(n−2)D₃] / [n(n−1)(n−2)(n−3)(n−4)]
    * with D₁ = Σ(Qᵢ−1)(Qᵢ−2), D₂ = Σ(Rᵢ−1)(Rᵢ−2)(Sᵢ−1)(Sᵢ−2),
    * D₃ = Σ(Rᵢ−2)(Sᵢ−2)(Qᵢ−1).
    *
    * Scale shape: midranks are two value-collapsed prefix windows;
    * Q is ONE days² pair aggregation (the calendar-bounded theta-join
    * budget every dependence gate here rides); the three D sums are
    * one scalar rollup. */
  def hoeffdingD(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyXY(s, dir).persistMemDisk
    def midranks(v: String, out: String): DataFrame = {
      val perV = daily.groupBy(col(v)).agg(count(lit(1)).as("t"))
      val wv = Window.orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, -1)
      perV.withColumn("cb", coalesce(sum(col("t")).over(wv), lit(0L)))
        .select(col(v), (col("cb") + (col("t") + 1) / lit(2.0)).as(out))
    }
    val ranked = daily
      .join(broadcast(midranks("x", "r")), "x")
      .join(broadcast(midranks("y", "s")), "y")
    val q = daily.as("a").join(daily.as("b"), col("a.t") =!= col("b.t"))
      .select(col("a.t").as("t"),
        (when(col("b.x") < col("a.x") && col("b.y") < col("a.y"), 1.0)
          .when(col("b.x") === col("a.x") && col("b.y") === col("a.y"), 0.25)
          .when((col("b.x") === col("a.x") && col("b.y") < col("a.y")) ||
            (col("b.x") < col("a.x") && col("b.y") === col("a.y")), 0.5)
          .otherwise(0.0)).as("w"))
      .groupBy(col("t")).agg((lit(1.0) + sum(col("w"))).as("q"))
    val terms = ranked.join(q, "t")
    val a = terms.agg(count(lit(1)).cast("double").as("n"),
      sum((col("q") - 1) * (col("q") - 2)).as("d1"),
      sum((col("r") - 1) * (col("r") - 2) * (col("s") - 1) *
        (col("s") - 2)).as("d2"),
      sum((col("r") - 2) * (col("s") - 2) * (col("q") - 1)).as("d3"))
    val n = col("n")
    // the raw D sums reach ~n⁵ (≈10¹⁶ at bench scale) — past the
    // long-returning floor() quantizer's range — so they surface
    // n-NORMALIZED (O(1) magnitudes, 4dp-stable on both engines)
    a.select(n.cast("long").as("n_days"),
      round4eps(col("d1") / (n * n * n)).as("d1_norm"),
      round4eps(col("d2") / (n * n * n * n * n)).as("d2_norm"),
      round4eps(col("d3") / (n * n * n * n)).as("d3_norm"),
      round4eps(lit(30.0) * ((n - 2) * (n - 3) * col("d1") + col("d2") -
        lit(2.0) * (n - 2) * col("d3")) /
        (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))).as("hoeffding_d"))
  }
}