package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Survival analysis over customer order histories — the
  * time-to-churn toolkit (Kaplan-Meier product-limit, Nelson-Aalen
  * cumulative hazard, two-sample log-rank test), built on the same
  * right-censoring model a subscription/retention analysis uses.
  *
  * Censoring model (shared by all three operators): per customer,
  * `first`/`last` order dates; study end = the corpus-wide max order
  * date. A customer whose last order is more than [[ChurnGapDays]]
  * before study end CHURNED at `last` (event, duration = last−first);
  * anyone still active is CENSORED at study end (duration =
  * end−first). Durations are integer days (`datediff` ==
  * DuckDB `date_diff('day', …)` — exact cross-engine parity).
  *
  * Scale shape: ONE orders scan → per-customer min/max aggregate (one
  * custkey-keyed shuffle, fact-linear) → distribution-collapse onto
  * the duration axis (NDV ≤ the calendar span in days, ~2.4k here —
  * corpus-size-INDEPENDENT from that point on). The at-risk counts
  * n(t) = #{duration ≥ t} come from a cumulative sum over that
  * bounded frame, never a per-customer window; KM's running product is
  * exp(Σ ln(1−d/n)) over the same bounded frame. At 100 TB the only
  * term that grows is the first aggregate.
  *
  * KM zero guard: at an event time where d == n (everyone at risk
  * dies) the survivor function hits exactly 0 and `ln(1−d/n)` is
  * undefined — both engines mask it with an explicit cumulative
  * any-zero flag instead of relying on ln(0)/exp(−inf) semantics
  * (Spark's non-ANSI `log` returns NULL on 0, DuckDB returns −inf;
  * the flag makes the two agree bit-for-bit).
  */
object Survival {

  /** Gap (days) after a customer's last order, relative to study end,
    * that declares the customer churned rather than censored. */
  val ChurnGapDays = 180

  /** Per-customer (duration_days, event) under the censoring model —
    * the shared first stage. */
  private[graft] def durations(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(to_date(min(col("o_orderdate"))).as("first_d"),
        to_date(max(col("o_orderdate"))).as("last_d"))
    val end = perCust.agg(max(col("last_d")).as("end_d"))
    perCust.crossJoin(broadcast(end))
      .select(col("o_custkey"),
        when(datediff(col("end_d"), col("last_d")) > ChurnGapDays,
          datediff(col("last_d"), col("first_d")))
          .otherwise(datediff(col("end_d"), col("first_d"))).as("t"),
        (datediff(col("end_d"), col("last_d")) > ChurnGapDays)
          .cast("int").as("event"))
  }

  /** The collapsed life table: one row per distinct duration with
    * events, with d(t) = events at t and n(t) = at-risk (duration ≥ t,
    * censored included). */
  private def lifeTable(s: SparkSession, dir: String): DataFrame = {
    val dur = durations(s, dir)
    // collapse to the duration axis FIRST (calendar-bounded NDV), then
    // n(t) by reverse cumulative sum of the per-duration populations
    val byT = dur.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("event")).as("d_events"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .filter(col("d_events") > 0)
      .select(col("t"), col("n_risk"), col("d_events"))
  }

  /** Kaplan-Meier product-limit estimator: S(t) = Π_{t_i ≤ t}
    * (1 − d_i/n_i), reported at each event time. */
  def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val lt = lifeTable(s, dir)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.withColumn("dead_frac",
        col("d_events").cast("double") / col("n_risk").cast("double"))
      .withColumn("hit_zero",
        max((col("d_events") === col("n_risk")).cast("int")).over(wCum))
      .withColumn("s_km", round4eps(
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(exp(sum(log(lit(1.0) - col("dead_frac"))).over(wCum)))))
      .select(col("t"), col("n_risk"), col("d_events"), col("s_km"))
      .orderBy(col("t"))
  }

  /** Nelson-Aalen cumulative hazard H(t) = Σ d_i/n_i with its Poisson
    * variance Σ d_i/n_i². */
  def nelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val lt = lifeTable(s, dir)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.withColumn("h_na", round4eps(sum(
        col("d_events").cast("double") / col("n_risk").cast("double"))
        .over(wCum)))
      .withColumn("var_na", round4eps(sum(
        col("d_events").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double")))
        .over(wCum)))
      .select(col("t"), col("n_risk"), col("d_events"),
        col("h_na"), col("var_na"))
      .orderBy(col("t"))
  }

  /** Survival summary scalars from the KM curve: median survival time
    * (first event time where the QUANTIZED S(t) ≤ 0.5) and the
    * restricted mean survival time RMST(τ) = ∫₀^τ S(t) dt — the area
    * under the left-continuous KM step function up to the horizon
    * τ = [[RmstHorizonDays]] (one year). RMST is the survival
    * effect-size clinicians/retention analysts quote when medians are
    * unstable; both are pure post-processing of the calendar-bounded
    * KM frame (a lag window + one aggregate — constant-size). */
  val RmstHorizonDays = 365

  def survivalSummary(s: SparkSession, dir: String): DataFrame = {
    val tau = RmstHorizonDays.toDouble
    val km = kaplanMeier(s, dir).select(col("t"), col("s_km"))
    val w = Window.orderBy(col("t"))
    val pieces = km
      .withColumn("prev_t", coalesce(lag(col("t"), 1).over(w), lit(0)))
      .withColumn("prev_s", coalesce(lag(col("s_km"), 1).over(w), lit(1.0)))
      .withColumn("piece", col("prev_s") *
        (least(col("t").cast("double"), lit(tau)) -
          least(col("prev_t").cast("double"), lit(tau))))
    val tail = km.agg(max(col("t")).as("t_last"))
      .join(km.select(col("t").as("t_last"), col("s_km").as("s_last")), "t_last")
    pieces.agg(
        sum(col("piece")).as("area_head"),
        min(when(col("s_km") <= 0.5, col("t"))).as("median_t"))
      .crossJoin(broadcast(tail))
      .select(lit(RmstHorizonDays).as("tau"),
        round4eps(col("area_head") + col("s_last") *
          (lit(tau) - least(col("t_last").cast("double"), lit(tau))))
          .as("rmst"),
        col("median_t"))
  }

  /** Weibull fit by probability-plot regression over the KM curve —
    * the parametric closure of the kit: under Weibull survival,
    * ln(−ln S(t)) is LINEAR in ln t with slope = shape k and intercept
    * −k·ln λ, so an OLS on the (quantized) KM points gives
    * (k, λ, R²) in closed form. k < 1 = infant-mortality churn
    * (early leavers dominate), k > 1 = wear-out. The regression input
    * is the QUANTIZED s_km both engines already agree on bit-for-bit,
    * over the calendar-bounded life table — constant-size. Points with
    * S rounded to 0 or 1 are excluded (the transform is undefined
    * there), identically on both sides. */
  def weibullFit(s: SparkSession, dir: String): DataFrame = {
    val pts = kaplanMeier(s, dir)
      .filter(col("s_km") > 0.0 && col("s_km") < 1.0 && col("t") > 0)
      .select(log(col("t").cast("double")).as("x"),
        log(-log(col("s_km"))).as("y"))
    pts.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("k", col("cxy") / col("cxx"))
      .withColumn("b0",
        (col("sy") - col("k") * col("sx")) / col("n"))
      .select(col("n").cast("long").as("n_points"),
        round4eps(col("k")).as("shape"),
        round4eps(exp(-col("b0") / col("k"))).as("scale_days"),
        round4eps(col("cxy") * col("cxy") / (col("cxx") * col("cyy")))
          .as("r2"))
  }

  /** Two-sample log-rank test: BUILDING-segment customers vs everyone
    * else. At each pooled event time, observed-minus-expected group-1
    * deaths under the hypergeometric null; the statistic
    * (ΣO−E)² / ΣV is χ²(1). Scalar output row:
    * (n_times, o1, e1, v, chi2). */
  def logRank(s: SparkSession, dir: String): DataFrame = {
    val seg = Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("int").as("g1"))
    val dur = durations(s, dir)
      .join(seg, col("o_custkey") === col("c_custkey"))
    val byT = dur.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(col("event")).as("d_all"),
        sum(col("g1")).as("n1_at"),
        sum(col("event") * col("g1")).as("d1"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT
      .withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .withColumn("n1_risk", sum(col("n1_at")).over(wDesc))
      .filter(col("d_all") > 0 && col("n_risk") > 1)
    val n = col("n_risk").cast("double")
    val d = col("d_all").cast("double")
    val n1 = col("n1_risk").cast("double")
    risk.select(col("t"), col("d1").cast("double").as("o1i"),
        (d * n1 / n).as("e1i"),
        (d * (n1 / n) * (lit(1.0) - n1 / n) * (n - d) / (n - lit(1.0)))
          .as("vi"))
      .agg(count(lit(1)).as("n_times"),
        sum(col("o1i")).as("o1_raw"),
        sum(col("e1i")).as("e1_raw"),
        sum(col("vi")).as("v_raw"))
      .select(col("n_times"),
        round4eps(col("o1_raw")).as("o1"),
        round4eps(col("e1_raw")).as("e1"),
        round4eps(col("v_raw")).as("v"),
        round4eps((col("o1_raw") - col("e1_raw")) *
          (col("o1_raw") - col("e1_raw")) / col("v_raw")).as("chi2"))
  }

  /** Kaplan-Meier with Greenwood confidence bands: the same
    * product-limit curve plus Var[S(t)] = S(t)²·Σ_{tᵢ≤t} d/(n(n−d))
    * (Greenwood's formula) and the plain ±1.96·se band clipped to
    * [0, 1] — the uncertainty the bare KM line hides, and what decides
    * whether two retention curves are distinguishable at the tail
    * where n(t) is small. Same calendar-bounded life-table collapse as
    * [[kaplanMeier]]; one more cumulative window for the variance sum. */
  def kmGreenwood(s: SparkSession, dir: String): DataFrame = {
    val lt = lifeTable(s, dir)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col("n_risk").cast("double")
    val d = col("d_events").cast("double")
    lt.withColumn("dead_frac", d / n)
      .withColumn("hit_zero",
        max((col("d_events") === col("n_risk")).cast("int")).over(wCum))
      .withColumn("s_km", round4eps(
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(exp(sum(log(lit(1.0) - col("dead_frac"))).over(wCum)))))
      .withColumn("gw", sum(
        when(n > d, d / (n * (n - d))).otherwise(lit(0.0))).over(wCum))
      .withColumn("se", round4eps(col("s_km") * sqrt(col("gw"))))
      .select(col("t"), col("n_risk"), col("d_events"), col("s_km"),
        col("se"),
        round4eps(greatest(lit(0.0),
          col("s_km") - lit(1.96) * col("se"))).as("ci_lo"),
        round4eps(least(lit(1.0),
          col("s_km") + lit(1.96) * col("se"))).as("ci_hi"))
      .orderBy(col("t"))
  }

  /** Cox proportional-hazards fit (single binary covariate, Breslow
    * ties): the semi-parametric churn-risk model the log-rank test
    * only screens for. With a binary covariate the partial likelihood
    * collapses COMPLETELY onto the life table — per event time t only
    * (d(t), d1(t), n0(t), n1(t)) matter:
    *
    *   U(β) = Σ_t [d1(t) − d(t)·r(t)],   r(t) = n1·e^β / (n0 + n1·e^β)
    *   I(β) = Σ_t d(t)·r(t)·(1 − r(t))
    *
    * so the distributed work is ONE orders scan → calendar-bounded
    * risk frame (NDV ≤ ~2.4k event days), and Newton from β = 0 runs
    * driver-side over the collected frame (the bounded-series collect
    * discipline — loud require cap). Each β iterate is 1e-6-quantized
    * so the DuckDB oracle's recursive CTE walks the IDENTICAL
    * trajectory (the q_markov_absorption/q_holt_forecast idiom).
    * Wald z = β̂·√I(β̂) against the quantized 1.96 critical value.
    *
    * 100 TB posture: fact-scan linear; the Newton loop runs over a
    * frame bounded by the CALENDAR, not the corpus — flat at any sf. */
  def coxPh(s: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val seg = Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("int").as("g1"))
    val dur = durations(s, dir)
      .join(seg, col("o_custkey") === col("c_custkey"))
    val byT = dur.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(col("event")).as("d_all"),
        sum(col("g1")).as("n1_at"),
        sum(col("event") * col("g1")).as("d1"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = byT
      .withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .withColumn("n1_risk", sum(col("n1_at")).over(wDesc))
      .filter(col("d_all") > 0)
      .select(col("d_all").cast("double").as("d"),
        col("d1").cast("double").as("d1"),
        col("n1_risk").cast("double").as("n1"),
        (col("n_risk") - col("n1_risk")).cast("double").as("n0"))
      .collect()
    require(risk.length <= 10000,
      s"cox life table has ${risk.length} event times — the duration " +
        "axis is calendar-bounded (~2.4k days); a larger frame means " +
        "the collapse upstream broke, not that more driver memory is ok")
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5 + 1e-6) / 1e6
    def scoreInfo(beta: Double): (Double, Double) = {
      var u = 0.0; var i2 = 0.0
      risk.foreach { row =>
        val d = row.getDouble(0); val d1 = row.getDouble(1)
        val n1 = row.getDouble(2); val n0 = row.getDouble(3)
        val r = n1 * math.exp(beta) / (n0 + n1 * math.exp(beta))
        u += d1 - d * r
        i2 += d * r * (1.0 - r)
      }
      (u, i2)
    }
    var beta = 0.0
    for (_ <- 1 to iters) {
      val (u, i2) = scoreInfo(beta)
      beta = q6(beta + u / i2)
    }
    // Wald information is evaluated AT the converged beta (the oracle
    // recomputes it the same way after its recursive walk)
    val info = scoreInfo(beta)._2
    val nEvents = risk.map(_.getDouble(0)).sum.toLong
    import s.implicits._
    Seq((risk.length.toLong, nEvents, beta, math.exp(beta),
        beta * math.sqrt(info)))
      .toDF("n_times", "n_events", "beta_raw", "hr_raw", "wald_raw")
      .select(col("n_times"), col("n_events"),
        round4eps(col("beta_raw")).as("beta"),
        round4eps(col("hr_raw")).as("hazard_ratio"),
        round4eps(col("wald_raw")).as("wald_z"),
        (round4eps(abs(col("wald_raw"))) > 1.96).as("significant"))
  }

  /** Competing-risks cumulative incidence (Aalen-Johansen): customers
    * exit by TWO distinct modes — churn after a FULFILLED final order
    * ("complete": served, then left) vs churn on an unfulfilled one
    * ("abandon": left mid-relationship) — and the naive per-cause KM
    * overstates both (it treats the other cause as censoring).
    * CIF_k(t) = Σ_{s≤t} S(s−)·d_k(s)/n(s) with S the ALL-CAUSE KM;
    * S(s−) is the 4dp-quantized previous-row survival, so the oracle
    * replays the product exactly. Same calendar-bounded life-table
    * collapse as [[kaplanMeier]]; the last-order status comes from a
    * customer-keyed window (deterministic orderkey tie-break). */
  def competingRisks(s: SparkSession, dir: String): DataFrame = {
    val wLast = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val lastStatus = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("ck"), col("o_orderstatus").as("st"))
    val dur = durations(s, dir)
      .join(lastStatus, col("o_custkey") === col("ck"))
      .select(col("t"),
        (col("event") === 1 && col("st") === "F").cast("long").as("e1"),
        (col("event") === 1 && col("st") =!= "F").cast("long").as("e2"))
    val byT = dur.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(col("e1")).as("d1"), sum(col("e2")).as("d2"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.withColumn("n_risk", sum(col("n_at")).over(wDesc))
      .filter(col("d1") + col("d2") > 0)
      .withColumn("dfrac", (col("d1") + col("d2")).cast("double") /
        col("n_risk").cast("double"))
      .withColumn("hit_zero",
        max((col("d1") + col("d2") === col("n_risk")).cast("int"))
          .over(wCum))
      .withColumn("s4", round4eps(
        when(col("hit_zero") === 1, lit(0.0))
          .otherwise(exp(sum(log(lit(1.0) - col("dfrac"))).over(wCum)))))
      .withColumn("s_prev",
        coalesce(lag(col("s4"), 1).over(Window.orderBy(col("t"))), lit(1.0)))
      .withColumn("cif_complete", round4eps(
        sum(col("s_prev") * col("d1").cast("double") / col("n_risk"))
          .over(wCum)))
      .withColumn("cif_abandon", round4eps(
        sum(col("s_prev") * col("d2").cast("double") / col("n_risk"))
          .over(wCum)))
      .select(col("t"), col("n_risk"),
        col("d1").as("d_complete"), col("d2").as("d_abandon"),
        col("s4").as("s_overall"),
        col("cif_complete"), col("cif_abandon"))
      .orderBy(col("t"))
  }
}
