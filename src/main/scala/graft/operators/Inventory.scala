package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Inventory-policy analytics per brand — the classic operations
  * triple (EOQ, safety stock, reorder point) computed from shipped
  * demand, the supply-chain readout a CPG mart serves.
  *
  * Demand model: daily shipped quantity per brand over the FULL
  * calendar span D = max(l_shipdate) − min(l_shipdate) + 1 days
  * (zero-demand days count — omitting them understates variance, the
  * classic intermittency mistake): μ_d = ΣQ / D and
  * σ_d² = Σq_day² / D − μ_d² where zero days contribute 0 to the sum
  * of squares, so only OBSERVED days are ever materialized.
  *
  * Policy formulas (order cost K = [[OrderCost]], holding rate
  * [[HoldingRate]]·unit price, lead time [[LeadTimeDays]], z = 1.645
  * ≈ 95% service):
  *   EOQ = √(2·D_annual·K / h),  SS = z·σ_d·√L,  ROP = μ_d·L + SS.
  *
  * Scale shape: one lineitem scan joined to the broadcast part dim →
  * (brand, day) aggregate (fact-linear, one shuffle) → brand-grain
  * collapse (NDV 25). Quantities are integer-valued doubles, so the
  * daily sums and sums of squares are EXACT integers in double —
  * cross-engine bit parity up to the final divisions. */
object Inventory {

  val OrderCost = 100.0
  val HoldingRate = 0.2
  val LeadTimeDays = 7.0
  val ServiceZ = 1.645

  /** Newsvendor optimal stock per brand — the single-period
    * stochastic-inventory classic: stock the critical fractile
    * q* = c_u/(c_u + c_o) of the daily demand distribution
    * (underage cost [[NewsUnderage]], overage [[NewsOverage]] →
    * q* = 2/3). The distribution INCLUDES zero-demand days (the
    * intermittency discipline shared with [[inventoryPolicy]]) by
    * folding `span − observed` days into a q = 0 mass — no calendar
    * row is ever materialized. The quantile is type-1 (smallest q with
    * cumulative count ≥ ⌈q*·D⌉) so it is exact integer arithmetic on
    * both engines, no interpolation. Scale: one fact collapse →
    * (brand, demand-value) frame (NDV-bounded) → cumulative windows. */
  val NewsUnderage = 2.0
  val NewsOverage = 1.0

  /** Zero-inflated Poisson fit per brand (method of moments) over the
    * daily demand distribution INCLUDING zero days: intermittent
    * demand is structurally zero-heavy, and the ZIP decomposition
    * separates "no demand process today" (π) from the demand rate when
    * active (λ): with m = mean, v = population variance,
    *   λ = (v + m² − m)/m,   π = 1 − m/λ.
    * When v ≤ m (no excess zeros — equi/under-dispersed) the model
    * collapses to plain Poisson (λ = m, π = 0). The observed zero
    * share is reported next to the ZIP-implied one — the
    * goodness-of-moment check. Same (brand, day) collapse scale shape
    * as [[newsvendor]]; all moments are exact integer sums. */
  def zipFit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), to_date(col("l_shipdate")).as("d"),
        col("l_quantity"))
    val span = li.agg((datediff(max(col("d")), min(col("d"))) + 1)
      .cast("double").as("n_days"))
    val daily = li.groupBy(col("p_brand"), col("d"))
      .agg(sum(col("l_quantity")).as("q"))
    daily.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("double").as("n_obs"),
        sum(col("q")).as("sq"), sum(col("q") * col("q")).as("sqq"))
      .crossJoin(broadcast(span))
      .withColumn("m", col("sq") / col("n_days"))
      .withColumn("v", col("sqq") / col("n_days") - col("m") * col("m"))
      .withColumn("lam", when(col("v") <= col("m"), col("m"))
        .otherwise((col("v") + col("m") * col("m") - col("m")) / col("m")))
      .withColumn("pi", when(col("v") <= col("m"), lit(0.0))
        .otherwise(lit(1.0) - col("m") / col("lam")))
      .select(col("p_brand"),
        round4eps(col("m")).as("mean_daily"),
        round4eps(col("v")).as("var_daily"),
        round4eps(col("lam")).as("zip_lambda"),
        round4eps(col("pi")).as("zip_pi"),
        round4eps((col("n_days") - col("n_obs")) / col("n_days"))
          .as("zero_share_obs"))
      .orderBy(col("p_brand"))
  }

  def newsvendor(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), to_date(col("l_shipdate")).as("d"),
        col("l_quantity"))
    val span = li.agg((datediff(max(col("d")), min(col("d"))) + 1)
      .cast("long").as("n_days"))
    val daily = li.groupBy(col("p_brand"), col("d"))
      .agg(sum(col("l_quantity")).cast("long").as("q"))
    val vals = daily.groupBy(col("p_brand"), col("q"))
      .agg(count(lit(1)).as("c"))
    val obs = vals.groupBy(col("p_brand")).agg(sum(col("c")).as("n_obs"))
    val zeros = obs.crossJoin(broadcast(span))
      .filter(col("n_days") > col("n_obs"))
      .select(col("p_brand"), lit(0L).as("q"),
        (col("n_days") - col("n_obs")).as("c"))
    val fractile = NewsUnderage / (NewsUnderage + NewsOverage)
    val wCum = Window.partitionBy(col("p_brand")).orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.unionByName(zeros)
      .crossJoin(broadcast(span))
      .withColumn("cc", sum(col("c")).over(wCum))
      .filter(col("cc") >= ceil(lit(fractile) * col("n_days")).cast("long"))
      .groupBy(col("p_brand"), col("n_days"))
      .agg(min(col("q")).as("s_opt"))
      .select(col("p_brand"), col("n_days"),
        graft.functions.Rounding.round4eps(lit(fractile)).as("fractile"),
        col("s_opt"))
      .orderBy(col("p_brand"))
  }

  /** Croston's method for intermittent demand — the forecasting
    * standard when a series is mostly zeros (slow-moving SKUs, spare
    * parts): simple exponential smoothing applied SEPARATELY to the
    * nonzero demand sizes and to the inter-demand intervals, forecast
    * rate = ẑ/p̂ per period.
    *
    * Both SES fits use the K-truncated closed form (the
    * [[ControlCharts]] discipline): z_k = α·Σ_{j<min(k,K)} a^j·x_{k−j}
    * (+ a^k·x₁-anchored tail while k ≤ K), a = 1−α — an identical
    * finite formula on both engines, positional over the window's
    * collected array (α = [[CrostonAlpha]], K = [[CrostonWindow]];
    * a^64 ≈ 1e−3·… with α=0.1: 0.9^64 ≈ 1.2e−3, times bounded demand
    * sizes ≤ 50 — the truncated form IS the metric, so parity is
    * definitional, and the window keeps the per-part cost K·K_p
    * instead of K_p²).
    *
    * Grain: per part, over its nonzero-demand DAYS (k indexes demand
    * occurrences, the Croston clock). Output: the top-k parts by
    * forecast rate with their ẑ, p̂ and occurrence count — the
    * replenishment watchlist. Scale shape: one fact scan → (part, day)
    * collapse → part-keyed windows (bounded arrays) → part-grain
    * closing row each. */
  val CrostonAlpha = 0.1
  val CrostonWindow = 64

  def crostonForecast(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val a = 1.0 - CrostonAlpha
    val daily = Tables.lineitem(s, dir)
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("d"),
        col("l_quantity"))
      .groupBy(col("l_partkey"), col("d"))
      .agg(sum(col("l_quantity")).as("x"))
    // r15 rewrite (guide §1.2 step 1 — don't compute what you throw
    // away): the original shape ran THREE part-keyed windows (row
    // numbers + per-row collect_list arrays + a closing max) and folded
    // the K-term SES for EVERY occurrence row, then kept only each
    // part's LAST row — O(n·K) work and three sorted window passes for
    // an n_parts-row answer. Now ONE part-keyed aggregate collects the
    // (day, demand) series, and the identical SES closed form (same
    // transform/aggregate/pow expression tree, bit-identical doubles —
    // Round15Spec asserts old ≡ new end to end) folds ONCE per part
    // over the K-truncated tail. Shuffle unchanged (the daily rows),
    // compute per part drops from O(n·K) to O(n log n + K).
    //
    // SES over a positional array. With the anchor term the first
    // element's total coefficient is α·a^(m−1) + a^m = a^(m−1):
    // EXACTLY the classic z_1 = x_1 seeded recursion while the window
    // covers the history, the defined truncated metric beyond it.
    // EVALUATION-BOUNDARY DISCIPLINE (the first cut of this rewrite
    // built the derived arrays inline inside the fold lambdas — every
    // element_at(arr, j) re-evaluated the whole producing transform
    // per ELEMENT, interpreted HOFs cache nothing: 2.8 s → 12.4 s.
    // Each derived array is therefore bound to an ATTRIBUTE in its own
    // projection layer; CollapseProject never inlines an expensive
    // producer that is referenced more than once, so each array is
    // computed exactly once per row and the folds walk attributes):
    val grouped = daily
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("s"))
      .filter(size(col("s")) >= 2) // SES needs one gap (the old
                                   // gap-not-null filter's effect)
    def lastW(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(size(arr) > CrostonWindow,
        slice(arr, -CrostonWindow, CrostonWindow)).otherwise(arr)
    def ses(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lit(CrostonAlpha) * aggregate(
        transform(sequence(lit(1), size(arr)),
          j => element_at(arr, j) * pow(lit(a), size(arr) - j)),
        lit(0.0), (acc, v) => acc + v) +
      pow(lit(a), size(arr)) * element_at(arr, 1)
    grouped
      // demand sizes x₂..xₙ and gaps d_i−d_{i−1} (the Croston clock
      // skips the seed occurrence, as the old gap-not-null filter did)
      .select(col("l_partkey"), size(col("s")).as("n_occ"),
        expr("transform(sequence(2, size(s)), i -> element_at(s, i).x)")
          .as("xs"),
        expr("transform(sequence(2, size(s)), " +
          "i -> CAST(datediff(element_at(s, i).d, element_at(s, i - 1).d) " +
          "AS DOUBLE))").as("gs"))
      .select(col("l_partkey"), col("n_occ"),
        lastW(col("xs")).as("za"), lastW(col("gs")).as("ga"))
      .select(col("l_partkey"), col("n_occ"),
        ses(col("za")).as("z"), ses(col("ga")).as("p"))
      // The old defensive p > 0 filter is dropped: gaps are distinct-
      // day differences (≥ 1) and every SES coefficient is positive,
      // so p is a sum of strictly positive terms — provably > 0 for
      // every surviving (n ≥ 2) part, in FP too (no cancellation).
      // Kept OUT deliberately: predicate pushdown re-inlined the whole
      // ses/transform tree into a below-project Filter, re-paying the
      // fold per row (6.9 s); droppping the vacuous filter restores
      // the single evaluation. Row set unchanged (oracle-verified).
      .select(col("l_partkey"), col("n_occ"),
        round4eps(col("z")).as("z_hat"),
        round4eps(col("p")).as("p_hat"),
        round4eps(col("z") / col("p")).as("rate"))
      .orderBy(col("rate").desc, col("l_partkey"))
      .limit(k)
  }

  def inventoryPolicy(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"),
        to_date(col("l_shipdate")).as("d"))
    val span = li.agg((datediff(max(col("d")), min(col("d"))) + 1)
      .cast("double").as("n_days"))
    val part = broadcast(Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice")))
    val daily = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("d"))
      .agg(sum(col("l_quantity")).as("q"))
    val price = Tables.part(s, dir).groupBy(col("p_brand"))
      .agg(avg(col("p_retailprice")).as("unit_price"))
    daily.groupBy(col("p_brand"))
      .agg(sum(col("q")).as("total_qty"),
        sum(col("q") * col("q")).as("sum_q2"))
      .join(price, "p_brand")
      .crossJoin(broadcast(span))
      .withColumn("mu_d", col("total_qty") / col("n_days"))
      .withColumn("var_d",
        col("sum_q2") / col("n_days") - col("mu_d") * col("mu_d"))
      .withColumn("d_annual", col("total_qty") * lit(365.0) / col("n_days"))
      .withColumn("h", lit(HoldingRate) * col("unit_price"))
      .select(col("p_brand"),
        col("total_qty").cast("long").as("total_qty"),
        round4eps(col("mu_d")).as("mu_daily"),
        round4eps(sqrt(col("var_d"))).as("sigma_daily"),
        round4eps(sqrt(lit(2.0) * col("d_annual") * lit(OrderCost) /
          col("h"))).as("eoq"),
        round4eps(lit(ServiceZ) * sqrt(col("var_d")) *
          sqrt(lit(LeadTimeDays))).as("safety_stock"),
        round4eps(col("mu_d") * lit(LeadTimeDays) +
          lit(ServiceZ) * sqrt(col("var_d")) * sqrt(lit(LeadTimeDays)))
          .as("reorder_point"))
      .orderBy(col("p_brand"))
  }

  /** Negative-binomial demand fit per brand (method of moments over
    * observed weekly unit demand): r = m²/(v − m), p = m/v when the
    * variance exceeds the mean — the overdispersion-aware count model
    * a Poisson-based stock policy silently needs (v >> m means the
    * Poisson safety stock is fiction). Under-dispersed brands report
    * r = 0 with the flag false. One (brand, ISO-week) rollup →
    * taxonomy-bounded moment frame. */
  def negbinFit(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        date_trunc("week", col("l_shipdate")).cast("date").as("wk"))
      .agg(sum(col("l_quantity")).as("q"))
    weekly.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("q")).as("sq"),
        sum(col("q") * col("q")).as("sqq"))
      .withColumn("m", col("sq") / col("n"))
      .withColumn("v",
        (col("sqq") - col("sq") * col("sq") / col("n")) /
          (col("n") - lit(1.0)))
      .select(col("p_brand"),
        col("n").cast("long").as("n_weeks"),
        round4eps(col("m")).as("mean_q"),
        round4eps(col("v")).as("var_q"),
        round4eps(when(col("v") > col("m"),
          col("m") * col("m") / (col("v") - col("m")))
          .otherwise(lit(0.0))).as("nb_r"),
        (col("v") > col("m")).as("overdispersed"))
      .orderBy(col("p_brand"))
  }

  /** Erlang-C staffing table: with arrival rate λ = orders/day and a
    * fixed per-agent service rate μ, the wait probability and average
    * speed of answer for each candidate agent count c — the queueing
    * sizing readout (the M/M/c companion of the gated Little's-law
    * identity). P_wait = (aᶜ/c!)·c/(c−a) / (Σ_{k<c} aᵏ/k! + same),
    * ASA = P_wait/(cμ − λ).
    *
    * Scale shape: the fact scan collapses to ONE (λ) scalar; the
    * k-term table is offered-load-bounded (a ≈ λ/μ, a handful of
    * terms) with exact ln-factorials from a cumulative-sum window
    * over that tiny frame. The offered load a is 1e-6-quantized so
    * every exp/ratio is engine-exact. */
  def erlangC(s: SparkSession, dir: String,
      muPerDay: Double = 50.0): DataFrame = {
    def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, dir)
      .agg((count(lit(1)) /
        (datediff(max(col("o_orderdate")), min(col("o_orderdate"))) + 1))
        .as("lam_raw"))
      .select(q6(col("lam_raw")).as("lam"),
        q6(col("lam_raw") / lit(muPerDay)).as("a"))
    val kf = base
      .withColumn("k", explode(sequence(lit(0),
        ceil(col("a")).cast("int") + 5)))
      .withColumn("lnf", sum(when(col("k") > 0, log(col("k")))
        .otherwise(lit(0.0))).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("term", exp(col("k") * log(col("a")) - col("lnf")))
    val grid = base.withColumn("c", explode(sequence(
      ceil(col("a")).cast("int") + 1, ceil(col("a")).cast("int") + 5)))
    grid.join(kf.select(col("k"), col("lnf"), col("term")),
        col("k") <= col("c"))
      .groupBy(col("c"), col("lam"), col("a"))
      .agg(sum(when(col("k") < col("c"), col("term")).otherwise(lit(0.0)))
        .as("s"),
        max(when(col("k") === col("c"), col("term")).otherwise(lit(0.0)))
          .as("tc"))
      .withColumn("pw",
        (col("tc") * col("c") / (col("c") - col("a"))) /
          (col("s") + col("tc") * col("c") / (col("c") - col("a"))))
      .select(col("c").cast("long").as("agents"),
        round4eps(col("a") / col("c")).as("rho"),
        round4eps(col("pw")).as("p_wait"),
        round4eps(col("pw") /
          (col("c") * lit(muPerDay) - col("lam")) * lit(24.0))
          .as("asa_hours"))
      .orderBy(col("agents"))
  }

  /** Erlang-B blocking table — the LOSS-system companion of
    * [[erlangC]] (no queue: a blocked arrival is lost, the trunk/
    * connection-pool sizing model): B(c, a) = (aᶜ/c!)/Σ_{k≤c}aᵏ/k!,
    * plus the carried load a·(1−B). Same machinery as Erlang-C — one
    * λ collapse, a bounded ln-factorial term table — evaluated from
    * c = 1 so the sizing curve shows the steep small-c region too. */
  def erlangB(s: SparkSession, dir: String,
      muPerDay: Double = 50.0): DataFrame = {
    def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, dir)
      .agg((count(lit(1)) /
        (datediff(max(col("o_orderdate")), min(col("o_orderdate"))) + 1))
        .as("lam_raw"))
      .select(q6(col("lam_raw")).as("lam"),
        q6(col("lam_raw") / lit(muPerDay)).as("a"))
    val kf = base
      .withColumn("k", explode(sequence(lit(0),
        ceil(col("a")).cast("int") + 5)))
      .withColumn("lnf", sum(when(col("k") > 0, log(col("k")))
        .otherwise(lit(0.0))).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("term", exp(col("k") * log(col("a")) - col("lnf")))
    val grid = base.withColumn("c", explode(sequence(lit(1),
      ceil(col("a")).cast("int") + 5)))
    grid.join(kf.select(col("k"), col("term")), col("k") <= col("c"))
      .groupBy(col("c"), col("lam"), col("a"))
      .agg(sum(col("term")).as("s"),
        max(when(col("k") === col("c"), col("term")).otherwise(lit(0.0)))
          .as("tc"))
      .select(col("c").cast("long").as("servers"),
        round4eps(col("a")).as("offered_load"),
        round4eps(col("tc") / col("s")).as("p_block"),
        round4eps(col("a") * (lit(1.0) - col("tc") / col("s")))
          .as("carried_load"))
      .orderBy(col("servers"))
  }

  /** M/G/1 waiting time via Pollaczek-Khinchine — the single-server
    * queue with a GENERAL service distribution, which is exactly what
    * the order stream provides: service time = line count / μ (the
    * documented synthetic service model), so E[S] and E[S²] come from
    * the REAL per-order size distribution rather than an exponential
    * assumption. Wq = λE[S²]/(2(1−ρ)); the P-K formula is the whole
    * point — only two service moments matter, not the shape.
    *
    * Scale shape: one order-grain line-count collapse (the only
    * shuffle), then a single moment aggregation; λ and the moments
    * are 1e-6-quantized before the closed form. */
  def mg1Wait(s: SparkSession, dir: String,
      muPerDay: Double = 100.0): DataFrame = {
    def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val perOrder = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"))
    val lam = Tables.orders(s, dir)
      .agg((count(lit(1)) /
        (datediff(max(col("o_orderdate")), min(col("o_orderdate"))) + 1))
        .as("lam_raw"))
      .select(q6(col("lam_raw")).as("lam"))
    perOrder
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("n_lines")).as("sl"),
        sum(col("n_lines") * col("n_lines")).as("sll"))
      .crossJoin(broadcast(lam))
      .withColumn("es", q6(col("sl") / col("n") / lit(muPerDay)))
      .withColumn("es2", q6(col("sll") / col("n") /
        lit(muPerDay * muPerDay)))
      .withColumn("rho", col("lam") * col("es"))
      .withColumn("wq", col("lam") * col("es2") /
        (lit(2.0) * (lit(1.0) - col("rho"))))
      .select(col("n").cast("long").as("n_orders"),
        col("lam").as("lambda_day"),
        round4eps(col("es")).as("es_days"),
        round4eps(col("es2")).as("es2_days2"),
        round4eps(col("rho")).as("rho"),
        round4eps(col("wq")).as("wq_days"),
        round4eps(col("lam") * col("wq")).as("lq_orders"),
        round4eps(col("wq") + col("es")).as("w_days"))
  }
}
