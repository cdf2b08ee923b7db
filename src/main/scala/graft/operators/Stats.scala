package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Closed-form statistical modeling operators — the model-fitting
  * family that runs AFTER the hypothesis-test screens (Behavior.scala)
  * and BEFORE any iterative ML: every fit here reduces to one or two
  * moment aggregations plus scalar algebra, so each is a single
  * map-side-combined pass over the corpus regardless of scale. The
  * reference's dbt marts stop at grouped sums
  * (`models/marts/fct_sales_summary.sql`); these are the next layer a
  * training-data pipeline bolts on top of the same tables.
  *
  * Cross-engine parity discipline (see Rounding.scaladoc): inputs that
  * feed further arithmetic are quantized with round4eps on BOTH
  * engines; fitted coefficients are computed on FIXED-CONSTANT-scaled
  * predictors so every intermediate stays O(1) and the final round4
  * absorbs ulp drift; ranked outputs rank on the ROUNDED value with a
  * unique key tie-break so top-k cutoffs are deterministic.
  */
object Stats {

  /** Multiple linear regression (two predictors + intercept) fitted in
    * closed form via the normal equations — net line revenue modeled
    * on quantity and discount, per return-flag segment:
    * rev = b0 + b1*quantity + b2*discount.
    *
    * Scale shape: ONE moment aggregation (n, Σx1, Σx2, Σy, Σx1²,
    * Σx1x2, Σx2², Σx1y, Σx2y, Σy²) with full map-side combine — the
    * shuffle carries 10 doubles per (segment × map task), then the
    * 3×3 normal system collapses to a 2×2 Cramer solve on the
    * segment-bounded frame. This is the textbook 100 TB regression:
    * no gradient steps, no driver collect, no second pass. Predictors
    * are pre-scaled by fixed constants (quantity→(x−25)/25,
    * discount→(x−0.05)/0.05, rev→/50000) so the centered moments are
    * O(n) sums of O(1) terms — the Cramer cancellation never sees
    * 1e12-magnitude sums, keeping the 4-decimal output parity-stable.
    */
  def olsMulti(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("seg"),
      ((col("l_quantity") - lit(25.0)) / lit(25.0)).as("x1"),
      ((col("l_discount") - lit(0.05)) / lit(0.05)).as("x2"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) /
        lit(50000.0)).as("y"))
    val m = li.groupBy(col("seg")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val cyy = col("syy") - col("sy") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val b1s = (c1y * c22 - c2y * c12) / det
    val b2s = (c11 * c2y - c12 * c1y) / det
    val b0s = (col("sy") - b1s * col("s1") - b2s * col("s2")) / col("n")
    val r2 = lit(1.0) - (cyy - b1s * c1y - b2s * c2y) / cyy
    m.select(col("seg"), col("n").cast("long").as("n"),
        // unscale: y=50000·ys, x1=25·x1s+25, x2=0.05·x2s+0.05
        round4eps(lit(50000.0) * b0s - lit(50000.0) * b1s -
          lit(50000.0) * b2s).as("b0"),
        round4eps(lit(2000.0) * b1s).as("b_quantity"),
        round4eps(lit(1000000.0) * b2s).as("b_discount"),
        round4eps(r2).as("r2"))
      .orderBy(col("seg"))
  }

  /** Theil T inequality index of customer revenue per region — the
    * decomposable complement to the Gini gate (Relational.giniRevenue):
    * T = Σᵢ (xᵢ/(nμ))·ln(xᵢ/μ), computed via the sufficient-statistic
    * identity T = Σx·lnx / Σx − ln(Σx/n) so no row ever sees the mean.
    *
    * Scale shape: customer totals in one key-partitioned aggregate
    * (quantized before the logs so both engines take ln of identical
    * doubles), then a region-keyed moment aggregate (n, Σx, Σx·lnx) —
    * two shuffles total, both map-side combined; the region frame is
    * dimension-bounded. Unlike Gini, Theil needs NO ranking at any
    * scale — it is the inequality measure you can actually compute on
    * 100 TB in one pass. */
  def theilIndex(s: SparkSession, dir: String): DataFrame = {
    val custRev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(round4eps(sum(col("o_totalprice"))).as("x"))
    val dims = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)
        .select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"))
    custRev.join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("region"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("x")).as("sx"),
        sum(col("x") * log(col("x"))).as("sxlnx"))
      .select(col("region"), col("n_cust"),
        round4eps(col("sx") / col("n_cust")).as("mean_rev"),
        round4eps(col("sxlnx") / col("sx") -
          log(col("sx") / col("n_cust"))).as("theil_t"))
      .orderBy(col("region"))
  }

  /** CUSUM level-shift scan over the daily order-revenue series — the
    * classic retrospective changepoint screen: Cₜ = Σ_{u≤t}(rᵤ−μ) /
    * (σ·√n), whose extremum locates the most likely mean shift. Top
    * days by |C| are the changepoint candidates.
    *
    * Scale shape: the corpus collapses to the DAILY grain in one
    * shuffle (calendar-bounded thereafter — a few thousand rows at ANY
    * corpus size); the cumulative sum is one ordered-window pass over
    * that bounded frame, so the prefix sums are computed in the SAME
    * order on both engines over round4eps-quantized dailies — only μ
    * and σ carry summation-order ulp drift, and C is normalized so
    * that drift stays relative. Ranking is on the ROUNDED statistic
    * with the day as tie-break: the top-k cutoff cannot flip on ulp.
    * Top-k is TakeOrderedAndProject, not a global row_number. */
  def cusumRevenue(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
      .persistMemDisk
    // pin μ and σ at 2 decimals on BOTH engines: the prefix sum
    // multiplies any μ drift by t, so μ must be bit-identical — the
    // quantized dailies then difference and accumulate identically
    def q2(c: Column): Column =
      floor(c * lit(100) + lit(0.5) + lit(1e-6)) / lit(100)
    val sc = daily.agg(q2(avg(col("rev"))).as("mu"),
      q2(stddev_pop(col("rev"))).as("sigma"),
      count(lit(1)).cast("double").as("n"))
    // calendar-bounded frame: one row per day
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(sc))
      .withColumn("c", sum(col("rev") - col("mu")).over(w) /
        (col("sigma") * sqrt(col("n"))))
      .select(col("d"), col("rev"),
        round4eps(col("c")).as("cusum"),
        round4eps(abs(col("c"))).as("abs_cusum"))
      .orderBy(col("abs_cusum").desc, col("d"))
      .limit(k)
  }

  /** Mahalanobis outlier scan over the 2-feature customer profile
    * (order count, total spend) — multivariate outliers that neither
    * marginal z-score catches (the high-count/low-spend account): d² =
    * zᵀΣ⁻¹z with the 2×2 sample covariance inverted in closed form.
    *
    * Scale shape: profile aggregate (key-partitioned, map-side
    * combined) → ONE scalar moment aggregate for the covariance →
    * broadcast scalars back over the profile frame → distributed
    * top-k (TakeOrderedAndProject — never a global window, never a
    * driver collect). The 2×2 inverse is Cramer arithmetic in the
    * select; d² is scale-free so ulp drift in the moments stays
    * relative and the 4-decimal round holds. */
  def mahalanobisOutliers(s: SparkSession, dir: String, k: Int = 15)
      : DataFrame = {
    val prof = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("double").as("f1"),
        round4eps(sum(col("o_totalprice"))).as("f2"))
      .persistMemDisk
    val m = prof.agg(
      count(lit(1)).cast("double").as("n"),
      avg(col("f1")).as("m1"), avg(col("f2")).as("m2"),
      sum(col("f1") * col("f1")).as("s11"),
      sum(col("f1") * col("f2")).as("s12"),
      sum(col("f2") * col("f2")).as("s22"))
    val c11 = (col("s11") - col("n") * col("m1") * col("m1")) / (col("n") - 1)
    val c12 = (col("s12") - col("n") * col("m1") * col("m2")) / (col("n") - 1)
    val c22 = (col("s22") - col("n") * col("m2") * col("m2")) / (col("n") - 1)
    val det = c11 * c22 - c12 * c12
    val dx1 = col("f1") - col("m1")
    val dx2 = col("f2") - col("m2")
    val d2 = (c22 * dx1 * dx1 - lit(2.0) * c12 * dx1 * dx2 +
      c11 * dx2 * dx2) / det
    prof.crossJoin(broadcast(m))
      .select(col("o_custkey").as("custkey"),
        col("f1").cast("long").as("n_orders"),
        col("f2").as("revenue"),
        round4eps(d2).as("mahalanobis_d2"))
      .orderBy(col("mahalanobis_d2").desc, col("custkey"))
      .limit(k)
  }

  /** Isotonic (monotone-increasing) regression of return rate on
    * discount level, via the MINIMAX characterization instead of the
    * sequential PAVA sweep: ŷᵢ = min_{t≥i} max_{s≤i} wavg(s..t).
    * PAVA is an inherently serial pointer algorithm; the minimax form
    * is pure joins/aggregates over the LEVEL-bounded frame (11 distinct
    * discounts → 11³ interval terms at ANY corpus size), so the corpus
    * pass is one grouped count and monotone calibration never touches
    * a driver loop. Interval means are ratios of INTEGER sums —
    * bit-identical across engines with no quantization.
    * (The same collapse-to-levels trick as the Spearman/Kendall gates:
    * the fit only depends on the level sufficient statistics.) */
  def isotonicReturnRate(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(s, dir)
      .groupBy(col("l_discount").as("d"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .persistMemDisk
    val iv = pts.select(col("d").as("ds")).crossJoin(
        pts.select(col("d").as("dt")))
      .filter(col("ds") <= col("dt"))
    val wavg = iv.join(pts, col("d").between(col("ds"), col("dt")))
      .groupBy(col("ds"), col("dt"))
      .agg((sum(col("r")).cast("double") /
        sum(col("n")).cast("double")).as("a"))
    val inner = pts.select(col("d"), col("n"), col("r"))
      .join(wavg, col("ds") <= col("d") && col("d") <= col("dt"))
      .groupBy(col("d"), col("n"), col("r"), col("dt"))
      .agg(max(col("a")).as("mx"))
    inner.groupBy(col("d"), col("n"), col("r"))
      .agg(min(col("mx")).as("fit"))
      .select(col("d"), col("n"),
        round4eps(col("r").cast("double") / col("n")).as("rate"),
        round4eps(col("fit")).as("iso_fit"))
      .orderBy(col("d"))
  }

  /** 3-level unnormalized Haar wavelet decomposition of the monthly
    * revenue series (first 64 months): aₗ[i] = (aₗ₋₁[2i]+aₗ₋₁[2i+1])/2,
    * dₗ[i] = (aₗ₋₁[2i]−aₗ₋₁[2i+1])/2 — the multi-resolution screen
    * behind wavelet-compressed series stores and burst detection (a
    * large |d| at level ℓ = an event at the 2ℓ-month scale).
    *
    * Scale shape: corpus → monthly grain in one shuffle; each level is
    * a pair-bucketed aggregate over the CALENDAR-bounded frame (64 →
    * 32 → 16 → 8 rows), exact arithmetic on round4-quantized monthly
    * sums — the three "iterations" are three trivial stages over
    * ≤64 rows, not passes over data. */
  def haarWavelet(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate"))).as("m"))
      .agg(round4eps(sum(col("o_totalprice"))).as("v"))
    // dense index 0..63 over the first 64 months (calendar-bounded)
    val w = Window.orderBy(col("m"))
    val idx = monthly
      .withColumn("i", row_number().over(w) - lit(1))
      .filter(col("i") < 64)
      .select(col("i").cast("long").as("i"), col("v"))
    def level(prev: DataFrame): DataFrame = prev
      .groupBy(floor(col("i") / 2).as("i"))
      .agg(((max(when(col("i") % 2 === 0, col("v"))) +
        max(when(col("i") % 2 === 1, col("v")))) / lit(2.0)).as("v"),
        ((max(when(col("i") % 2 === 0, col("v"))) -
          max(when(col("i") % 2 === 1, col("v")))) / lit(2.0)).as("detail"))
    val l1 = level(idx).persistMemDisk
    val l2 = level(l1.select(col("i"), col("v")))
      .persistMemDisk
    val l3 = level(l2.select(col("i"), col("v")))
    l1.select(lit(1).as("level"), col("i"), col("v"), col("detail"))
      .unionAll(l2.select(lit(2).as("level"), col("i"), col("v"),
        col("detail")))
      .unionAll(l3.select(lit(3).as("level"), col("i"), col("v"),
        col("detail")))
      .select(col("level"), col("i"),
        round4eps(col("v")).as("approx"),
        round4eps(col("detail")).as("detail"))
      .orderBy(col("level"), col("i"))
  }

  /** SAX symbolization of the monthly revenue series — z-normalize,
    * then cut at the standard-normal quartile breakpoints
    * (−0.6745, 0, 0.6745) into a 4-letter alphabet a..d: the discrete
    * representation under which series become strings (motif mining,
    * suffix-array indexing, hashing whole series). One monthly
    * collapse, one scalar moment aggregate, one broadcast-back pass —
    * the symbols are a codegen CASE over the calendar-bounded frame. */
  def saxSymbols(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate"))).as("m"))
      .agg(round4eps(sum(col("o_totalprice"))).as("v"))
      .persistMemDisk
    val mom = monthly.agg(avg(col("v")).as("mu"),
      stddev_pop(col("v")).as("sigma"))
    monthly.crossJoin(broadcast(mom))
      .withColumn("z", (col("v") - col("mu")) / col("sigma"))
      .select(col("m"), round4eps(col("z")).as("z"),
        when(col("z") < -0.6745, "a")
          .when(col("z") < 0.0, "b")
          .when(col("z") < 0.6745, "c")
          .otherwise("d").as("symbol"))
      .orderBy(col("m"))
  }

  /** Deterministic multinomial bootstrap CI for mean customer revenue —
    * the Poisson-bootstrap idiom that actually runs at 100 TB: instead
    * of B resamples of N rows (impossible to materialize), each row
    * draws an independent pseudo-count per replicate and B weighted
    * means come out of ONE pass with map-side partial aggregation
    * (Kleiner et al.'s scalable-bootstrap family). The count is
    * Binomial(4, 1/4) (mean 1, ≈Poisson(1)) derived from md5 hex
    * digits of (custkey, rep) — fully deterministic and identical in
    * any engine with md5, which is what makes the gate cross-engine
    * exact: weights are integers, replicate means are quantized before
    * the percentile so both engines interpolate identical doubles.
    *
    * Scale: B=32 replicates → a 32× map-side row amplification
    * (generated, never shuffled wide: the shuffle carries 32 partial
    * sums per map task), then percentiles over the B-bounded frame. */
  def bootstrapCi(s: SparkSession, dir: String, reps: Int = 32): DataFrame = {
    val cust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(round4eps(sum(col("o_totalprice"))).as("x"))
    val amplified = cust
      .select(col("o_custkey"), col("x"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("h", md5(concat(col("o_custkey").cast("string"),
        lit(":"), col("rep").cast("string"))))
      .withColumn("w",
        (0 until 4).map(i => when(substring(col("h"), i + 1, 1)
          .isin("0", "1", "2", "3"), 1L).otherwise(0L)).reduce(_ + _))
    // replicate means are re-quantized at 4 decimals BEFORE the
    // percentile so both engines interpolate identical doubles
    val repMeans = amplified.groupBy(col("rep"))
      .agg(round4eps(sum(col("w") * col("x")) / sum(col("w")))
        .as("mean_rev"))
    repMeans.agg(count(lit(1)).as("n_reps"),
        round4eps(avg(col("mean_rev"))).as("boot_mean"),
        round4eps(expr("percentile(mean_rev, 0.025)")).as("ci_lo"),
        round4eps(expr("percentile(mean_rev, 0.975)")).as("ci_hi"))
  }

  /** Holt-Winters additive seasonal forecast (period 12) of monthly
    * revenue — the triple-exponential extension of the Holt gate
    * (Relational.holtForecast): level, trend AND a 12-slot seasonal
    * state, α=0.3 β=0.1 γ=0.2. The corpus collapses to the monthly
    * grain in one shuffle; the fold walks the CALENDAR-bounded series
    * (~80 points at any corpus size) with every state update
    * q6-quantized, so the DuckDB recursive-CTE oracle walking the
    * same trajectory is bit-identical. Seasonal init: sᵢ = yᵢ − l₀
    * over the first year; trend init: year-over-year mean delta / 12. */
  def holtWinters(s: SparkSession, dir: String,
      alpha: Double = 0.3, beta: Double = 0.1,
      gamma: Double = 0.2): DataFrame = {
    def q6(v: Double): Double = math.floor(v * 1e6 + 0.5 + 1e-6) / 1e6
    def q4(v: Double): Double = math.floor(v * 1e4 + 0.5 + 1e-6) / 1e4
    // init states are pinned at 2 decimals: they come from float SUMS
    // whose accumulation order differs across engines, so the pin
    // must sit far above the ulp drift; every later update is
    // arithmetic on identical doubles and q6 keeps it identical
    def q2(v: Double): Double = math.floor(v * 100 + 0.5 + 1e-6) / 100
    val xs = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate"))).as("m"))
      .agg(round4eps(sum(col("o_totalprice"))).as("v"))
      .orderBy(col("m"))
      .collect().map(_.getDouble(1))
    require(xs.length >= 24 && xs.length <= 10000,
      s"holtWinters: ${xs.length} monthly points — expected a " +
        "calendar-bounded series with ≥ 2 seasons")
    val n = xs.length
    var l = q2(xs.take(12).sum / 12)
    var b = q2((xs.slice(12, 24).sum / 12 - xs.take(12).sum / 12) / 12)
    val seas = Array.tabulate(12)(i => q6(xs(i) - l))
    var t = 12
    while (t < n) {
      val slot = t % 12
      val nl = q6(alpha * (xs(t) - seas(slot)) + (1 - alpha) * (l + b))
      val nb = q6(beta * (nl - l) + (1 - beta) * b)
      seas(slot) = q6(gamma * (xs(t) - nl) + (1 - gamma) * seas(slot))
      l = nl; b = nb
      t += 1
    }
    import s.implicits._
    (1 to 12).map(h =>
      (h, q4(l + h * b + seas((n + h - 1) % 12))))
      .toDF("h", "forecast")
  }

  /** Pairwise DTW distances between the regions' monthly revenue
    * curves — elastic alignment scores phase-shifted seasonality as
    * similar where Euclidean would not (see DtwKernel). The corpus
    * collapses to (region × month) in one keyed aggregate; per-region
    * series become bounded arrays (array_sort(struct) — collect order
    * never matters); the 10 region pairs then invoke the native
    * O(n·m) DTW expression, a constant-size kernel per pair. The
    * DuckDB oracle walks the SAME padded DP cell-by-cell in a
    * recursive CTE over q6-identical inputs — bit-exact parity. */
  def regionDtw(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("m"))
      .agg(round4eps(sum(col("o_totalprice"))).as("v"))
    val series = monthly.groupBy(col("region"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("v")))),
        x => x.getField("v")).as("s"))
      .persistMemDisk
    val a = series.select(col("region").as("region_a"), col("s").as("sa"))
    val b = series.select(col("region").as("region_b"), col("s").as("sb"))
    a.crossJoin(b).filter(col("region_a") < col("region_b"))
      .select(col("region_a"), col("region_b"),
        size(col("sa")).cast("long").as("n_a"),
        size(col("sb")).cast("long").as("n_b"),
        round4eps(graft.functions.DtwFunctions
          .dtwDistance(col("sa"), col("sb"))).as("dtw"))
      .orderBy(col("region_a"), col("region_b"))
  }

  /** Two-sample Kolmogorov-Smirnov on a fixed centile grid — order
    * totals of URGENT-priority orders vs the rest, values bucketed to
    * the fixed 100-unit grid BEFORE the ECDFs: D = max|F₁−F₂| over
    * grid points, λ = D·√(n₁n₂/(n₁+n₂)). The exact KS needs a global
    * rank (the same reason exact percentiles don't scale); on the
    * fixed grid the corpus collapses to one bucket-keyed count and the
    * ECDF walk is a window over the GRID-bounded frame (≤ ~4500 rows
    * at any corpus size — o_totalprice's range, not the row count).
    * Counts are integers, so the cumulative ratios are bit-identical
    * across engines. Output: the argmax grid point and the statistics
    * (top-1 by rounded gap, bucket tie-break). */
  def ksTest(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bucket"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("u"))
      .groupBy(col("bucket"))
      .agg(sum(col("u")).as("n1"), sum(lit(1L) - col("u")).as("n2"))
      .persistMemDisk
    val tot = b.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    // grid-bounded frame: one row per 100-unit price bucket
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.crossJoin(broadcast(tot))
      .withColumn("c1", sum(col("n1")).over(w))
      .withColumn("c2", sum(col("n2")).over(w))
      .withColumn("gap", abs(col("c1").cast("double") / col("t1") -
        col("c2").cast("double") / col("t2")))
      .select(col("bucket"), col("t1").as("n_urgent"),
        col("t2").as("n_rest"),
        round4eps(col("gap")).as("ks_d"),
        round4eps(col("gap") * sqrt(col("t1") * col("t2") /
          (col("t1") + col("t2")).cast("double"))).as("ks_lambda"))
      .orderBy(col("ks_d").desc, col("bucket"))
      .limit(1)
  }

  /** Two-sample Cramér–von Mises statistic (urgent vs rest order
    * totals on the same fixed $100 grid as [[ksTest]]): T =
    * n1·n2/N² · Σ_j (n1ⱼ+n2ⱼ)·(F̂1ⱼ−F̂2ⱼ)² — where KS reads only the
    * single worst ECDF gap, CvM integrates ALL of them, catching
    * distribution shifts KS's max misses. Integer cumulative counts
    * make the ECDFs bit-identical; the grid-bounded window never
    * scales with the corpus. */
  def cramerVonMises(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bucket"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("u"))
      .groupBy(col("bucket"))
      .agg(sum(col("u")).as("n1"), sum(lit(1L) - col("u")).as("n2"))
      .persistMemDisk
    val tot = b.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    val w = Window.orderBy(col("bucket")) // grid-bounded frame
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = col("c1").cast("double") / col("t1") -
      col("c2").cast("double") / col("t2")
    b.crossJoin(broadcast(tot))
      .withColumn("c1", sum(col("n1")).over(w))
      .withColumn("c2", sum(col("n2")).over(w))
      .agg(max(col("t1")).as("n_urgent"), max(col("t2")).as("n_rest"),
        round4eps(
          max(col("t1")).cast("double") * max(col("t2")) /
          ((max(col("t1")) + max(col("t2"))).cast("double") *
            (max(col("t1")) + max(col("t2")))) *
          sum((col("n1") + col("n2")) * gap * gap)).as("cvm_t"))
  }

  /** Energy distance between the urgent and non-urgent order-total
    * distributions: D² = 2E|X−Y| − E|X−X'| − E|Y−Y'|, the
    * metric-space two-sample statistic (zero iff the distributions
    * are equal) that sees differences in ANY moment, not just
    * location.
    *
    * Scale posture: both samples collapse to the $1000-bucket value
    * distribution first, so the pairwise |vᵢ−vⱼ| sums run over
    * VALUE-DOMAIN² cell pairs (bounded at any corpus size — the
    * kendall-tau discipline), and every term n_i·n_j·|Δv| is an exact
    * integer: the sums are order-independent and bit-identical
    * across engines. */
  def energyDistance(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 1000).cast("long").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("u"))
      .groupBy(col("v"))
      .agg(sum(col("u")).as("n1"), sum(lit(1L) - col("u")).as("n2"))
      .persistMemDisk
    val o = b.select(col("v").as("v2"), col("n1").as("m1"),
      col("n2").as("m2"))
    val pairs = b.crossJoin(o)
      .select(abs(col("v") - col("v2")).cast("double").as("dv"),
        col("n1"), col("n2"), col("m1"), col("m2"))
    val sums = pairs.agg(
      sum(col("n1") * col("m2") * col("dv")).as("sxy"),
      sum(col("n1") * col("m1") * col("dv")).as("sxx"),
      sum(col("n2") * col("m2") * col("dv")).as("syy"))
    val tot = b.agg(sum(col("n1")).cast("double").as("t1"),
      sum(col("n2")).cast("double").as("t2"))
    sums.crossJoin(broadcast(tot))
      .select(col("t1").cast("long").as("n_urgent"),
        col("t2").cast("long").as("n_rest"),
        round4eps(col("sxy") / (col("t1") * col("t2"))).as("e_cross"),
        round4eps(col("sxx") / (col("t1") * col("t1"))).as("e_within_x"),
        round4eps(col("syy") / (col("t2") * col("t2"))).as("e_within_y"),
        round4eps(lit(2.0) * col("sxy") / (col("t1") * col("t2")) -
          col("sxx") / (col("t1") * col("t1")) -
          col("syy") / (col("t2") * col("t2"))).as("energy_stat"))
  }

  /** Survey raking (iterative proportional fitting): calibrate the
    * EARLY-era (region × priority) order counts so both margins match
    * the full-period targets — two full IPF sweeps (row, col, row,
    * col), each re-normalization q6-pinned so both engines walk the
    * identical weight trajectory. The weighting step every
    * survey/panel pipeline runs before estimation.
    *
    * Scale shape: the corpus collapses to the 5×5 cell table and two
    * margin rollups; IPF itself is four keyed window-normalizations
    * over that bounded frame. */
  def rakingIpf(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("g"), col("o_orderpriority").as("p"),
        col("o_orderdate").cast("date").as("d"))
      .persistMemDisk
    val bounds = o.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(date_add(col("d0"),
        floor(datediff(col("d1"), col("d0")) / lit(2.0)).cast("int"))
        .as("mid"))
    val early = o.crossJoin(broadcast(bounds))
      .filter(col("d") <= col("mid"))
      .groupBy(col("g"), col("p"))
      .agg(count(lit(1)).cast("double").as("w0"))
    val en = early.agg(sum(col("w0")).as("en"))
    val fullN = o.agg(count(lit(1)).cast("double").as("fn"))
    val rowT = o.groupBy(col("g")).agg(count(lit(1)).cast("double").as("fr"))
      .crossJoin(broadcast(fullN)).crossJoin(broadcast(en))
      .select(col("g"), round6eps(col("fr") * col("en") / col("fn")).as("rt"))
    val colT = o.groupBy(col("p")).agg(count(lit(1)).cast("double").as("fc"))
      .crossJoin(broadcast(fullN)).crossJoin(broadcast(en))
      .select(col("p"), round6eps(col("fc") * col("en") / col("fn")).as("ct"))
    val wg = Window.partitionBy(col("g"))
    val wp = Window.partitionBy(col("p"))
    val ipf = early
      .join(broadcast(rowT), "g").join(broadcast(colT), "p")
      .withColumn("w1", round6eps(col("w0") * col("rt") /
        sum(col("w0")).over(wg)))
      .withColumn("w2", round6eps(col("w1") * col("ct") /
        sum(col("w1")).over(wp)))
      .withColumn("w3", round6eps(col("w2") * col("rt") /
        sum(col("w2")).over(wg)))
      .withColumn("w4", round6eps(col("w3") * col("ct") /
        sum(col("w3")).over(wp)))
    ipf.select(col("g").as("region"), col("p").as("priority"),
        col("w0").cast("long").as("n_early"),
        round4eps(col("w4")).as("w_calibrated"),
        round4eps(col("w4") / col("w0")).as("rel_weight"))
      .orderBy(col("region"), col("priority"))
  }

  /** Wilcoxon signed-rank test on paired weekly revenues of two
    * adjacent full years (week-of-year is the pairing key): W⁺ over
    * the signed ranks of the quantized differences, with the
    * tie-corrected normal approximation — the paired, distribution-
    * free "did year 2 move" test beside the unpaired Mann-Whitney.
    *
    * Scale posture: the corpus collapses to ≤52 (week, year) cells;
    * the rank window runs over that calendar-bounded frame (average
    * ranks for tied |d|, zeros dropped per the standard treatment). */
  def wilcoxonSignedRank(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("y"),
        weekofyear(col("o_orderdate")).as("wk"), col("o_totalprice"))
    val y0 = o.agg((min(col("y")) + 1).as("ya"))
    val weekly = o.crossJoin(broadcast(y0))
      .filter(col("y") === col("ya") || col("y") === col("ya") + 1)
      .groupBy(col("wk"), (col("y") === col("ya")).as("first"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val a = weekly.filter(col("first"))
      .select(col("wk"), col("rev").as("ra"))
    val bb = weekly.filter(!col("first"))
      .select(col("wk").as("wk2"), col("rev").as("rb"))
    val d = a.join(bb, col("wk") === col("wk2"))
      .select(col("wk"), round4eps(col("rb") - col("ra")).as("d"))
      .filter(col("d") =!= 0.0)
      .withColumn("ad", abs(col("d")))
    // average ranks of |d| over the ≤52-row frame via the
    // distribution collapse (ties get the midrank)
    val cells = d.groupBy(col("ad")).agg(count(lit(1)).as("t"))
    val w = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = cells
      .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
      .select(col("ad"), col("t"),
        (col("cb") + (col("t") + 1) / lit(2.0)).as("midrank"))
    val stats = d.join(broadcast(ranked), "ad")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(when(col("d") > 0, col("midrank")).otherwise(0.0)).as("wplus"),
        sum(when(col("d") < 0, col("midrank")).otherwise(0.0)).as("wminus"))
    val ties = ranked.agg(
      coalesce(sum(when(col("t") > 1,
        col("t").cast("double") * col("t") * col("t") - col("t"))),
        lit(0.0)).as("tie3"))
    stats.crossJoin(broadcast(ties))
      .select(col("n").cast("long").as("n_pairs"),
        round4eps(col("wplus")).as("w_plus"),
        round4eps(col("wminus")).as("w_minus"),
        round4eps((col("wplus") - col("n") * (col("n") + 1) / 4) /
          sqrt(col("n") * (col("n") + 1) * (col("n") * 2 + 1) / 24 -
            col("tie3") / 48)).as("z_score"))
  }

  /** Friedman test across the five regions with calendar months as
    * blocks: within each month the regions' revenues are ranked (a
    * TOTAL order — ties broken by region name, so the ranking is
    * deterministic on both engines), χ²_F = 12n/(k(k+1))·Σ(R̄ⱼ −
    * (k+1)/2)² — the repeated-measures ANOVA twin for ranked data.
    *
    * Scale shape: one (month × region) rollup, a rank window
    * partitioned per month (k=5 rows each), and a region-grain
    * re-aggregate. */
  def friedmanRegions(s: SparkSession, dir: String): DataFrame = {
    val mr = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"),
        col("r_name").as("g"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val wm = Window.partitionBy(col("m"))
      .orderBy(col("rev"), col("g")) // total order: deterministic ranks
    val ranked = mr.withColumn("rk", row_number().over(wm))
    val rbar = ranked.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("nb"),
        avg(col("rk").cast("double")).as("rbar"))
      .persistMemDisk
    val kf = rbar.agg(count(lit(1)).cast("double").as("k"))
    rbar.crossJoin(broadcast(kf))
      .agg(max(col("nb")).cast("long").as("n_blocks"),
        max(col("k")).cast("long").as("k"),
        round4eps(lit(12.0) * max(col("nb")) /
          (max(col("k")) * (max(col("k")) + 1)) *
          sum((col("rbar") - (col("k") + lit(1.0)) / 2) *
            (col("rbar") - (col("k") + lit(1.0)) / 2)))
          .as("chi2_f"))
  }

  /** Tukey-HSD style pairwise comparisons of mean order totals across
    * the five regions: for each of the 10 pairs, the mean difference
    * and the studentized statistic q = |x̄ᵢ−x̄ⱼ| / √(MSE/2·(1/nᵢ+1/nⱼ))
    * with the pooled within-group MSE — the post-hoc that says WHICH
    * groups differ after ANOVA says "some do".
    *
    * Scale shape: one moment pass to the 5-row group frame; the pair
    * enumeration is k²-bounded; everything after is scalar algebra. */
  def tukeyHsd(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        avg(col("o_totalprice") / lit(1e3)).as("mu"),
        sum((col("o_totalprice") / lit(1e3)) *
          (col("o_totalprice") / lit(1e3))).as("s2"))
      .persistMemDisk
    val mse = g.agg((sum(col("s2") - col("n") * col("mu") * col("mu")) /
      (sum(col("n")) - count(lit(1)))).as("mse"))
    val o = g.select(col("g").as("g2"), col("n").as("n2"),
      col("mu").as("mu2"))
    g.join(o, col("g") < col("g2"))
      .crossJoin(broadcast(mse))
      .select(col("g").as("region_a"), col("g2").as("region_b"),
        round4eps((col("mu") - col("mu2")) * 1000).as("mean_diff"),
        round4eps(abs(col("mu") - col("mu2")) /
          sqrt(col("mse") / 2 * (lit(1.0) / col("n") +
            lit(1.0) / col("n2")))).as("q_stat"))
      .orderBy(col("region_a"), col("region_b"))
  }

  /** Realized volatility of daily revenue log-returns: σ of
    * ln(revₜ/revₜ₋₁), reported per-day and annualized (×√365), plus
    * the worst single-day log-return — the risk lens on a business
    * metric (how violently does it move, not where it is).
    *
    * Scale shape: one shuffle to the calendar-bounded daily grain,
    * one lag from one window sort, one moment pass over the returns.
    * Daily sums are quantized before the ratio so ln() sees identical
    * arguments on both engines. */
  def realizedVolatility(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val rets = daily
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(log(col("rev") / col("prev")).as("r"))
    rets.agg(count(lit(1)).cast("double").as("n"),
        sum(col("r")).as("sr"), sum(col("r") * col("r")).as("srr"),
        min(col("r")).as("worst"))
      .select(col("n").cast("long").as("n_returns"),
        round4eps(sqrt(col("srr") / col("n") -
          (col("sr") / col("n")) * (col("sr") / col("n"))))
          .as("daily_vol"),
        round4eps(sqrt(col("srr") / col("n") -
          (col("sr") / col("n")) * (col("sr") / col("n"))) *
          lit(math.sqrt(365.0))).as("annualized_vol"),
        round4eps(col("worst")).as("worst_log_return"))
  }

  /** Maximum drawdown of the daily revenue series: the deepest gap
    * below the running peak, with the peak and trough days — "how far
    * below its best has this metric ever fallen", the
    * metric-monitoring twin of the finance statistic.
    *
    * Scale shape: one prefix-max window over the calendar-bounded
    * daily frame, then a quantized argmax via min(struct). */
  def maxDrawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("peak", max(col("rev")).over(w))
      .withColumn("dd", round4eps((col("peak") - col("rev")) /
        col("peak")))
    scored.agg(min(struct((-col("dd")).as("nd"), col("d").as("d"),
        col("peak").as("pk"), col("rev").as("rv"))).as("w"))
      .select(col("w.d").as("trough_day"),
        round4eps(col("w.pk")).as("peak_rev"),
        round4eps(col("w.rv")).as("trough_rev"),
        (-col("w.nd")).as("max_drawdown"))
  }

  /** Value-at-Risk and conditional VaR (expected shortfall) of
    * day-over-day revenue changes at the 5% level: VaR = the exact
    * 5th-percentile change, CVaR = the mean of changes at or below
    * it — the "how bad is a bad day, and how bad are the bad days on
    * average" pair.
    *
    * Scale posture: changes are quantized then bucketed to $10k
    * integers, so the exact percentile comes from the
    * distribution-collapse cumulative counts (no sort, no buffering
    * percentile) and the tail mean is a conditional aggregate against
    * the broadcast cut. */
  def varCvar(s: SparkSession, dir: String, alpha: Double = 0.05):
      DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val chg = daily
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(floor((col("rev") - col("prev")) / 10000).cast("long")
        .as("v")) // $10k-bucketed change
      .persistMemDisk
    val cells = chg.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wg = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cc", sum(col("c")).over(wg))
      .withColumn("ng", sum(col("c")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val cut = cum.agg(min(when(col("cc") >=
      ceil(col("ng") * alpha), col("v"))).as("var_bucket"))
    chg.crossJoin(broadcast(cut))
      .agg(count(lit(1)).as("n_changes"),
        max(col("var_bucket")).as("vb"),
        round4eps(avg(when(col("v") <= col("var_bucket"),
          col("v").cast("double") * 10000))).as("cvar"))
      .select(col("n_changes"),
        (col("vb") * 10000).as("var_5pct"),
        col("cvar").as("cvar_5pct"))
  }

  /** Neyman optimal sample allocation across the five regions for a
    * fixed total sample (n = 1000): n_h ∝ N_h·σ_h (strata with more
    * rows AND more variance get more sample), beside the proportional
    * allocation for contrast — the survey-design step before any
    * stratified estimate. One moment pass to the strata-bounded
    * frame; σ uses the sample std with 2-decimal-pinned values so the
    * allocation ratios are parity-stable. */
  def neymanAllocation(s: SparkSession, dir: String, total: Int = 1000):
      DataFrame = {
    import graft.functions.Rounding.round6eps
    val g = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).cast("double").as("nh"),
        avg(col("o_totalprice") / lit(1e3)).as("mu"),
        sum((col("o_totalprice") / lit(1e3)) *
          (col("o_totalprice") / lit(1e3))).as("s2"))
      .select(col("region"), col("nh"),
        round6eps(sqrt((col("s2") - col("nh") * col("mu") * col("mu")) /
          (col("nh") - 1))).as("sd"))
      .persistMemDisk
    val tot = g.agg(sum(col("nh") * col("sd")).as("tw"),
      sum(col("nh")).as("tn"))
    g.crossJoin(broadcast(tot))
      .select(col("region"), col("nh").cast("long").as("n_rows"),
        round4eps(col("sd")).as("stratum_sd"),
        round4eps(lit(total.toDouble) * col("nh") * col("sd") /
          col("tw")).as("neyman_n"),
        round4eps(lit(total.toDouble) * col("nh") / col("tn"))
          .as("proportional_n"))
      .orderBy(col("region"))
  }

  /** Monthly seasonal indices by ratio-to-trend: each month's revenue
    * over its centered 12-month moving average, averaged per
    * calendar month and normalized to mean 1 — the month-of-year
    * twin of the day-of-week decomposition gate (an index of 1.15 =
    * "Julys run 15% hot"). All windows run on the calendar-bounded
    * monthly frame; ratios are quantized before the month-of-year
    * average. */
  def monthIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("m"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val w = Window.orderBy(col("m")) // calendar-bounded frame
    val trended = monthly
      .withColumn("trend", avg(col("rev")).over(w.rowsBetween(-6, 5)))
      .withColumn("nw", count(col("rev")).over(w.rowsBetween(-6, 5)))
      .filter(col("nw") === 12) // full centered windows only
      .select(month(col("m")).as("moy"),
        round6eps(col("rev") / col("trend")).as("ratio"))
    val raw = trended.groupBy(col("moy"))
      .agg(count(lit(1)).as("n_months"),
        round6eps(avg(col("ratio"))).as("raw_idx"))
      .persistMemDisk
    val norm = raw.agg(avg(col("raw_idx")).as("mean_idx"))
    raw.crossJoin(broadcast(norm))
      .select(col("moy").as("month"), col("n_months"),
        round4eps(col("raw_idx") / col("mean_idx")).as("seasonal_index"))
      .orderBy(col("month"))
  }

  /** Mutual information (and the marginal entropies) between the
    * quantity bucket and the return flag — the information-gain
    * feature screen that complements the WoE/IV gate: MI =
    * ΣΣ p(x,y)·ln(p(x,y)/(p(x)p(y))) in nats, from ONE contingency
    * count. All probabilities are ratios of integers — bit-identical
    * across engines; the 5×3 contingency frame is constant-bounded at
    * any corpus size. */
  def mutualInfo(s: SparkSession, dir: String): DataFrame = {
    val joint = Tables.lineitem(s, dir)
      .select(least(floor((col("l_quantity") - 1) / 10), lit(4))
        .cast("long").as("x"), col("l_returnflag").as("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("nxy"))
      .persistMemDisk
    val mx = joint.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
    val my = joint.groupBy(col("y")).agg(sum(col("nxy")).as("ny"))
    val n = joint.agg(sum(col("nxy")).as("n"))
    val p = col("nxy").cast("double") / col("n")
    val px = col("nx").cast("double") / col("n")
    val py = col("ny").cast("double") / col("n")
    joint.join(broadcast(mx), "x").join(broadcast(my), "y")
      .crossJoin(broadcast(n))
      .agg(max(col("n")).as("n_rows"),
        round4eps(sum(p * log(p / (px * py)))).as("mi_nats"),
        // Σ_xy p_xy·ln p_x = Σ_x p_x·ln p_x, so the marginals fall
        // out of the same joint pass
        round4eps(-sum(p * log(px))).as("h_x"),
        round4eps(-sum(p * log(py))).as("h_y"))
      .select(col("n_rows"), col("mi_nats"), col("h_x"), col("h_y"))
  }

  /** Cramér's V for brand × return-flag — the normalized effect size
    * the raw chi-square gate (Behavior.chiSquareTypeDow) lacks: V =
    * √(χ²/(n·(min(r,c)−1))), interpretable across table sizes. One
    * join-free contingency count over lineitem×part (broadcast dim),
    * then marginal joins on the 25×3-bounded frame. */
  def cramersV(s: SparkSession, dir: String): DataFrame = {
    val joint = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_returnflag"))
      .agg(count(lit(1)).cast("double").as("o"))
      .persistMemDisk
    val rt = joint.groupBy(col("p_brand")).agg(sum(col("o")).as("r"))
    val ct = joint.groupBy(col("l_returnflag")).agg(sum(col("o")).as("c"))
    val n = joint.agg(sum(col("o")).as("n"))
    val e = col("r") * col("c") / col("n")
    joint.join(broadcast(rt), "p_brand")
      .join(broadcast(ct), "l_returnflag")
      .crossJoin(broadcast(n))
      .agg(sum((col("o") - e) * (col("o") - e) / e).as("chi2"),
        countDistinct(col("p_brand")).as("nr"),
        countDistinct(col("l_returnflag")).as("nc"),
        max(col("n")).as("nn"))
      .select(col("nn").cast("long").as("n"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        round4eps(col("chi2")).as("chi2"),
        round4eps(sqrt(col("chi2") / (col("nn") *
          (least(col("nr"), col("nc")) - lit(1))))).as("cramers_v"))
  }

  /** Population stability index of the order-total distribution,
    * early era (orderdate < 1995-01-01) vs late — the tabular drift
    * metric run before retraining any model on refreshed data: PSI =
    * Σ(p₂−p₁)·ln(p₂/p₁) over FIXED 50k-wide value buckets (fixed
    * boundaries, not quantiles — the scalable drift posture: no
    * global sort, one bucket-keyed count; PSI > 0.2 ⇒ drift alarm).
    * Integer counts ⇒ exact ratios; per-bucket contributions plus the
    * total on every row of the bucket-bounded frame. */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .select(least(floor(col("o_totalprice") / 50000), lit(9))
        .cast("long").as("bucket"),
        when(col("o_orderdate") <
          lit(java.sql.Date.valueOf("1995-01-01")), 1L).otherwise(0L)
          .as("early"))
      .groupBy(col("bucket"))
      .agg(sum(col("early")).as("n1"), sum(lit(1L) - col("early")).as("n2"))
      .persistMemDisk
    val tot = b.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    // Laplace-smoothed shares (add 0.5 per bucket): an empty cell
    // must not produce ln(0) — and the two engines disagree on it
    // (Spark log(0) = NULL, DuckDB = -inf), so smoothing is also the
    // parity-safe formulation
    val p1 = (col("n1") + lit(0.5)) / (col("t1") + lit(5.0))
    val p2 = (col("n2") + lit(0.5)) / (col("t2") + lit(5.0))
    val contrib = (p2 - p1) * log(p2 / p1)
    val per = b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n1"), col("n2"),
        round4eps(contrib).as("psi_contrib"))
      .persistMemDisk
    val total = per.agg(sum(col("psi_contrib")).as("t"))
    per.crossJoin(broadcast(total))
      .select(col("bucket"), col("n1"), col("n2"), col("psi_contrib"),
        round4eps(col("t")).as("psi_total"))
      .orderBy(col("bucket"))
  }

  /** Split-conformal prediction interval for the line-revenue OLS
    * model — the distribution-free uncertainty wrapper modern ML
    * serving puts around ANY point model: fit on a calibration half
    * (deterministic md5 split, the same idiom as the temporal-embargo
    * gate), take the 0.9 quantile of absolute calibration residuals
    * as the interval half-width, report empirical coverage on the
    * held-out half (guaranteed ≥ 0.9 − 1/(n+1) by exchangeability).
    *
    * Scale shape: one moment pass for the fit (map-side combined),
    * one broadcast of the q6-PINNED coefficients (pinning makes every
    * residual bit-identical across engines), one residual-quantile
    * pass. The exact percentile here buffers the calibration
    * residuals per group; at 100 TB substitute approx_percentile or
    * the HashReservoir aggregate (same substitution note as the other
    * exact-percentile gates). */
  def conformalOls(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val li = Tables.lineitem(s, dir).select(
      substring(md5(concat(col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"))), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7").as("cal"),
      ((col("l_quantity") - lit(25.0)) / lit(25.0)).as("x1"),
      ((col("l_discount") - lit(0.05)) / lit(0.05)).as("x2"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) /
        lit(50000.0)).as("y"))
      .persistMemDisk
    val m = li.filter(col("cal")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val coef = m.select(q6(b1).as("b1"), q6(b2).as("b2"),
      q6((col("sy") - b1 * col("s1") - b2 * col("s2")) / col("n"))
        .as("b0"))
    val scored = li.crossJoin(broadcast(coef))
      .withColumn("r", abs(col("y") - (col("b0") +
        col("b1") * col("x1") + col("b2") * col("x2"))))
      .persistMemDisk
    val q = scored.filter(col("cal"))
      .agg(expr("percentile(r, 0.9)").as("q90"))
    scored.crossJoin(broadcast(q)).agg(
      sum(when(col("cal"), 1L).otherwise(0L)).as("n_cal"),
      sum(when(col("cal"), 0L).otherwise(1L)).as("n_test"),
      round4eps(max(col("q90")) * lit(50000.0)).as("width_rev"),
      round4eps(avg(when(!col("cal"),
        when(col("r") <= col("q90"), 1.0).otherwise(0.0))))
        .as("coverage"))
  }

  /** EXACT median by iterative range bisection — the production
    * answer to "exact percentiles don't scale": instead of one global
    * sort (or a per-group buffer), run O(log) rounds where each round
    * is ONE 1024-cell histogram aggregate (map-side combined, 1024
    * rows to the driver), narrowing the value range that contains the
    * target order statistic; finish exactly inside the final
    * micro-range. 60M rows at 100× take the same 3-4 rounds as 600k —
    * rounds scale with VALUE-DOMAIN resolution, not row count. This
    * is the substitution path the exact-percentile gates' scaladocs
    * reference, implemented. Even-n medians average the two middle
    * order statistics (the quantile_cont convention). */
  def exactMedianBisect(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.lineitem(s, dir)
      .select(col("l_extendedprice").as("x"))
      .persistMemDisk
    val n = v.count()
    require(n > 0)
    def kth(rank: Long): Double = {
      var lo = 0.0
      var hi = v.agg(max(col("x"))).head().getDouble(0) + 1.0
      var below = 0L
      var remaining = n
      var rounds = 0
      while (remaining > 4096 && rounds < 12) {
        val width = (hi - lo) / 1024.0
        val hist = v.filter(col("x") >= lo && col("x") < hi)
          .groupBy(least(floor((col("x") - lo) / width), lit(1023L))
            .cast("long").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1)
        var cum = below
        var target = -1L
        hist.foreach { case (b, c) =>
          if (target < 0) {
            if (cum + c >= rank) target = b else cum += c
          }
        }
        below = cum
        lo = lo + target * width
        hi = lo + width
        remaining = hist.find(_._1 == target).map(_._2).getOrElse(0L)
        rounds += 1
      }
      // exact finish inside the micro-range
      v.filter(col("x") >= lo && col("x") < hi)
        .orderBy(col("x"))
        .limit((rank - below).toInt)
        .orderBy(col("x").desc)
        .limit(1)
        .head().getDouble(0)
    }
    val med = if (n % 2 == 1) kth((n + 1) / 2)
      else (kth(n / 2) + kth(n / 2 + 1)) / 2.0
    import s.implicits._
    Seq((n, math.floor(med * 1e4 + 0.5 + 1e-6) / 1e4))
      .toDF("n", "median")
  }

  /** Quantile normalization of the regions' daily revenue onto the
    * POOLED distribution — the cross-cohort preprocessing step that
    * puts every region's series on one scale before comparison (the
    * genomics-born trick, here in its analytics form): each region's
    * rank-r day maps to the pooled value at the same rank fraction.
    *
    * Scale shape: the corpus collapses to the (region × day) grain
    * first, so every rank/window below runs on a CALENDAR×|regions|-
    * bounded frame. Ranks are integer row_numbers with (value, day)
    * tie-break; the target position is fixed-point arithmetic on
    * those integers — deterministic across engines; the mapped value
    * is an equality join on position. Output: per region, the mean
    * before and after (after ≈ pooled mean for every region). */
  def quantileNorm(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
      .persistMemDisk
    // per-region rank and pooled rank, both calendar-bounded windows
    val wr = Window.partitionBy(col("region"))
      .orderBy(col("rev"), col("d"))
    val ranked = daily
      .withColumn("r", row_number().over(wr).cast("long"))
      .withColumn("nr", count(lit(1)).over(
        Window.partitionBy(col("region"))).cast("long"))
    val pooled = daily
      .select(col("rev").as("prev"), col("region").as("pr"),
        col("d").as("pd"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("prev"), col("pr"), col("pd"))).cast("long"))
      .persistMemDisk
    val total = pooled.agg(max(col("pos")).as("np"))
    val mapped = ranked.crossJoin(broadcast(total))
      .withColumn("tpos", lit(1L) + floor(
        (col("r") - 1).cast("double") * (col("np") - 1) /
          (col("nr") - 1) + lit(0.5)).cast("long"))
      .join(pooled.select(col("pos"), col("prev")),
        col("tpos") === col("pos"))
    mapped.groupBy(col("region"))
      .agg(count(lit(1)).as("n_days"),
        round4eps(avg(col("rev"))).as("mean_orig"),
        round4eps(avg(col("prev"))).as("mean_mapped"))
      .orderBy(col("region"))
  }

  /** Best-split screen for a single decision stump — "which quantity
    * threshold best separates returned lines?": weighted Gini impurity
    * of (qty ≤ t | qty > t) for every integer threshold, minimized.
    * The first node of every tree ensemble, and the canonical
    * split-finding pattern at scale: the corpus collapses to the ~50
    * distinct quantity LEVELS (counts + class counts), cumulative
    * sums over that bounded frame give every candidate split's
    * left/right class totals in one window pass — the same
    * distribution-collapse trick as the Spearman/isotonic gates.
    * Impurities are ratios of integer counts (bit-identical); the
    * argmin ranks on the ROUNDED impurity with the threshold as
    * tie-break. */
  def decisionStump(s: SparkSession, dir: String): DataFrame = {
    val lv = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("q"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("nr"))
      .persistMemDisk
    val tot = lv.agg(sum(col("n")).as("tn"), sum(col("nr")).as("tr"))
    // level-bounded frame: one row per distinct quantity
    val w = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val splits = lv.crossJoin(broadcast(tot))
      .withColumn("nl", sum(col("n")).over(w))
      .withColumn("rl", sum(col("nr")).over(w))
      .filter(col("nl") < col("tn")) // right side must be non-empty
    val nl = col("nl").cast("double"); val rl = col("rl").cast("double")
    val nrt = (col("tn") - col("nl")).cast("double")
    val rr = (col("tr") - col("rl")).cast("double")
    val gl = lit(1.0) - (rl / nl) * (rl / nl) -
      ((nl - rl) / nl) * ((nl - rl) / nl)
    val gr = lit(1.0) - (rr / nrt) * (rr / nrt) -
      ((nrt - rr) / nrt) * ((nrt - rr) / nrt)
    val tnD = col("tn").cast("double"); val trD = col("tr").cast("double")
    val gBase = lit(1.0) - (trD / tnD) * (trD / tnD) -
      ((tnD - trD) / tnD) * ((tnD - trD) / tnD)
    splits.select(col("q").as("split_q"),
        col("nl").as("n_left"), (col("tn") - col("nl")).as("n_right"),
        round4eps(gBase).as("gini_base"),
        round4eps((nl * gl + nrt * gr) / tnD).as("gini_split"),
        round4eps(gBase - (nl * gl + nrt * gr) / tnD).as("gain"))
      .orderBy(col("gini_split"), col("split_q"))
      .limit(1)
  }

  /** Overdispersion screen — variance-to-mean ratio of DAILY event
    * counts per type (Poisson arrivals ⇒ index ≈ 1; bursty/clumped
    * traffic ⇒ ≫ 1, the first check before any rate model or anomaly
    * threshold). Moments come from Σn and Σn² over the
    * calendar-bounded daily frame — integer sums, so the index is
    * bit-identical across engines with no quantization at all. */
  def overdispersion(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("n")).as("sn"), sum(col("n") * col("n")).as("sn2"))
      .select(col("event_type"), col("n_days"),
        round4eps(col("sn").cast("double") / col("n_days"))
          .as("mean_daily"),
        round4eps((col("sn2").cast("double") / col("n_days") -
          (col("sn").cast("double") / col("n_days")) *
          (col("sn").cast("double") / col("n_days"))) /
          (col("sn").cast("double") / col("n_days")))
          .as("dispersion_index"))
      .orderBy(col("event_type"))
  }

  /** Decile lift/gains table for "quantity predicts returns" — the
    * model-evaluation readout next to AUC: score bins are FIXED
    * 5-unit quantity bands (descending = highest score first), each
    * row carries the bin's return rate, lift over the base rate, and
    * the cumulative capture of all returns. Fixed bins keep the
    * corpus pass to one bucket-keyed count; lift and capture are
    * ratios of integer counts, exact across engines. */
  def liftTable(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(s, dir)
      .select(least(floor((col("l_quantity") - 1) / 5), lit(9))
        .cast("long").as("bin"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("returns"))
      .persistMemDisk
    val tot = b.agg(sum(col("n")).as("tn"), sum(col("returns")).as("tr"))
    // bin-bounded frame (10 rows): cumulative from the top score down
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.crossJoin(broadcast(tot))
      .withColumn("cum_ret", sum(col("returns")).over(w))
      .select(col("bin"), col("n"), col("returns"),
        round4eps(col("returns").cast("double") / col("n")).as("rate"),
        round4eps((col("returns").cast("double") / col("n")) /
          (col("tr").cast("double") / col("tn"))).as("lift"),
        round4eps(col("cum_ret").cast("double") / col("tr"))
          .as("cum_capture"))
      .orderBy(col("bin").desc)
  }

  /** Jarque-Bera normality screen per return-flag segment on net line
    * revenue: skewness, excess kurtosis and the JB statistic
    * n/6·(S² + K²/4) from the first four raw moments.
    *
    * Scale shape: ONE moment aggregation (n, Σx..Σx⁴) with full
    * map-side combine — the shuffle carries five doubles per
    * (segment × map task); the central-moment algebra runs on the
    * segment-bounded frame. Revenue is pre-scaled by a fixed constant
    * (/50000) so Σx⁴ stays O(n) of O(1) terms — skewness and kurtosis
    * are scale-invariant, so the readout needs no unscale. */
  def jarqueBera(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("seg"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount")) /
        lit(50000.0)).as("x"))
    val m = x.groupBy(col("seg")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("s1"),
      sum(col("x") * col("x")).as("s2"),
      sum(col("x") * col("x") * col("x")).as("s3"),
      sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val mu = col("s1") / col("n")
    val m2 = col("s2") / col("n") - mu * mu
    val m3 = col("s3") / col("n") - lit(3.0) * mu * col("s2") / col("n") +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4") / col("n") - lit(4.0) * mu * col("s3") / col("n") +
      lit(6.0) * mu * mu * col("s2") / col("n") -
      lit(3.0) * mu * mu * mu * mu
    val skew = m3 / sqrt(m2 * m2 * m2)
    val exKurt = m4 / (m2 * m2) - lit(3.0)
    m.select(col("seg"), col("n").cast("long").as("n"),
        round4eps(skew).as("skewness"),
        round4eps(exKurt).as("excess_kurtosis"),
        round4eps(col("n") / lit(6.0) *
          (skew * skew + exKurt * exKurt / lit(4.0))).as("jb_stat"))
      .orderBy(col("seg"))
  }

  /** Ljung-Box portmanteau test on daily order revenue —
    * Q = n(n+2)·Σ_{k=1..7} ρ̂ₖ²/(n−k), the "is there ANY residual
    * autocorrelation" screen run after [[Relational.revenueAcf]]
    * flags individual lags. Same scale shape as the ACF: the corpus
    * collapses to the calendar-bounded daily grain in one shuffle;
    * one window sort over that frame produces all seven lags; each
    * ρ̂ₖ is 4-decimal-quantized before squaring so cross-engine
    * summation order cannot leak through the square. */
  def ljungBox(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val lagged = (1 to maxLag).foldLeft(daily) { (df, k) =>
      df.withColumn(s"l$k", lag(col("rev"), k).over(w))
    }.persistMemDisk
    val mu = lagged.agg(avg(col("rev")).as("mu"))
    val withMu = lagged.crossJoin(broadcast(mu))
    val aggs =
      count(lit(1)).cast("double").as("nd") +:
      sum((col("rev") - col("mu")) * (col("rev") - col("mu"))).as("denom") +:
      (1 to maxLag).map { k =>
        sum(when(col(s"l$k").isNotNull,
          (col("rev") - col("mu")) * (col(s"l$k") - col("mu")))).as(s"n$k")
      }
    val moments = withMu.agg(aggs.head, aggs.tail: _*)
    val qTerms = (1 to maxLag).map { k =>
      val rho = round4eps(col(s"n$k") / col("denom"))
      rho * rho / (col("nd") - lit(k.toDouble))
    }.reduce(_ + _)
    moments.select(col("nd").cast("long").as("n_days"),
      lit(maxLag).as("df"),
      round4eps(col("nd") * (col("nd") + lit(2.0)) * qTerms).as("q_stat"))
  }

  /** Partial autocorrelation at lags 1-3 via the Durbin-Levinson
    * closed forms — the AR-order pick that follows [[ljungBox]]:
    * φ₁₁ = ρ₁; φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²); φ₃₃ from the order-3
    * recursion. Consumes the same quantized daily-grain ACF moments
    * (one shuffle + one bounded window sort); everything after is
    * scalar algebra on ρ₁..ρ₃, each quantized before use. */
  def pacfRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val lagged = (1 to 3).foldLeft(daily) { (df, k) =>
      df.withColumn(s"l$k", lag(col("rev"), k).over(w))
    }.persistMemDisk
    val mu = lagged.agg(avg(col("rev")).as("mu"))
    val moments = lagged.crossJoin(broadcast(mu)).agg(
      sum((col("rev") - col("mu")) * (col("rev") - col("mu"))).as("denom"),
      sum(when(col("l1").isNotNull,
        (col("rev") - col("mu")) * (col("l1") - col("mu")))).as("n1"),
      sum(when(col("l2").isNotNull,
        (col("rev") - col("mu")) * (col("l2") - col("mu")))).as("n2"),
      sum(when(col("l3").isNotNull,
        (col("rev") - col("mu")) * (col("l3") - col("mu")))).as("n3"))
    val r1 = round4eps(col("n1") / col("denom"))
    val r2 = round4eps(col("n2") / col("denom"))
    val r3 = round4eps(col("n3") / col("denom"))
    // Durbin-Levinson: φ22 = (ρ2−ρ1²)/(1−ρ1²);
    // φ21 = ρ1(1−φ22... ) — for φ33 use the explicit determinant form:
    // φ33 = |R3*| / |R3| with Toeplitz R3 = [[1,ρ1,ρ2],[ρ1,1,ρ1],[ρ2,ρ1,1]],
    // R3* = R3 with last column replaced by (ρ1,ρ2,ρ3).
    val det3 = lit(1.0) * (lit(1.0) - r1 * r1) -
      r1 * (r1 - r1 * r2) + r2 * (r1 * r1 - r2)
    val det3s = lit(1.0) * (r3 - r1 * r2) -
      r1 * (r1 * r3 - r2 * r2) + r1 * (r1 * r1 - r2)
    moments.select(
      round4eps(r1).as("pacf1"),
      round4eps((r2 - r1 * r1) / (lit(1.0) - r1 * r1)).as("pacf2"),
      round4eps(det3s / det3).as("pacf3"))
  }

  /** Kruskal-Wallis H across the five regions on bucketed order
    * totals (k-group generalization of [[Behavior.mannWhitney]]),
    * with the tie correction H/C, C = 1 − Σ(t³−t)/(N³−N).
    *
    * Scale posture: ranks are never assigned per row. Totals are
    * bucketed to $1000 bands at the source, the sample collapses to
    * one row per distinct bucket (value-range-bounded, not
    * corpus-bounded), cumulative counts over that ordered bounded
    * frame give each bucket its average rank, and per-group rank
    * sums are weighted aggregates of counts × ranks — exact
    * integer/half-integer arithmetic until the final H. */
  def kruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").as("g"),
        floor(col("o_totalprice") / 1000).cast("long").as("v"))
    val cells = o.groupBy(col("v"), col("g")).agg(count(lit(1)).as("c"))
      .persistMemDisk
    val perV = cells.groupBy(col("v")).agg(sum(col("c")).as("t"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // bounded frame: one row per distinct $1000 bucket
    val ranked = perV
      .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
      .select(col("v"), col("t"), col("cb"))
    val rg = cells.join(broadcast(ranked), "v")
      .groupBy(col("g"))
      .agg(sum(col("c")).as("ng"),
        sum(col("c") * (col("cb") + (col("t") + 1) / lit(2.0))).as("rg"))
      .persistMemDisk
    // t³ and N³ computed in double space (a 2M-row bucket would
    // overflow a long cube; the ratio only ever needs ~15 digits)
    val tot = rg.agg(sum(col("ng")).as("n")).crossJoin(
      broadcast(ranked.agg(
        sum(col("t").cast("double") * col("t") * col("t") - col("t"))
          .as("ties"))))
    val nD = max(col("n")).cast("double")
    rg.crossJoin(broadcast(tot))
      .agg(max(col("n")).cast("long").as("n_out"),
        (count(lit(1)) - 1).as("df_out"),
        round4eps((lit(12.0) / (nD * (nD + 1)) *
          sum(col("rg") * col("rg") / col("ng")) -
          lit(3.0) * (nD + 1)) /
          (lit(1.0) - max(col("ties")) /
            (nD * nD * nD - nD))).as("h_stat"))
      .select(col("n_out").as("n"), col("df_out").as("df"), col("h_stat"))
  }

  /** Brown-Forsythe (median-centered Levene) test for equal spread of
    * bucketed order totals across regions: z = |x − med_g|, then the
    * one-way-ANOVA F on z.
    *
    * Scale posture: the group median comes from the SAME
    * distribution-collapse used by [[kruskalWallis]] — one row per
    * ($1000 bucket × group), cumulative counts give the two middle
    * order statistics per group, so no row is ever sorted or
    * buffered. Pass 2 re-aggregates |x−med| moments per group with
    * the 5-row median frame broadcast. Both engines compute the
    * even-n median as the mean of the two middle bucket values. */
  def leveneBf(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").as("g"),
        floor(col("o_totalprice") / 1000).cast("long").as("v"))
      .persistMemDisk
    val cells = o.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // group-keyed window over the bucket-bounded frame
    val cum = cells.withColumn("cc", sum(col("c")).over(wg))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy(col("g"))))
    // even-n median = mean of the order statistics at 1-based
    // positions floor((ng+1)/2) (lower middle) and floor(ng/2)+1
    val medians = cum
      .groupBy(col("g"))
      .agg((min(when(col("cc") >= floor((col("ng") + 1) / lit(2.0)),
          col("v"))) +
        min(when(col("cc") >= floor(col("ng") / lit(2.0)) + 1, col("v"))))
        .cast("double").as("med2")) // 2× median (lo+hi middle values)
    val z = o.join(broadcast(medians), "g")
      .select(col("g"),
        abs(col("v").cast("double") - col("med2") / lit(2.0)).as("z"))
    val gm = z.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("ng"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("szz"))
      .persistMemDisk
    val tot = gm.agg(sum(col("ng")).as("n"), sum(col("sz")).as("sz_all"),
      count(lit(1)).cast("double").as("k"))
    gm.crossJoin(broadcast(tot))
      .agg(max(col("n")).cast("long").as("n"),
        (max(col("k")) - 1).cast("long").as("df_between"),
        (max(col("n")) - max(col("k"))).cast("long").as("df_within"),
        round4eps(
          (sum(col("ng") * (col("sz") / col("ng") - col("sz_all") / col("n")) *
            (col("sz") / col("ng") - col("sz_all") / col("n"))) /
            (max(col("k")) - 1)) /
          (sum(col("szz") - col("sz") * col("sz") / col("ng")) /
            (max(col("n")) - max(col("k"))))).as("f_stat"))
  }

  /** Calibration / reliability readout for a probability-like score
    * (the discount, read as a pseudo return-probability) against the
    * binary return flag: per score bin — support, mean confidence,
    * observed rate, gap — plus the overall Brier score and expected
    * calibration error ECE = Σ (n_b/N)·|acc_b − conf_b| as constant
    * columns. The eval-harness readout that runs on every model
    * snapshot before a threshold is picked.
    *
    * Scale shape: ONE bin-keyed count pass (bins = the 11 discount
    * levels, a fixed vocabulary); Brier/ECE are re-aggregates of the
    * 11-row frame. All ratios come from exact integer counts; scores
    * are exact 2-decimal constants per bin. */
  def calibration(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      round(col("l_discount") * 100).cast("long").as("bin"),
      col("l_discount").as("score"),
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
    val b = li.groupBy(col("bin")).agg(
      count(lit(1)).as("n"),
      avg(col("score")).as("conf"),
      avg(col("y")).as("acc"),
      sum((col("score") - col("y")) * (col("score") - col("y")))
        .as("sqerr"))
      .persistMemDisk
    val tot = b.agg(
      round4eps(sum(col("sqerr")) / sum(col("n"))).as("brier"),
      round4eps(sum(col("n") * abs(col("acc") - col("conf"))) /
        sum(col("n"))).as("ece"))
    b.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"),
        round4eps(col("conf")).as("mean_score"),
        round4eps(col("acc")).as("obs_rate"),
        round4eps(col("acc") - col("conf")).as("gap"),
        col("brier"), col("ece"))
      .orderBy(col("bin"))
  }

  /** McNemar test for marginal homogeneity of two document-quality
    * classifiers rating the SAME corpus (A: char length ≥ 200;
    * B: word count ≥ 40) — the paired-classifier comparison an eval
    * harness runs before swapping a filter. Only the discordant
    * cells matter: χ²_cc = (|b−c|−1)²/(b+c) with continuity
    * correction. One pass, four integer cells, exact until the final
    * ratio. */
  def mcnemar(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(
      (length(col("text")) >= 200).cast("long").as("a"),
      (size(split(trim(col("text")), "\\s+")) >= 40).cast("long").as("b"))
    d.agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("both_pos"),
        sum(col("a") * (lit(1L) - col("b"))).as("a_only"),
        sum((lit(1L) - col("a")) * col("b")).as("b_only"))
      .select(col("n"), col("both_pos"), col("a_only"), col("b_only"),
        round4eps((abs(col("a_only") - col("b_only")) - lit(1.0)) *
          (abs(col("a_only") - col("b_only")) - lit(1.0)) /
          (col("a_only") + col("b_only"))).as("chi2_cc"))
  }

  /** Odds ratio of "line was returned" given "deep discount"
    * (l_discount ≥ 0.06) with the Haldane-Anscombe +0.5 correction
    * and the 95% log-normal CI — the 2×2 effect-size readout next to
    * the chi-square screen. One pass to four integer cells; the CI is
    * scalar algebra on those counts. */
  def oddsRatio(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      (col("l_discount") >= 0.06).cast("long").as("e"),
      (col("l_returnflag") === "R").cast("long").as("y"))
    val cells = li.agg(
      sum(col("e") * col("y")).cast("double").as("a"),
      sum(col("e") * (lit(1L) - col("y"))).cast("double").as("b"),
      sum((lit(1L) - col("e")) * col("y")).cast("double").as("c"),
      sum((lit(1L) - col("e")) * (lit(1L) - col("y"))).cast("double")
        .as("d"))
    val ah = col("a") + lit(0.5); val bh = col("b") + lit(0.5)
    val ch = col("c") + lit(0.5); val dh = col("d") + lit(0.5)
    val logOr = log(ah * dh / (bh * ch))
    val se = sqrt(lit(1.0) / ah + lit(1.0) / bh + lit(1.0) / ch +
      lit(1.0) / dh)
    cells.select(
      col("a").cast("long").as("n_exp_ret"),
      col("b").cast("long").as("n_exp_ok"),
      col("c").cast("long").as("n_base_ret"),
      col("d").cast("long").as("n_base_ok"),
      round4eps(ah * dh / (bh * ch)).as("odds_ratio"),
      round4eps(logOr).as("log_or"),
      round4eps(exp(logOr - lit(1.96) * se)).as("ci_low"),
      round4eps(exp(logOr + lit(1.96) * se)).as("ci_high"))
  }

  /** Fixed-threshold classification metrics (predict "returned" when
    * quantity ≥ 30): confusion cells, precision/recall/F1/accuracy
    * and Matthews correlation — the per-threshold readout downstream
    * of [[Behavior.aucScore]]'s threshold-free one. One pass to four
    * integer cells; MCC products run in double space (four ~n/4
    * counts multiply past long range on a 100 TB corpus). */
  def thresholdMetrics(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      (col("l_quantity") >= 30).cast("long").as("p"),
      (col("l_returnflag") === "R").cast("long").as("y"))
    val cells = li.agg(
      sum(col("p") * col("y")).as("tp"),
      sum(col("p") * (lit(1L) - col("y"))).as("fp"),
      sum((lit(1L) - col("p")) * col("y")).as("fn"),
      sum((lit(1L) - col("p")) * (lit(1L) - col("y"))).as("tn"))
    val tp = col("tp").cast("double"); val fp = col("fp").cast("double")
    val fn = col("fn").cast("double"); val tn = col("tn").cast("double")
    val prec = tp / (tp + fp); val rec = tp / (tp + fn)
    cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      round4eps(prec).as("precision"),
      round4eps(rec).as("recall"),
      round4eps(lit(2.0) * prec * rec / (prec + rec)).as("f1"),
      round4eps((tp + tn) / (tp + fp + fn + tn)).as("accuracy"),
      round4eps((tp * tn - fp * fn) /
        sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))).as("mcc"))
  }

  /** Single-frequency spectral power (Goertzel-style direct DFT
    * probe) of daily order revenue at the weekly and monthly periods:
    * c = Σ(x_t−x̄)cos(2πt/P), s = Σ(x_t−x̄)sin(2πt/P), power = c²+s².
    * The cheap "is there a cycle at THIS period" probe when a full
    * FFT is pointless — exactly the screen run before committing to a
    * seasonal model.
    *
    * Scale shape: one shuffle to the calendar-bounded daily grain,
    * then per-period map arithmetic + one tiny aggregate. Trig
    * arguments are reduced mod P BEFORE the cosine (identical small
    * doubles on both engines) and the trig values are 6-decimal
    * quantized, so libm's last-ulp freedom can't reach the sums. */
  def spectralPower(s: SparkSession, dir: String,
      periods: Seq[Int] = Seq(7, 30)): DataFrame = {
    import graft.functions.Rounding.round6eps
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .persistMemDisk
    val base = daily.agg(min(col("d")).as("d0"),
      round4eps(avg(col("rev"))).as("mu"))
    val t = datediff(col("d"), col("d0"))
    val dfs = periods.map { p =>
      val theta = lit(2.0 * math.Pi) * (t % p) / lit(p.toDouble)
      daily.crossJoin(broadcast(base))
        .agg(count(lit(1)).as("n_days"),
          sum((col("rev") - col("mu")) * round6eps(cos(theta))).as("c"),
          sum((col("rev") - col("mu")) * round6eps(sin(theta))).as("sn"))
        .select(lit(p.toLong).as("period"), col("n_days"),
          round4eps(col("c")).as("cos_sum"),
          round4eps(col("sn")).as("sin_sum"),
          round4eps(col("c") * col("c") + col("sn") * col("sn"))
            .as("power"))
    }
    dfs.reduce(_ unionAll _).orderBy(col("period"))
  }

  /** Forecast-accuracy scorecard for the seasonal-naive baseline
    * (x̂_t = x_{t−7}) on daily order counts: MAE, RMSE, MAPE and MASE
    * (MAE over the MAE of the 1-step naive walk — the scale-free
    * skill score; MASE < 1 beats naive). The eval loop every real
    * forecaster is graded by, run here on the baseline itself.
    *
    * Scale shape: corpus → calendar-bounded daily counts (one
    * shuffle); both lags come from ONE window sort of that frame;
    * errors are exact integers until the final ratios. */
  def forecastAccuracy(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val lagged = daily
      .withColumn("x7", lag(col("x"), 7).over(w))
      .withColumn("x1", lag(col("x"), 1).over(w))
    lagged.agg(
        count(when(col("x7").isNotNull, 1)).as("n_scored"),
        avg(when(col("x7").isNotNull,
          abs(col("x") - col("x7")))).as("mae"),
        sqrt(avg(when(col("x7").isNotNull,
          (col("x") - col("x7")) * (col("x") - col("x7"))))).as("rmse"),
        avg(when(col("x7").isNotNull,
          abs(col("x") - col("x7")) / col("x"))).as("mape"),
        avg(when(col("x1").isNotNull,
          abs(col("x") - col("x1")))).as("mae_naive"))
      .select(col("n_scored"),
        round4eps(col("mae")).as("mae"),
        round4eps(col("rmse")).as("rmse"),
        round4eps(col("mape")).as("mape"),
        round4eps(col("mae") / col("mae_naive")).as("mase"))
  }

  /** Mann-Kendall trend test on daily order revenue:
    * S = Σ_{i<j} sign(xⱼ−xᵢ) with the tie-corrected variance
    * Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 and the
    * continuity-corrected z — the distribution-free monotone-trend
    * significance twin of the existing Theil-Sen slope gate.
    *
    * Scale posture: the pair enumeration is quadratic in DAYS, not
    * rows — the corpus collapses to the calendar-bounded daily grain
    * first (a few thousand rows at ANY corpus size), so the self-join
    * is a bounded ~10⁶-pair local job. Daily sums are quantized
    * before comparison so the sign() never sees cross-engine ulp. */
  def mannKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
      .persistMemDisk
    val b = daily.select(col("d").as("d2"), col("rev").as("rev2"))
    val sStat = daily.join(b, col("d") < col("d2"))
      .agg(sum(signum(col("rev2") - col("rev")).cast("long")).as("s_stat"))
    val nD = daily.agg(count(lit(1)).cast("double").as("n"))
    val ties = daily.groupBy(col("rev")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(when(col("t") > 1,
        col("t").cast("double") * (col("t") - 1) *
          (lit(2.0) * col("t") + 5))), lit(0.0)).as("tie_term"))
    sStat.crossJoin(broadcast(nD)).crossJoin(broadcast(ties))
      .select(col("n").cast("long").as("n_days"), col("s_stat"),
        round4eps((col("s_stat") - signum(col("s_stat"))) /
          sqrt((col("n") * (col("n") - 1) * (lit(2.0) * col("n") + 5) -
            col("tie_term")) / lit(18.0))).as("z_score"))
  }

  /** Top revenue-peak days: strict local maxima of the daily series
    * (higher than BOTH neighbors), ranked by the day's revenue with a
    * prominence-lite column (gap over the taller neighbor). The
    * peak-detection readout behind anomaly triage.
    *
    * Scale shape: one shuffle to the calendar-bounded daily grain;
    * lag/lead from ONE window sort of that frame; top-k is a
    * TakeOrdered on the quantized revenue with the date tie-break. */
  def peakDays(s: SparkSession, dir: String, topN: Int = 10): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    daily
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("next", lead(col("rev"), 1).over(w))
      .filter(col("prev").isNotNull && col("next").isNotNull &&
        col("rev") > col("prev") && col("rev") > col("next"))
      .select(col("d").as("day"), col("rev"),
        round4eps(col("rev") - greatest(col("prev"), col("next")))
          .as("prominence"))
      .orderBy(col("rev").desc, col("day"))
      .limit(topN)
  }

  /** Grubbs outlier statistic per region on the daily-revenue series:
    * G = max|xᵢ − x̄|/s with the sample s, plus the day attaining it —
    * "is the worst day statistically an outlier". The single-outlier
    * screen that runs before any robust refit.
    *
    * Scale shape: corpus → (region × day) grain in one shuffle; the
    * moment pass and the argmax both re-aggregate that calendar- and
    * dimension-bounded frame (the 5-row moments broadcast back onto
    * it). The argmax is a min(struct(-G, day)) — deterministic under
    * ties because G is quantized first. */
  def grubbsDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .persistMemDisk
    val m = daily.groupBy(col("region")).agg(
      count(lit(1)).cast("double").as("nd"),
      avg(col("rev")).as("mu"),
      sum(col("rev") * col("rev")).as("s2"))
    val sd = sqrt((col("s2") - col("nd") * col("mu") * col("mu")) /
      (col("nd") - 1))
    val g = daily.join(broadcast(m.select(col("region"), col("nd"),
        col("mu"), sd.as("sd"))), "region")
      .select(col("region"), col("nd"), col("d"),
        round4eps(abs(col("rev") - col("mu")) / col("sd")).as("g4"))
    g.groupBy(col("region"))
      .agg(max(col("nd")).cast("long").as("n_days"),
        min(struct((-col("g4")).as("ng"), col("d"))).as("w"))
      .select(col("region"), col("n_days"),
        (-col("w.ng")).as("g_stat"), col("w.d").as("peak_day"))
      .orderBy(col("region"))
  }

  /** Hill tail-index estimate for the order-total distribution above
    * a fixed threshold: α̂ = n_tail / Σ ln(xᵢ/x_min) — the "how heavy
    * is the spend tail" readout that decides whether means are even
    * meaningful (α ≤ 2 ⇒ infinite variance). One conditional
    * aggregation pass; nothing is sorted and no quantile is needed
    * because x_min is a fixed business threshold. */
  def hillTail(s: SparkSession, dir: String, xmin: Double = 300000.0):
      DataFrame = {
    val o = Tables.orders(s, dir)
    o.agg(count(lit(1)).as("n_total"),
        count(when(col("o_totalprice") > xmin, 1)).as("n_tail"),
        sum(when(col("o_totalprice") > xmin,
          log(col("o_totalprice") / lit(xmin)))).as("slog"))
      .select(col("n_total"), col("n_tail"),
        round4eps(col("n_tail") / col("slog")).as("alpha"),
        round4eps(col("n_tail").cast("double") / col("n_total"))
          .as("tail_share"))
  }

  /** Robust anomaly screen per event type on daily counts: median /
    * MAD with the 0.6745 consistency constant — the outlier detector
    * that one bad day cannot poison (unlike mean/σ z-scores, whose
    * own baseline absorbs the anomaly). Reports the robust-z outlier
    * count (|z| > 3.5, the Iglewicz-Hoaglin cut) and the worst day's
    * |z| per type.
    *
    * Scale posture: BOTH medians (of x, then of |x−med|) come from
    * the distribution collapse — group by integer value, cumulative
    * counts over the value-bounded frame pick the two middle order
    * statistics; everything stays integer (doubled: med2 = 2·median,
    * mad4 = 4·MAD) until the final z ratio, so cross-engine
    * arithmetic is exact. No row is ever sorted or buffered. */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type").as("g"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
      .persistMemDisk
    // 2·median of an integer column via cumulative counts over the
    // per-group value distribution (lower-mid + upper-mid order stats)
    def med2Of(df: DataFrame, v: String): DataFrame = {
      val cells = df.groupBy(col("g"), col(v).as("v"))
        .agg(count(lit(1)).as("c"))
      val wg = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.withColumn("cc", sum(col("c")).over(wg))
        .withColumn("ng", sum(col("c")).over(Window.partitionBy(col("g"))))
        .groupBy(col("g"))
        .agg((min(when(col("cc") >= floor((col("ng") + 1) / lit(2.0)),
            col("v"))) +
          min(when(col("cc") >= floor(col("ng") / lit(2.0)) + 1,
            col("v")))).as("m2"))
    }
    val m1 = med2Of(daily, "x").withColumnRenamed("m2", "med2x")
    val dev = daily.join(broadcast(m1), "g")
      .select(col("g"), col("d"), col("x"), col("med2x"),
        abs(lit(2L) * col("x") - col("med2x")).as("dv"))
      .persistMemDisk
    val m2 = med2Of(dev, "dv").withColumnRenamed("m2", "mad4")
    val z = lit(1.349) * (lit(2L) * col("x") - col("med2x")) / col("mad4")
    dev.join(broadcast(m2), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"),
        (max(col("med2x")) / lit(2.0)).as("median_daily"),
        (max(col("mad4")) / lit(4.0)).as("mad"),
        sum(when(abs(z) > 3.5, 1L).otherwise(0L)).as("n_outliers"),
        round4eps(max(abs(z))).as("max_abs_z"))
      .withColumnRenamed("g", "event_type")
      .orderBy(col("event_type"))
  }

  /** Rescaled-range (Hurst) estimate on daily order revenue: for
    * block sizes 16/32/64 days, split the calendar into consecutive
    * blocks, compute R/S per block (range of the mean-adjusted
    * cumulative sum over the sample std), and fit ln(mean R/S) =
    * H·ln(size) + c by closed-form OLS over the three points.
    * H ≈ 0.5 = memoryless walk, H > 0.5 = persistent trends — the
    * long-memory screen beside [[Relational.revenueAcf]]'s short-lag
    * one.
    *
    * Scale shape: one shuffle to the calendar-bounded daily grain;
    * every window (cumulative dev, block range) is keyed by block id,
    * so partitions are at most 64 rows; the regression consumes three
    * aggregate points. Daily revs are quantized and block moments are
    * 2-decimal-pinned before R/S so the ln() never sees cross-engine
    * ulp. */
  def hurstRS(s: SparkSession, dir: String,
      sizes: Seq[Int] = Seq(16, 32, 64)): DataFrame = {
    import graft.functions.Rounding.round6eps
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val wAll = Window.orderBy(col("d")) // calendar-bounded frame
    val idx = daily.withColumn("t", row_number().over(wAll) - 1)
      .persistMemDisk
    val perSize = sizes.map { bs =>
      val blk = idx.withColumn("b", floor(col("t") / bs))
      // keep only complete blocks
      val full = blk.groupBy(col("b")).agg(count(lit(1)).as("nb"),
          round4eps(avg(col("rev"))).as("mu"),
          round4eps(sqrt(avg(col("rev") * col("rev")) -
            avg(col("rev")) * avg(col("rev")))).as("sd"))
        .filter(col("nb") === bs)
      val wb = Window.partitionBy(col("b")).orderBy(col("t"))
      val cum = blk.join(broadcast(full), "b")
        .withColumn("cdev", sum(col("rev") - col("mu")).over(
          wb.rowsBetween(Window.unboundedPreceding, 0)))
      val rs = cum.groupBy(col("b"), col("sd"))
        .agg((max(col("cdev")) - min(col("cdev"))).as("r"))
        .select(col("b"), round6eps(col("r") / col("sd")).as("rs"))
      rs.agg(round6eps(avg(col("rs"))).as("mean_rs"))
        .select(lit(bs.toLong).as("size"), col("mean_rs"))
    }
    val pts = perSize.reduce(_ unionAll _)
      .select(col("size"), col("mean_rs"),
        log(col("size").cast("double")).as("lx"),
        log(col("mean_rs")).as("ly"))
    // 3-point closed-form OLS slope = Hurst estimate
    val m = pts.agg(count(lit(1)).cast("double").as("n"),
      sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
      sum(col("lx") * col("lx")).as("sxx"),
      sum(col("lx") * col("ly")).as("sxy"))
    pts.crossJoin(broadcast(m.select(
        round4eps((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))).as("hurst"))))
      .select(col("size"), round4eps(col("mean_rs")).as("mean_rs"),
        col("hurst"))
      .orderBy(col("size"))
  }

  /** Binary-segmentation changepoint (step 1): the day that maximizes
    * the scaled mean-shift statistic √(k(n−k)/n)·|mean_before −
    * mean_after| over the daily revenue series — where CUSUM says
    * "something moved", this says WHERE. Reports the split day, both
    * means and the statistic.
    *
    * Scale shape: prefix sums over the calendar-bounded daily frame
    * (one window sort), then an argmax via min(struct) on the
    * quantized statistic — no second pass, no driver loop. */
  def changepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val idx = daily
      .withColumn("k", row_number().over(w))
      .withColumn("ps", sum(col("rev")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val tot = idx.agg(max(col("k")).cast("double").as("n"),
      sum(col("rev")).as("st"))
    val scored = idx.crossJoin(broadcast(tot))
      .filter(col("k") < col("n")) // split needs a non-empty right side
      .select(col("d"), col("k"),
        (col("ps") / col("k")).as("mean_before"),
        ((col("st") - col("ps")) / (col("n") - col("k"))).as("mean_after"),
        round4eps(sqrt(col("k") * (col("n") - col("k")) / col("n")) *
          abs(col("ps") / col("k") -
            (col("st") - col("ps")) / (col("n") - col("k")))).as("stat"))
    scored.agg(min(struct((-col("stat")).as("ns"), col("d").as("d"),
        col("mean_before").as("mb"), col("mean_after").as("ma"))).as("w"))
      .select(col("w.d").as("split_day"),
        round4eps(col("w.mb")).as("mean_before"),
        round4eps(col("w.ma")).as("mean_after"),
        (-col("w.ns")).as("shift_stat"))
  }

  /** Gumbel extreme-value fit on monthly block maxima of daily
    * revenue (method of moments: β = s·√6/π, μ = x̄ − γβ) with the
    * 12-month return level μ − β·ln(−ln(1−1/12)) — "how big a day
    * should we provision for once a year", the EVT readout a capacity
    * planner wants where means and percentiles both mislead.
    *
    * Scale shape: corpus → daily grain → monthly maxima (two keyed
    * collapses, both calendar-bounded); the fit is scalar algebra on
    * one moment aggregate of the ~block-count frame. */
  def gumbelMaxima(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val maxima = daily
      .groupBy(date_trunc("month", col("d")).as("m"))
      .agg(max(col("rev")).as("mx"))
    val mom = maxima.agg(count(lit(1)).cast("double").as("n"),
      avg(col("mx")).as("mu0"),
      sum(col("mx") * col("mx")).as("s2"))
    val sd = sqrt((col("s2") - col("n") * col("mu0") * col("mu0")) /
      (col("n") - 1))
    val beta = sd * lit(math.sqrt(6.0) / math.Pi)
    val mu = col("mu0") - lit(0.5772156649015329) * beta
    mom.select(col("n").cast("long").as("n_blocks"),
      round4eps(mu).as("gumbel_mu"),
      round4eps(beta).as("gumbel_beta"),
      round4eps(mu - beta * log(-log(lit(1.0) - lit(1.0) / 12)))
        .as("return_level_12m"))
  }

  /** Deterministic 5-fold cross-validation assignment keyed on the
    * md5 of the order key — the split that is reproducible across
    * engines, runs and partitionings (no rand(), no row_number):
    * fold = (hex value of the first md5 nibble) mod 5. Readout is the
    * fold balance audit: size, share, and per-fold return rate (a
    * skewed fold flags a leaking key). One hash + one 5-ary count
    * pass; the hash is embarrassingly parallel. */
  def kfoldAssign(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val li = Tables.lineitem(s, dir).selectExpr(
      "(instr('0123456789abcdef', substring(md5(cast(cast(l_orderkey " +
        s"as string) as binary)), 1, 1)) - 1) % $k AS fold",
      "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y")
    val b = li.groupBy(col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_ret"))
      .persistMemDisk
    val tot = b.agg(sum(col("n")).as("tn"))
    b.crossJoin(broadcast(tot))
      .select(col("fold").cast("long").as("fold"), col("n"),
        round4eps(col("n").cast("double") / col("tn")).as("share"),
        round4eps(col("n_ret").cast("double") / col("n"))
          .as("return_rate"))
      .orderBy(col("fold"))
  }

  /** Wald SPRT sequential monitor — the always-valid alternative to
    * the fixed-horizon q_ab_test: the experiment's daily cumulative
    * log-likelihood ratio for H1: p = [[SprtP1]] against
    * H0: p = [[SprtP0]] on arm A's (user_id % 2 = 0, the q_ab_test
    * arm convention) purchase rate, with the classic
    * ±ln((1−β)/α) stopping boundaries (α = β = 0.05 → ±ln(19)).
    * Per day: trial/success counts, the running LLR and the decision
    * the monitor would emit that day ('accept_h1' / 'accept_h0' /
    * 'continue'), decided on QUANTIZED values so a boundary graze
    * cannot flip cross-engine.
    *
    * Scale shape: fact-linear daily collapse, then calendar-bounded
    * cumulative windows. The binomial LLR increment is
    * k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) — both log constants
    * spelled as the same literal expressions on both engines. */
  /** Wasserstein-1 (earth-mover) drift between the early
    * (< 1998-01-01) and late eras of the order-total distribution —
    * the metric-space complement of the PSI gates: PSI is
    * scale-free divergence, W1 answers "how many DOLLARS did the
    * distribution move". W1 = ∫|F_early − F_late| dx over the $100-
    * binned value axis (the bin cap bounds the axis NDV at any
    * corpus size; counts are exact integers, so the ECDFs are exact
    * rationals and the only float work is the final weighted sum).
    * One fact collapse → bin-axis cumulative windows. */
  def wassersteinDrift(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bin"),
        when(col("o_orderdate") <
          lit(java.sql.Date.valueOf("1998-01-01")), 1L).otherwise(0L)
          .as("early"))
      .groupBy(col("bin"))
      .agg(sum(col("early")).as("n1"), sum(lit(1L) - col("early")).as("n2"))
    val tot = b.agg(sum(col("n1")).cast("double").as("t1"),
      sum(col("n2")).cast("double").as("t2"))
    val w = Window.orderBy(col("bin"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.crossJoin(broadcast(tot))
      .withColumn("f1", sum(col("n1")).over(wc).cast("double") / col("t1"))
      .withColumn("f2", sum(col("n2")).over(wc).cast("double") / col("t2"))
      .withColumn("gap",
        ((lead(col("bin"), 1).over(w) - col("bin")) * 100).cast("double"))
      .agg(max(col("t1")).cast("long").as("n_early"),
        max(col("t2")).cast("long").as("n_late"),
        round4eps(sum(when(col("gap").isNotNull,
          abs(col("f1") - col("f2")) * col("gap")).otherwise(0.0)))
          .as("w1_dollars"))
  }

  /** Upper-tail dependence of the two largest brands' daily revenue —
    * the co-crash/co-boom diagnostic a diversification analysis needs
    * beyond correlation: λ_U(0.9) = P(X in its top decile AND Y in its
    * top decile) / P(Y in its top decile), with "top decile" decided by
    * per-brand day RANKS (exact integers — no quantile interpolation
    * to disagree on). Brands are the top-2 by total revenue
    * (deterministic tie-break on name); both series live on the
    * calendar-bounded day axis. */
  def tailDependence(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), to_date(col("l_shipdate")).as("d"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
    val top2 = li.groupBy(col("p_brand"))
      .agg(sum(col("rev")).as("tot"))
      .orderBy(round4eps(col("tot")).desc, col("p_brand"))
      .limit(2)
      .select(col("p_brand"),
        row_number().over(Window.orderBy(
          round4eps(col("tot")).desc, col("p_brand"))).as("which"))
    val daily = li.join(broadcast(top2), "p_brand")
      .groupBy(col("which"), col("d"))
      .agg((floor(sum(col("rev")) * 100 + 0.5) / 100).as("drev"))
    val wRank = Window.partitionBy(col("which"))
      .orderBy(col("drev").desc, col("d"))
    val wN = Window.partitionBy(col("which"))
    val flagged = daily
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("hot", (col("rk") * 10 <= col("n")).cast("long"))
    val x = flagged.filter(col("which") === 1)
      .select(col("d"), col("hot").as("hot_x"))
    val y = flagged.filter(col("which") === 2)
      .select(col("d"), col("hot").as("hot_y"))
    x.join(y, "d")
      .agg(count(lit(1)).as("n_days"),
        sum(col("hot_x") * col("hot_y")).as("joint_hot"),
        sum(col("hot_y")).as("y_hot"))
      .select(col("n_days"), col("joint_hot"),
        round4eps(col("joint_hot").cast("double") /
          col("y_hot").cast("double")).as("lambda_u"))
  }

  /** Two-sample Poisson rate-ratio test on error events: the error
    * rate per event in the early half of the calendar vs the late half
    * — Wald z on the log rate ratio, z = ln(r1/r2)/√(1/x1 + 1/x2)
    * (the incident-rate comparison an SRE postmortem quotes). Exact
    * integer counts; verdict on the quantized z vs ±1.96. */
  def rateRatioTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val mid = ev.agg(to_date(min(col("ts"))).as("d0"),
      to_date(max(col("ts"))).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / 2).cast("int")).as("dm"))
    val sides = ev.crossJoin(broadcast(mid))
      .select((to_date(col("ts")) <= col("dm")).cast("int").as("early"),
        (col("event_type") === "error").cast("long").as("is_err"))
      .groupBy(col("early"))
      .agg(count(lit(1)).as("n"), sum(col("is_err")).as("x"))
    val a = sides.filter(col("early") === 1)
      .select(col("n").as("n1"), col("x").as("x1"))
    val b = sides.filter(col("early") === 0)
      .select(col("n").as("n2"), col("x").as("x2"))
    a.crossJoin(b)
      .withColumn("r1", col("x1").cast("double") / col("n1").cast("double"))
      .withColumn("r2", col("x2").cast("double") / col("n2").cast("double"))
      .withColumn("z_raw", log(col("r1") / col("r2")) /
        sqrt(lit(1.0) / col("x1").cast("double") +
          lit(1.0) / col("x2").cast("double")))
      .select(col("n1"), col("x1"), col("n2"), col("x2"),
        round4eps(col("r1") / col("r2")).as("rate_ratio"),
        round4eps(col("z_raw")).as("z"))
      .withColumn("significant", abs(col("z")) > 1.96)
  }

  /** Fixed-effect meta-analysis (inverse-variance pooling) of the
    * per-nation return-rate difference between discounted and
    * non-discounted lines — the biostat machinery (pooled effect,
    * Cochran's Q heterogeneity, I²) applied to "is the discount→return
    * effect consistent across supplier nations, and what is the
    * precision-weighted overall effect". Per-stratum d_i = p1 − p2,
    * var_i = p1(1−p1)/n1 + p2(1−p2)/n2; pooled = Σw·d/Σw with
    * w = 1/var; Q = Σw(d − pooled)²; I² = max(0, (Q − (k−1))/Q). One
    * fact rollup to the (nation, arm) grid, then constant-size. */
  def metaFixedEffect(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        (col("l_discount") > 0.05).cast("int").as("disc"),
        (col("l_returnflag") === "R").cast("long").as("ret"))
    val grid = li.groupBy(col("nation"), col("disc"))
      .agg(count(lit(1)).as("n"), sum(col("ret")).as("x"))
    val p1 = grid.filter(col("disc") === 1).select(col("nation"),
      col("n").as("n1"), col("x").as("x1"))
    val p2 = grid.filter(col("disc") === 0).select(col("nation"),
      col("n").as("n2"), col("x").as("x2"))
    val strata = p1.join(p2, "nation")
      .withColumn("pa", col("x1").cast("double") / col("n1").cast("double"))
      .withColumn("pb", col("x2").cast("double") / col("n2").cast("double"))
      .withColumn("d", col("pa") - col("pb"))
      .withColumn("v",
        col("pa") * (lit(1.0) - col("pa")) / col("n1").cast("double") +
          col("pb") * (lit(1.0) - col("pb")) / col("n2").cast("double"))
      .withColumn("w", lit(1.0) / col("v"))
    val pooled = strata.agg(count(lit(1)).as("k"),
      sum(col("w") * col("d")).as("swd"), sum(col("w")).as("sw"))
      .withColumn("pooled_raw", col("swd") / col("sw"))
    strata.crossJoin(broadcast(pooled))
      .agg(max(col("k")).as("k"),
        max(col("pooled_raw")).as("p_raw"),
        max(col("sw")).as("sw_all"),
        sum(col("w") * (col("d") - col("pooled_raw")) *
          (col("d") - col("pooled_raw"))).as("q_raw"))
      .select(col("k"),
        round4eps(col("p_raw")).as("pooled_effect"),
        round4eps(sqrt(lit(1.0) / col("sw_all"))).as("se"),
        round4eps(col("p_raw") / sqrt(lit(1.0) / col("sw_all"))).as("z"),
        round4eps(col("q_raw")).as("q_stat"),
        round4eps(greatest(lit(0.0),
          (col("q_raw") - (col("k") - lit(1)).cast("double")) /
            col("q_raw"))).as("i2"))
  }

  /** Augmented-Dickey-Fuller unit-root test (lag-0 form, with
    * constant) on daily order counts: regress Δy_t on y_{t−1}; the DF
    * statistic β̂/SE(β̂) against the 5% critical value −2.86
    * (constant-only case), compared QUANTIZED. A series failing to
    * reject (stat > −2.86) is a random walk — differencing before any
    * of the regression/forecast gates is then mandatory; this is the
    * pre-flight check the ACF/Hurst family hints at but does not
    * decide. Integer counts → exact moments; calendar-bounded frame. */
  def adfTest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d"))
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .withColumn("ylag", lag(col("y"), 1).over(w))
      .filter(col("ylag").isNotNull)
      .select((col("y") - col("ylag")).as("dy"), col("ylag").as("x"))
    daily.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("dy")).as("sxy"),
        sum(col("dy") * col("dy")).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("beta", col("cxy") / col("cxx"))
      .withColumn("rss", col("cyy") - col("beta") * col("cxy"))
      .withColumn("se", sqrt(col("rss") / (col("n") - 2) / col("cxx")))
      .withColumn("stat", round4eps(col("beta") / col("se")))
      .select(col("n").cast("long").as("n_obs"),
        round4eps(col("beta")).as("beta"),
        col("stat").as("df_stat"),
        (col("stat") < -2.86).as("stationary"))
  }

  /** Granger causality (1 lag) — do daily `view` counts help predict
    * daily `purchase` counts beyond purchases' own history? F-test of
    * the unrestricted y_t ~ (y_{t−1}, x_{t−1}) against the restricted
    * y_t ~ y_{t−1}, both in exact-moment closed form (the olsMulti
    * normal equations); verdict compares the QUANTIZED F to the 5%
    * F(1, ∞) value 3.84. Integer daily counts keep every moment
    * exact; one events scan → calendar-bounded day frame. */
  def grangerTest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d"))
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("event_type") === "purchase").cast("int"))
          .cast("double").as("y"),
        sum((col("event_type") === "view").cast("int"))
          .cast("double").as("x"))
      .withColumn("ylag", lag(col("y"), 1).over(w))
      .withColumn("xlag", lag(col("x"), 1).over(w))
      .filter(col("ylag").isNotNull)
      .select(col("y"), col("ylag").as("x1"), col("xlag").as("x2"))
    val m = daily.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
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
    m.withColumn("rss_u", cyy - b1 * c1y - b2 * c2y)
      .withColumn("rss_r", cyy - (c1y * c1y) / c11)
      .withColumn("f", round4eps(
        (col("rss_r") - col("rss_u")) /
          (col("rss_u") / (col("n") - 3))))
      .select(col("n").cast("long").as("n_obs"),
        round4eps(b1).as("b_ylag"),
        round4eps(b2).as("b_xlag"),
        col("f").as("f_stat"),
        (col("f") > 3.84).as("granger_causal"))
  }

  /** Oaxaca-Blinder decomposition of the order-value gap between
    * BUILDING-segment customers and the rest: how much of the mean
    * gap ȳ_A − ȳ_B is EXPLAINED by a different order-size mix
    * (endowments, at B's returns: (x̄_A − x̄_B)·β_B) vs UNEXPLAINED
    * (different returns for the same size) — the canonical wage-gap
    * econometrics applied to basket economics. Per-group simple OLS
    * (y = order total on x = order quantity) in moment closed form;
    * `unexplained` is computed as gap − explained so the
    * decomposition identity is exact by construction on both engines.
    * One fact rollup to order grain, two scalar group frames. */
  def oaxacaBlinder(s: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("x"))
    val seg = Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("int").as("grp_a"))
    val ords = Tables.orders(s, dir)
      .join(qty, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .select(col("grp_a"), col("x"), col("o_totalprice").as("y"))
    val m = ords.groupBy(col("grp_a"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("xbar", col("sx") / col("n"))
      .withColumn("ybar", col("sy") / col("n"))
      .withColumn("beta",
        (col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n")))
    val a = m.filter(col("grp_a") === 1).select(
      col("n").as("n_a"), col("xbar").as("xbar_a"),
      col("ybar").as("ybar_a"), col("beta").as("beta_a"))
    val b = m.filter(col("grp_a") === 0).select(
      col("n").as("n_b"), col("xbar").as("xbar_b"),
      col("ybar").as("ybar_b"), col("beta").as("beta_b"))
    a.crossJoin(b)
      .withColumn("gap_raw", col("ybar_a") - col("ybar_b"))
      .withColumn("expl_raw",
        (col("xbar_a") - col("xbar_b")) * col("beta_b"))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        round4eps(col("gap_raw")).as("gap"),
        round4eps(col("expl_raw")).as("explained"),
        round4eps(col("gap_raw") - col("expl_raw")).as("unexplained"),
        round4eps(col("beta_a")).as("beta_a"),
        round4eps(col("beta_b")).as("beta_b"))
  }

  /** Price-ending forensics — the pricing sibling of the Benford
    * audit: the distribution of the CENTS ending (price mod 1 dollar,
    * as the exact cents integer mod 100) over part retail prices, with
    * the 99-dof Pearson χ² against uniform. Psychological pricing
    * shows as .99/.95 spikes; a synthetic or converted price book
    * shows as uniformity (the χ² here DOES flag this corpus as
    * synthetic — that is the point of the audit). One scan → 100-row
    * collapse. */
  def priceEndings(s: SparkSession, dir: String): DataFrame = {
    val cents = Tables.part(s, dir)
      .select((floor(col("p_retailprice") * 100 + 0.5).cast("long") % 100)
        .as("ending"))
      .groupBy(col("ending")).agg(count(lit(1)).as("n_obs"))
    val tot = cents.agg(sum(col("n_obs")).cast("double").as("n"),
      count(lit(1)).cast("double").as("k"))
    val per = cents.crossJoin(broadcast(tot))
      .withColumn("e", col("n") / lit(100.0))
    // absent endings still contribute (0 − e)²/e = e to the statistic
    val chi2 = per.agg((sum((col("n_obs") - col("e")) *
      (col("n_obs") - col("e")) / col("e")) +
      (lit(100.0) - max(col("k"))) * max(col("e"))).as("chi2_raw"))
    per.crossJoin(broadcast(chi2))
      .select(col("ending"), col("n_obs"),
        round4eps(col("n_obs") / col("n")).as("share"),
        round4eps(col("chi2_raw")).as("chi2"))
      .orderBy(col("ending"))
  }

  /** Quantile treatment effects — the distributional view the mean
    * effect (q_ab_test/q_cuped) hides: per decile 0.1…0.9, the exact
    * interpolated percentile of arm A's purchase values minus arm B's
    * (same arm convention, user_id % 2). A lift concentrated in the
    * top decile and a uniform shift look identical to a t-test; QTE
    * separates them. Exact percentiles (the q_percentiles parity
    * pattern) on both arms, computed in one grouped aggregate each —
    * the per-decile frame is constant-size. */
  def quantileTreatmentEffects(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select((col("user_id") % 2 === 0).cast("int").as("arm_a"),
        col("value"))
    val deciles = (1 to 9).map(_ / 10.0)
    val q = ev.groupBy(col("arm_a"))
      .agg(expr(s"percentile(value, array(${deciles.mkString(",")}))")
        .as("qs"), count(lit(1)).as("n"))
    val a = q.filter(col("arm_a") === 1)
      .select(col("qs").as("qa"), col("n").as("n_a"))
    val b = q.filter(col("arm_a") === 0)
      .select(col("qs").as("qb"), col("n").as("n_b"))
    a.crossJoin(b)
      .select(col("n_a"), col("n_b"),
        posexplode(col("qa")).as(Seq("i", "q_a_raw")))
      .crossJoin(b.select(col("qb")))
      .withColumn("q_b_raw", element_at(col("qb"), col("i") + 1))
      .select(((col("i") + 1).cast("int")).as("decile"),
        col("n_a"), col("n_b"),
        round4eps(col("q_a_raw")).as("q_a"),
        round4eps(col("q_b_raw")).as("q_b"),
        round4eps(col("q_a_raw") - col("q_b_raw")).as("qte"))
      .orderBy(col("decile"))
  }

  val SprtP0 = 0.19
  val SprtP1 = 0.21

  def sprtMonitor(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("user_id") % 2 === 0)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
    val la = log(lit(SprtP1) / lit(SprtP0))
    val lb = log((lit(1.0) - lit(SprtP1)) / (lit(1.0) - lit(SprtP0)))
    val bound = log(lit(19.0))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("llr", round4eps(sum(
        col("k").cast("double") * la +
          (col("n") - col("k")).cast("double") * lb).over(w)))
      .withColumn("decision",
        when(col("llr") >= round4eps(bound), lit("accept_h1"))
          .when(col("llr") <= round4eps(-bound), lit("accept_h0"))
          .otherwise(lit("continue")))
      .select(col("d"), col("n"), col("k"), col("llr"), col("decision"))
      .orderBy(col("d"))
  }

  /** Two-stage least squares (instrumental variables) at the order
    * grain: revenue ~ quantity is confounded (big orders differ in
    * unobserved ways), so quantity is instrumented with order PRIORITY
    * (urgent/high = 1 — correlated with how much gets bought, plausibly
    * excluded from the price-per-unit error). With ONE endogenous
    * regressor and ONE instrument, 2SLS collapses to the Wald/ratio
    * closed form β_IV = cov(z,y)/cov(z,x) — a single moment aggregate
    * over one lineitem-orders join; the first-stage slope and the OLS
    * slope are reported next to it so the instrument's bite and the
    * endogeneity gap are visible. 100 TB: one fact-keyed shuffle to the
    * order grain, then a 1-row moment reduce. */
  def iv2sls(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(col("l_extendedprice")).as("y"),
        sum(col("l_quantity")).as("x"))
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .cast("int").cast("double").as("z"))
      .join(li, col("o_orderkey") === col("ok"))
    g.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(col("z") * col("x")).as("szx"),
        sum(col("z") * col("y")).as("szy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("czx", col("szx") - col("sz") * col("sx") / col("n"))
      .withColumn("czy", col("szy") - col("sz") * col("sy") / col("n"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .select(col("n").cast("long").as("n_orders"),
        round4eps(col("czy") / col("czx")).as("beta_iv"),
        round4eps(col("cxy") / col("cxx")).as("beta_ols"),
        round4eps(col("czx") / col("n")).as("first_stage_cov"),
        round4eps(col("czy") / col("czx") - col("cxy") / col("cxx"))
          .as("endogeneity_gap"))
  }

  /** Sharp regression discontinuity at a total-price cutoff: orders
    * just past a spend threshold are "treated" (priority handling at
    * 200k, say) — the causal effect is the jump in the outcome at the
    * boundary, estimated by two separate local-linear fits within the
    * bandwidth on either side and differenced AT the cutoff (the
    * standard sharp-RDD estimator). Both side-fits are single moment
    * aggregates over the bandwidth-filtered scan. */
  def rddEffect(s: SparkSession, dir: String,
                cutoff: Double = 200000.0,
                bandwidth: Double = 100000.0): DataFrame = {
    val delay = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(avg(col("l_quantity")).as("yq"))
    val base = Tables.orders(s, dir)
      .join(delay, col("o_orderkey") === col("ok"))
      .select((col("o_totalprice") - lit(cutoff)).as("r"), col("yq").as("y"))
      .filter(abs(col("r")) <= bandwidth)
      .withColumn("side", (col("r") >= 0).cast("int"))
    val fits = base.groupBy(col("side"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("r")).as("sr"), sum(col("y")).as("sy"),
        sum(col("r") * col("r")).as("srr"),
        sum(col("r") * col("y")).as("sry"))
      .withColumn("crr", col("srr") - col("sr") * col("sr") / col("n"))
      .withColumn("cry", col("sry") - col("sr") * col("sy") / col("n"))
      .withColumn("slope", col("cry") / col("crr"))
      // intercept AT the cutoff (r = 0)
      .withColumn("at_cut",
        col("sy") / col("n") - col("slope") * col("sr") / col("n"))
      .select(col("side"), col("n"), col("slope"), col("at_cut"))
    val l = fits.filter(col("side") === 0)
      .select(col("n").as("n_left"), col("slope").as("slope_l"),
        col("at_cut").as("y_left"))
    val r = fits.filter(col("side") === 1)
      .select(col("n").as("n_right"), col("slope").as("slope_r"),
        col("at_cut").as("y_right"))
    l.crossJoin(r).select(
      col("n_left").cast("long").as("n_left"),
      col("n_right").cast("long").as("n_right"),
      round4eps(col("y_left")).as("y_left"),
      round4eps(col("y_right")).as("y_right"),
      round4eps(col("y_right") - col("y_left")).as("rdd_effect"),
      round4eps(col("slope_l")).as("slope_left"),
      round4eps(col("slope_r")).as("slope_right"))
  }

  /** Chow structural-break test on the daily-revenue time trend: the
    * pooled OLS of revenue-per-day on the day index vs separate fits
    * before/after the midpoint break date,
    * F = ((RSS_p − RSS_1 − RSS_2)/k) / ((RSS_1 + RSS_2)/(n − 2k)),
    * k = 2. Three moment fits over one calendar-bounded daily frame;
    * the break date is the median order date (data-derived, so the
    * gate is stable under regeneration). */
  def chowTest(s: SparkSession, dir: String): DataFrame = {
    // revenue in MILLIONS: RSS magnitudes must stay small enough that
    // the 4-decimal quantization sits inside double precision (in
    // thousands the 1e9-scale RSS flipped its last quantum on
    // aggregation order — caught by the oracle in-round)
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(col("o_totalprice")) / lit(1000000.0)).as("y"))
      .withColumn("t", datediff(col("d"),
        min(col("d")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("double"))
    // break at the exact midpoint of the observed index range —
    // integer-derived, so both engines split identically
    val brk = daily.agg(floor(max(col("t")) / lit(2.0)).as("b"))
    val df2 = daily.crossJoin(broadcast(brk))
      .withColumn("seg", (col("t") >= col("b")).cast("int"))
      .persistMemDisk
    def rss(g: DataFrame, by: Seq[Column]): DataFrame = {
      val agged = (if (by.isEmpty) g.groupBy() else g.groupBy(by: _*))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("t")).as("st"), sum(col("y")).as("sy"),
          sum(col("t") * col("t")).as("stt"),
          sum(col("t") * col("y")).as("sty"),
          sum(col("y") * col("y")).as("syy"))
      agged
        .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
        .withColumn("cty", col("sty") - col("st") * col("sy") / col("n"))
        .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
        .withColumn("rss",
          col("cyy") - col("cty") * col("cty") / col("ctt"))
    }
    val pooled = rss(df2, Seq.empty)
      .select(col("n").as("n_all"), col("rss").as("rss_p"))
    val split = rss(df2, Seq(col("seg")))
      .agg(sum(col("rss")).as("rss_s"), count(lit(1)).as("n_seg"))
    pooled.crossJoin(split)
      .withColumn("f_raw",
        ((col("rss_p") - col("rss_s")) / lit(2.0)) /
          (col("rss_s") / (col("n_all") - lit(4.0))))
      .select(col("n_all").cast("long").as("n_days"),
        round4eps(col("rss_p")).as("rss_pooled"),
        round4eps(col("rss_s")).as("rss_split"),
        round4eps(col("f_raw")).as("chow_f"),
        (round4eps(col("f_raw")) > 3.0).as("break_detected"))
  }

  /** Breusch-Pagan heteroskedasticity test on the daily-revenue trend
    * fit: squared OLS residuals regressed back on the day index,
    * LM = n·R²_aux against the quantized χ²₁ 5% value 3.84. Two chained
    * moment passes (the second reuses the broadcast first-stage betas —
    * the conformalOls two-stage pattern). Constant-size state at any
    * corpus: both passes collapse to the calendar axis first. */
  def breuschPagan(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(col("o_totalprice")) / lit(1000.0)).as("y"))
      .withColumn("t", datediff(col("d"),
        min(col("d")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("double"))
      .persistMemDisk
    val m1 = daily.agg(count(lit(1)).cast("double").as("n"),
        sum(col("t")).as("st"), sum(col("y")).as("sy"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("y")).as("sty"))
      .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
      .withColumn("beta",
        (col("sty") - col("st") * col("sy") / col("n")) / col("ctt"))
      .withColumn("alpha",
        col("sy") / col("n") - col("beta") * col("st") / col("n"))
      .select(round4eps(col("beta")).as("beta"),
        round4eps(col("alpha")).as("alpha"))
    daily.crossJoin(broadcast(m1))
      .withColumn("e2",
        (col("y") - col("alpha") - col("beta") * col("t")) *
          (col("y") - col("alpha") - col("beta") * col("t")))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("t")).as("st"), sum(col("e2")).as("se"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("e2")).as("ste"),
        sum(col("e2") * col("e2")).as("see"))
      .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
      .withColumn("cte", col("ste") - col("st") * col("se") / col("n"))
      .withColumn("cee", col("see") - col("se") * col("se") / col("n"))
      .withColumn("r2", col("cte") * col("cte") / col("ctt") / col("cee"))
      .select(col("n").cast("long").as("n_days"),
        round4eps(col("r2")).as("aux_r2"),
        round4eps(col("n") * col("r2")).as("lm_stat"),
        (round4eps(col("n") * col("r2")) > 3.84).as("heteroskedastic"))
  }

  /** Cook's distance — the top influential days of the daily-revenue
    * trend fit: D_i = e_i²·h_i / (p·s²·(1−h_i)²) with the simple-
    * regression leverage h_i = 1/n + (t_i − t̄)²/S_tt, p = 2. One
    * moment pass broadcasts (betas, s², t̄, S_tt); the per-day score is
    * then map-only and TakeOrdered keeps the top 5 — no global sort.
    * The flag compares against the 4/n rule of thumb. */
  def cooksDistance(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(col("o_totalprice")) / lit(1000.0)).as("y"))
      .withColumn("t", datediff(col("d"),
        min(col("d")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("double"))
      .persistMemDisk
    val m = daily.agg(count(lit(1)).cast("double").as("n"),
        sum(col("t")).as("st"), sum(col("y")).as("sy"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("y")).as("sty"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
      .withColumn("cty", col("sty") - col("st") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("beta", col("cty") / col("ctt"))
      .withColumn("alpha",
        col("sy") / col("n") - col("beta") * col("st") / col("n"))
      .withColumn("s2",
        (col("cyy") - col("beta") * col("cty")) / (col("n") - lit(2.0)))
      .withColumn("tbar", col("st") / col("n"))
      .select(round4eps(col("beta")).as("beta"),
        round4eps(col("alpha")).as("alpha"),
        round4eps(col("s2")).as("s2"),
        round4eps(col("tbar")).as("tbar"),
        round4eps(col("ctt")).as("ctt"), col("n"))
    daily.crossJoin(broadcast(m))
      .withColumn("e",
        col("y") - col("alpha") - col("beta") * col("t"))
      .withColumn("h", lit(1.0) / col("n") +
        (col("t") - col("tbar")) * (col("t") - col("tbar")) / col("ctt"))
      .withColumn("cook_raw", col("e") * col("e") * col("h") /
        (lit(2.0) * col("s2") * (lit(1.0) - col("h")) * (lit(1.0) - col("h"))))
      .select(col("d"), round4eps(col("cook_raw")).as("cooks_d"),
        round4eps(col("e")).as("residual"),
        (round4eps(col("cook_raw")) > round4eps(lit(4.0) / col("n")))
          .as("influential"))
      .orderBy(col("cooks_d").desc, col("d"))
      .limit(5)
  }

  /** Page-Hinkley drift detector over the daily mean order value: the
    * cumulative deviation U_t = Σ_{i≤t} (x_i − x̄_i − δ) against its
    * running minimum, alarm when PH_t = U_t − min U exceeds λ. Every
    * term is window-exact (running mean = cumsum/i — no recursion
    * truncation needed, unlike EWMA), over the calendar-collapsed
    * series. Reports the alarm days. */
  def pageHinkley(s: SparkSession, dir: String,
                  delta: Double = 0.5, lambda: Double = 50.0): DataFrame = {
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((avg(col("o_totalprice")) / lit(1000.0)).as("x"))
      .withColumn("i", count(lit(1)).over(w).cast("double"))
      .withColumn("xbar", round4eps(sum(col("x")).over(w) / col("i")))
      .withColumn("u", round4eps(
        sum(round4eps(col("x") - col("xbar") - lit(delta))).over(w)))
      .withColumn("ph", round4eps(col("u") - min(col("u")).over(w)))
      .filter(col("ph") > lambda)
      .select(col("d"), col("ph"),
        round4eps(col("x")).as("day_mean"), col("xbar").as("running_mean"))
      .orderBy(col("d"))
  }

  /** Engle-Granger cointegration screen between two regional daily
    * revenue series: OLS of series A on series B, then the lag-0
    * Dickey-Fuller unit-root test ON THE RESIDUALS (composing
    * [[adfTest]]'s closed form; stationary residuals = cointegrated).
    * Series built from one orders scan; both stages are moment
    * aggregates over the calendar-bounded day frame. The residual
    * stage reuses the broadcast first-stage betas, both quantized so
    * the oracle replays the identical two-step arithmetic. */
  def engleGranger(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(when(col("r_name") === "AMERICA",
          col("o_totalprice")).otherwise(lit(0.0))).as("ya_raw"),
        sum(when(col("r_name") === "EUROPE",
          col("o_totalprice")).otherwise(lit(0.0))).as("yb_raw"))
      .select(col("d"), (col("ya_raw") / lit(1000.0)).as("a"),
        (col("yb_raw") / lit(1000.0)).as("b"))
      .persistMemDisk
    val m1 = daily.agg(count(lit(1)).cast("double").as("n"),
        sum(col("b")).as("sb"), sum(col("a")).as("sa"),
        sum(col("b") * col("b")).as("sbb"),
        sum(col("b") * col("a")).as("sba"))
      .withColumn("cbb", col("sbb") - col("sb") * col("sb") / col("n"))
      .withColumn("beta",
        (col("sba") - col("sb") * col("sa") / col("n")) / col("cbb"))
      .withColumn("alpha",
        col("sa") / col("n") - col("beta") * col("sb") / col("n"))
      .select(round4eps(col("beta")).as("beta"),
        round4eps(col("alpha")).as("alpha"))
    val wd = Window.orderBy(col("d"))
    val resid = daily.crossJoin(broadcast(m1))
      .withColumn("e", round4eps(
        col("a") - col("alpha") - col("beta") * col("b")))
      .withColumn("elag", lag(col("e"), 1).over(wd))
      .filter(col("elag").isNotNull)
      .select((col("e") - col("elag")).as("dy"), col("elag").as("x"))
    resid.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("dy")).as("sxy"),
        sum(col("dy") * col("dy")).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("g", col("cxy") / col("cxx"))
      .withColumn("rss", col("cyy") - col("g") * col("cxy"))
      .withColumn("se", sqrt(col("rss") / (col("n") - 2) / col("cxx")))
      .withColumn("stat", round4eps(col("g") / col("se")))
      .select(col("n").cast("long").as("n_obs"),
        round4eps(col("g")).as("resid_gamma"),
        col("stat").as("eg_stat"),
        // Engle-Granger critical value is stricter than plain ADF
        // (estimated cointegrating vector): 5% ≈ -3.34
        (col("stat") < -3.34).as("cointegrated"))
  }

  /** Propensity-score stratification ATT: treatment = BUILDING-segment
    * customer, outcome = lifetime revenue, propensity from a linear
    * probability model on (account balance, order count) fit in
    * closed form (2-feature normal equations — the olsMulti pattern).
    * Customers are cut into 5 score strata by QUANTILE BOUNDARIES
    * computed on the quantized-score distribution collapse (cumulative
    * counts over the NDV-bounded histogram, then a map-side
    * boundary-count compare — the paretoShare discipline; a global
    * ntile would funnel every customer through one WindowExec task at
    * scale). Equal scores always land in the same stratum — better
    * semantics than ntile's arbitrary tie split, and engine-exact.
    * ATT is the treated-weighted average of within-stratum outcome
    * gaps — the classic Rosenbaum-Rubin subclassification estimator. */
  def propensityAtt(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("double").as("n_ord"),
        (sum(col("o_totalprice")) / lit(1000.0)).as("y"))
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("int")
          .cast("double").as("tr"),
        (col("c_acctbal") / lit(1000.0)).as("x1"))
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .withColumn("x2", col("n_ord"))
      .persistMemDisk
    // 2-feature LPM via the normal equations (centered covariances)
    val m = base.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("tr")).as("st"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("tr")).as("s1t"),
      sum(col("x2") * col("tr")).as("s2t"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1t = col("s1t") - col("s1") * col("st") / col("n")
    val c2t = col("s2t") - col("s2") * col("st") / col("n")
    val det = c11 * c22 - c12 * c12
    val betas = m.select(
      round4eps((c22 * c1t - c12 * c2t) / det).as("b1"),
      round4eps((c11 * c2t - c12 * c1t) / det).as("b2"),
      round4eps(col("st") / col("n")).as("tbar"),
      round4eps(col("s1") / col("n")).as("m1"),
      round4eps(col("s2") / col("n")).as("m2"))
    val scoredRaw = base.crossJoin(broadcast(betas))
      .withColumn("score", round4eps(col("tbar") +
        col("b1") * (col("x1") - col("m1")) +
        col("b2") * (col("x2") - col("m2"))))
      .persistMemDisk
    // quintile boundaries from the score histogram (NDV-bounded), then
    // stratum = 1 + #boundaries strictly below the score, map-side
    val hist = scoredRaw.groupBy(col("score")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("c")).as("nn"))
    val bounds = hist.crossJoin(broadcast(tot))
      .withColumn("cc", sum(col("c")).over(wCum))
      .withColumn("k", explode(sequence(lit(1), lit(4))))
      .filter(col("cc") >=
        ceil(col("nn").cast("double") * col("k") / 5.0).cast("long"))
      .groupBy(col("k")).agg(min(col("score")).as("b"))
      .agg(collect_list(col("b")).as("bs"))
    val scored = scoredRaw.crossJoin(broadcast(bounds))
      .withColumn("stratum", lit(1) + aggregate(col("bs"), lit(0),
        (acc, b) => acc + (col("score") > b).cast("int")))
    val strata = scored.groupBy(col("stratum"))
      .agg(sum(col("tr")).as("n_t"),
        sum(lit(1.0) - col("tr")).as("n_c"),
        sum(col("tr") * col("y")).as("sy_t"),
        sum((lit(1.0) - col("tr")) * col("y")).as("sy_c"))
      .filter(col("n_t") > 0 && col("n_c") > 0)
      .withColumn("gap", col("sy_t") / col("n_t") - col("sy_c") / col("n_c"))
    strata.agg(
        count(lit(1)).as("n_strata"),
        sum(col("n_t")).cast("long").as("n_treated"),
        sum(col("n_c")).cast("long").as("n_control"),
        round4eps(sum(col("gap") * col("n_t")) / sum(col("n_t")))
          .as("att"),
        round4eps(sum(col("gap")) / count(lit(1))).as("ate_unweighted"))
  }

  /** Two-sided normal p-value kernel: Φ via the Abramowitz-Stegun
    * 26.2.17 five-term polynomial — a deterministic rational
    * approximation (|ε| < 7.5e−8) both engines evaluate IDENTICALLY,
    * sidestepping the missing erf() on either side. Input and output
    * quantized at 1e-6. */
  private[graft] def pTwoSided(z: Column): Column = {
    def q6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(0.5) + lit(0.000001)) / lit(1000000.0)
    val az = q6(abs(z))
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    val phi = exp(-az * az / lit(2.0)) / lit(2.5066282746310002)
    q6(lit(2.0) * phi * poly)
  }

  /** Benjamini-Hochberg FDR over the per-nation mean-order-value
    * battery: each nation's two-sample z against the rest of the
    * world, p-values from [[pTwoSided]], then the BH step-up at
    * q = 0.1 — reject every p ≤ the LARGEST p_(k) ≤ k/m·q (the
    * step-up needs a suffix max, one more window). The multiple-
    * comparisons guard every per-segment metrics dashboard needs;
    * taxonomy-bounded (25 tests) after one fact scan. */
  /** The per-nation two-sample z battery shared by the multiple-
    * testing gates (BH, Holm, BY): each nation's mean order value
    * against the rest of the world, p-values from [[pTwoSided]].
    * Returned persisted (25 rows) so callers can count m without
    * re-running the fact scan. */
  private def nationZBattery(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        (col("o_totalprice") / lit(1000.0)).as("v"))
    val per = g.groupBy(col("nation"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"))
    val tot = per.agg(sum(col("n")).as("gn"), sum(col("sv")).as("gs"),
      sum(col("svv")).as("gss"))
    per.crossJoin(broadcast(tot))
      .withColumn("rn", col("gn") - col("n"))
      .withColumn("rs", col("gs") - col("sv"))
      .withColumn("rss", col("gss") - col("svv"))
      .withColumn("mu1", col("sv") / col("n"))
      .withColumn("mu0", col("rs") / col("rn"))
      .withColumn("v1", (col("svv") - col("sv") * col("sv") / col("n")) /
        (col("n") - lit(1.0)))
      .withColumn("v0", (col("rss") - col("rs") * col("rs") / col("rn")) /
        (col("rn") - lit(1.0)))
      .withColumn("z", (col("mu1") - col("mu0")) /
        sqrt(col("v1") / col("n") + col("v0") / col("rn")))
      .withColumn("p", pTwoSided(col("z")))
      // persisted before the m-count: without it the full
      // orders⋈customer scan+aggregation would run twice (once for m,
      // once for the ranked output) — the frame is 25 nation rows
      .persistMemDisk
  }

  def bhFdr(s: SparkSession, dir: String, q: Double = 0.1): DataFrame = {
    val withZ = nationZBattery(s, dir)
    val m = withZ.count().toDouble
    val wRank = Window.orderBy(col("p"), col("nation"))
    val wSuffix = Window.orderBy(col("p").desc, col("nation").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withZ
      .withColumn("rank", row_number().over(wRank))
      .withColumn("crit", round4eps(col("rank") / lit(m) * lit(q)))
      .withColumn("below", (col("p") <= col("crit")).cast("int"))
      // BH step-up: reject iff SOME rank >= this one has p <= crit
      .withColumn("rejected", max(col("below")).over(wSuffix) === 1)
      .select(col("nation"), col("rank"),
        round4eps(col("z")).as("z"),
        col("p").as("p_value"), col("crit").as("bh_crit"),
        col("rejected"))
      .orderBy(col("rank"))
  }

  /** Two-class Fisher linear discriminant over document features
    * (chars, tokens; classes en vs rest): w = S_pooled⁻¹(μ₁ − μ₀) from
    * the per-class moment matrices (2×2 closed-form inverse), with the
    * projected class means and the Fisher separation
    * (w·(μ₁−μ₀))² / (wᵀSw). One corpus scan → two 5-number moment
    * rows; everything after is scalar algebra. */
  def ldaDirection(s: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(s, dir)
      .select((col("lang") === "en").cast("int").as("cls"),
        (col("n_chars") / lit(100.0)).as("f1"),
        (size(split(col("text"), " ")) / lit(10.0)).cast("double").as("f2"))
    val per = feats.groupBy(col("cls"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("f1")).as("s1"), sum(col("f2")).as("s2"),
        sum(col("f1") * col("f1")).as("s11"),
        sum(col("f1") * col("f2")).as("s12"),
        sum(col("f2") * col("f2")).as("s22"))
      .withColumn("m1", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n"))
      .withColumn("c11", col("s11") - col("s1") * col("s1") / col("n"))
      .withColumn("c12", col("s12") - col("s1") * col("s2") / col("n"))
      .withColumn("c22", col("s22") - col("s2") * col("s2") / col("n"))
    val a = per.filter(col("cls") === 1).select(
      col("n").as("n1"), col("m1").as("a1"), col("m2").as("a2"),
      col("c11").as("p11"), col("c12").as("p12"), col("c22").as("p22"))
    val b = per.filter(col("cls") === 0).select(
      col("n").as("n0"), col("m1").as("b1"), col("m2").as("b2"),
      col("c11").as("q11"), col("c12").as("q12"), col("c22").as("q22"))
    a.crossJoin(b)
      .withColumn("s11", (col("p11") + col("q11")) /
        (col("n1") + col("n0") - lit(2.0)))
      .withColumn("s12", (col("p12") + col("q12")) /
        (col("n1") + col("n0") - lit(2.0)))
      .withColumn("s22", (col("p22") + col("q22")) /
        (col("n1") + col("n0") - lit(2.0)))
      .withColumn("d1", col("a1") - col("b1"))
      .withColumn("d2", col("a2") - col("b2"))
      .withColumn("det", col("s11") * col("s22") - col("s12") * col("s12"))
      .withColumn("w1",
        (col("s22") * col("d1") - col("s12") * col("d2")) / col("det"))
      .withColumn("w2",
        (col("s11") * col("d2") - col("s12") * col("d1")) / col("det"))
      .withColumn("sep",
        (col("w1") * col("d1") + col("w2") * col("d2")))
      .select(col("n1").cast("long").as("n_en"),
        col("n0").cast("long").as("n_rest"),
        round4eps(col("w1")).as("w_chars"),
        round4eps(col("w2")).as("w_tokens"),
        round4eps(col("w1") * col("a1") + col("w2") * col("a2"))
          .as("proj_en"),
        round4eps(col("w1") * col("b1") + col("w2") * col("b2"))
          .as("proj_rest"),
        round4eps(col("sep")).as("fisher_sep"))
  }

  /** Huber robust regression (IRLS, 3 unrolled iterations) on the
    * daily-revenue trend: outlier days get down-weighted by the Huber
    * weight w = min(1, k·s/|e|) instead of dragging the fit (OLS's
    * failure mode under the exact spike days cooksDistance surfaces).
    * The scale s is FIXED at the initial OLS residual sigma (quantized
    * once) — the textbook concomitant-scale refinement would re-
    * estimate s per iteration from a residual median, which has no
    * engine-exact form; fixing it keeps every iteration a pure
    * weighted moment pass both engines replay identically. Each
    * iteration: broadcast betas → map-side weights → one weighted
    * moment aggregate; 3 iterations = 3 chained passes over the
    * calendar-bounded frame. */
  def huberFit(s: SparkSession, dir: String, k: Double = 1.345): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(col("o_totalprice")) / lit(1000000.0)).as("y"))
      .withColumn("t", datediff(col("d"),
        min(col("d")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("double"))
      .persistMemDisk
    // initial OLS + fixed scale
    val m0 = daily.agg(count(lit(1)).cast("double").as("n"),
        sum(col("t")).as("st"), sum(col("y")).as("sy"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("y")).as("sty"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
      .withColumn("cty", col("sty") - col("st") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("beta", col("cty") / col("ctt"))
      .withColumn("alpha",
        col("sy") / col("n") - col("beta") * col("st") / col("n"))
      .withColumn("scale", sqrt(
        (col("cyy") - col("beta") * col("cty")) / (col("n") - lit(2.0))))
      .select(round4eps(col("beta")).as("beta"),
        round4eps(col("alpha")).as("alpha"),
        round4eps(col("scale")).as("scale"),
        round4eps(col("beta")).as("beta_ols"))
    def irlsStep(prev: DataFrame): DataFrame =
      daily.crossJoin(broadcast(prev))
        .withColumn("e", abs(col("y") - col("alpha") - col("beta") * col("t")))
        .withColumn("w", when(col("e") <= lit(k) * col("scale"), lit(1.0))
          .otherwise(round4eps(lit(k) * col("scale") / col("e"))))
        .agg(first(col("scale")).as("scale0"),
          first(col("beta_ols")).as("bols"),
          sum(col("w")).as("n"),
          sum(col("w") * col("t")).as("st"),
          sum(col("w") * col("y")).as("sy"),
          sum(col("w") * col("t") * col("t")).as("stt"),
          sum(col("w") * col("t") * col("y")).as("sty"),
          sum((col("w") < 1.0).cast("long")).as("n_down"))
        .withColumn("ctt", col("stt") - col("st") * col("st") / col("n"))
        .withColumn("b", (col("sty") - col("st") * col("sy") / col("n")) /
          col("ctt"))
        .select(round4eps(col("b")).as("beta"),
          round4eps(col("sy") / col("n") -
            col("b") * col("st") / col("n")).as("alpha"),
          col("scale0").as("scale"), col("bols").as("beta_ols"),
          col("n_down"))
    val it3 = irlsStep(irlsStep(irlsStep(m0).drop("n_down")).drop("n_down"))
    it3.select(col("beta").as("beta_huber"),
      col("alpha").as("alpha_huber"), col("beta_ols"),
      col("n_down").as("n_downweighted"))
  }

  /** Hodges-Lehmann shift estimator between BUILDING-segment and
    * other order values: the median of all pairwise differences — the
    * robust effect size that pairs with the Mann-Whitney test already
    * in the registry. Values are collapsed to $1000 buckets FIRST
    * (the kruskalWallis discipline), so the pairwise-difference frame
    * is value-domain²-bounded regardless of corpus size; the weighted
    * lower median reads off one cumulative-weight window. */
  def hodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING").cast("int").as("g"),
        floor(col("o_totalprice") / lit(1000.0)).as("v"))
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .persistMemDisk
    val a = vals.filter(col("g") === 1)
      .select(col("v").as("va"), col("c").as("ca"))
    val b = vals.filter(col("g") === 0)
      .select(col("v").as("vb"), col("c").as("cb"))
    val diffs = a.crossJoin(b)
      .groupBy((col("va") - col("vb")).as("diff"))
      .agg(sum(col("ca") * col("cb")).as("w"))
    val wCum = Window.orderBy(col("diff"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = diffs.agg(sum(col("w")).as("tw"))
    diffs.crossJoin(broadcast(tot))
      .withColumn("cw", sum(col("w")).over(wCum))
      // weighted LOWER median: first diff whose cumulative weight
      // clears ceil(tw/2) — rank arithmetic on exact integers
      .filter(col("cw") >= ceil(col("tw").cast("double") / 2.0).cast("long"))
      .agg(min(col("diff")).as("hl_shift_k"),
        first(col("tw")).as("n_pairs"))
      .select(col("hl_shift_k"), col("n_pairs"))
  }

  /** Siegel repeated-median trend: slope(i) = median_j of pairwise
    * slopes through day i, then the median over i — the 50%-breakdown
    * robust line (Theil-Sen, already gated, breaks at 29%). The pair
    * walk is DAYS² (calendar-bounded: replication adds rows, never
    * days); slopes are 1e-6-quantized before the medians and both
    * medians are exact LOWER medians by rank arithmetic, so the
    * nested-median pipeline is engine-exact.
    *
    * Constant-cut (r13 verdict Next #2, the matrixProfile treatment):
    * the old plan materialized all days² (day, slope) rows through a
    * theta join + full window sort. The daily series is calendar-
    * bounded (~2.4k rows at ANY data scale), so it is packed once
    * into a broadcast array and each day's slope multiset + exact
    * lower median is computed INSIDE one projection (array HOFs:
    * slopes to all other days, array_sort, rank pick) — no days²-row
    * shuffle, no window sort, no object aggregation. Slope values are
    * bit-identical to the join formulation (negating both numerator
    * and denominator is exact in IEEE), so the q6-quantized medians
    * hash-match the oracle unchanged. */
  def siegelSlope(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1000000.0)).as("y"))
      .withColumn("t", datediff(col("d"),
        min(col("d")).over(Window.orderBy(lit(1))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))).cast("double"))
      .select(col("t"), col("y"))
      .persistMemDisk
    val packed = daily.agg(
      collect_list(struct(col("t"), col("y"))).as("all"))
    // exact lower median = element ceil(n/2) of the sorted multiset —
    // value-identical to the old rank-filter (ties carry equal
    // values); the whole per-day pass runs in one compiled kernel
    // (an interpreted-HOF formulation measured SLOWER than the theta
    // join it was meant to replace — the r12 ROUGE lesson repeats)
    val perDay = daily.crossJoin(broadcast(packed))
      .select(graft.functions.SeriesFunctions
        .siegelDayMedian(col("all"), col("t"), col("y")).as("med_i"))
    perDay.agg(
      count(lit(1)).as("n_days"),
      element_at(array_sort(collect_list(col("med_i"))),
        ceil(count(lit(1)).cast("double") / 2.0).cast("int"))
        .as("siegel_slope"))
  }

  /** Periodogram sweep: single-frequency DFT power at every candidate
    * period 2..60 (the spectralPower math, swept instead of pinned),
    * top-3 periods by power. The sweep is an explode of the calendar-
    * bounded daily frame ×59 — still calendar-bounded; trig args
    * reduce mod P before cos/sin and trig values are 1e-6-quantized
    * (the established libm-parity discipline). */
  def periodogramTop(s: SparkSession, dir: String, maxP: Int = 60,
      topK: Int = 3): DataFrame = {
    import graft.functions.Rounding.round6eps
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .persistMemDisk
    val base = daily.agg(min(col("d")).as("d0"),
      round4eps(avg(col("rev"))).as("mu"))
    val withP = daily.crossJoin(broadcast(base))
      .withColumn("t", datediff(col("d"), col("d0")))
      .withColumn("p", explode(sequence(lit(2), lit(maxP))))
      .withColumn("theta",
        lit(2.0 * math.Pi) * (col("t") % col("p")) /
          col("p").cast("double"))
    withP.groupBy(col("p"))
      .agg(sum((col("rev") - col("mu")) * round6eps(cos(col("theta"))))
          .as("c"),
        sum((col("rev") - col("mu")) * round6eps(sin(col("theta"))))
          .as("sn"))
      .select(col("p").cast("long").as("period"),
        round4eps(col("c") * col("c") + col("sn") * col("sn"))
          .as("power"))
      .orderBy(col("power").desc, col("period"))
      .limit(topK)
  }

  /** Empirical-Bayes shrinkage of per-nation conversion rates toward
    * a beta prior fit by method of moments on the observed rates
    * (mean m, variance v → κ = m(1−m)/v − 1, α = mκ, β = (1−m)κ):
    * small nations move toward the pool, big ones barely — the
    * James-Stein companion (already gated for MEANS) specialized to
    * RATES with the correct beta-binomial geometry. Conversion =
    * purchase-users / active-users per nation; everything past the
    * fact scan is 25 rows. When the observed rates are
    * under-dispersed (v ≈ 0 → κ ≤ 0) the prior degenerates and raw
    * rates are reported with zero shrinkage, flagged. */
  def ebRates(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase").cast("int")).as("conv"))
    val perNation = perUser
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("conv")).cast("double").as("k"))
      .withColumn("rate", round4eps(col("k") / col("n")))
      .persistMemDisk
    val prior = perNation.agg(count(lit(1)).cast("double").as("g"),
        sum(col("rate")).as("sr"),
        sum(col("rate") * col("rate")).as("srr"))
      .withColumn("m", col("sr") / col("g"))
      .withColumn("v",
        (col("srr") - col("sr") * col("sr") / col("g")) /
          (col("g") - lit(1.0)))
      .withColumn("kap", when(col("v") > 0,
        col("m") * (lit(1.0) - col("m")) / col("v") - lit(1.0))
        .otherwise(lit(0.0)))
      .select(round4eps(col("m")).as("m"),
        round4eps(when(col("kap") > 0, col("kap")).otherwise(lit(0.0)))
          .as("kap"))
    perNation.crossJoin(broadcast(prior))
      .withColumn("alpha", col("m") * col("kap"))
      .withColumn("beta", (lit(1.0) - col("m")) * col("kap"))
      .select(col("nation"), col("n").cast("long").as("n_users"),
        col("rate").as("raw_rate"),
        round4eps((col("k") + col("alpha")) /
          (col("n") + col("kap"))).as("shrunk_rate"),
        round4eps(col("alpha")).as("prior_alpha"),
        round4eps(col("beta")).as("prior_beta"),
        (col("kap") === 0.0).as("degenerate_prior"))
      .orderBy(col("nation"))
  }

  /** Bradley-Terry preference strengths over brand pairwise "wins"
    * (within an order, brand i beats brand j when it ships more
    * units; ties drop) — the preference-model primitive behind RLHF
    * reward modeling and ranking-from-comparisons generally, run here
    * at the fixed-point it admits: p_i ← W_i / Σ_j n_ij/(p_i + p_j),
    * `iters` rounds from uniform, renormalized to mean 1 and
    * 1e-6-quantized each round so the oracle's UNROLLED iteration
    * blocks replay the identical trajectory. The distributed work is
    * the within-order pair count (fact-linear, bounded per-order
    * fan-out); the 25×25 win matrix is taxonomy-bounded metadata and
    * iterates driver-side (the brandScc bounded-collect discipline).
    * Output: wins, games, BT strength, rank, and the raw win rate the
    * fixed point corrects (win rate ignores opponent strength). */
  def bradleyTerry(s: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val ob = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_brand"))
      .agg(sum(col("l_quantity")).as("q"))
    val pairs = ob.as("a").join(ob.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.p_brand") < col("b.p_brand"))
      .filter(col("a.q") =!= col("b.q"))
      .select(
        when(col("a.q") > col("b.q"), col("a.p_brand"))
          .otherwise(col("b.p_brand")).as("winner"),
        when(col("a.q") > col("b.q"), col("b.p_brand"))
          .otherwise(col("a.p_brand")).as("loser"))
    val matrix = pairs.groupBy(col("winner"), col("loser"))
      .agg(count(lit(1)).as("w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(matrix.length <= 10000,
      s"brand win matrix has ${matrix.length} cells — taxonomy-bounded " +
        "(|brands|²) by construction")
    val brands = matrix.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = brands.zipWithIndex.toMap
    val k = brands.length
    val wins = Array.fill(k)(0.0)
    val games = Array.ofDim[Double](k, k)
    matrix.foreach { case (wi, lo, w) =>
      wins(idx(wi)) += w
      games(idx(wi))(idx(lo)) += w
      games(idx(lo))(idx(wi)) += w
    }
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5 + 1e-6) / 1e6
    var p = Array.fill(k)(1.0)
    for (_ <- 1 to iters) {
      val raw = Array.tabulate(k) { i =>
        var s0 = 0.0
        var j = 0
        while (j < k) {
          if (j != i && games(i)(j) > 0) s0 += games(i)(j) / (p(i) + p(j))
          j += 1
        }
        if (s0 > 0) wins(i) / s0 else 0.0
      }
      val mean = raw.sum / k
      p = raw.map(x => q6(x / mean))
    }
    val totalGames = Array.tabulate(k)(i => games(i).sum.toLong)
    import s.implicits._
    val ranked = brands.indices
      .sortBy(i => (-p(i), brands(i)))
      .zipWithIndex.map { case (i, r) => i -> (r + 1) }.toMap
    brands.indices.map(i => (brands(i), wins(i).toLong, totalGames(i),
        p(i), ranked(i),
        wins(i) / totalGames(i)))
      .toDF("brand", "wins", "games", "bt_raw", "bt_rank", "win_rate_raw")
      .select(col("brand"), col("wins"), col("games"),
        round4eps(col("bt_raw")).as("bt_strength"),
        col("bt_rank"),
        round4eps(col("win_rate_raw")).as("win_rate"))
      .orderBy(col("brand"))
  }

  /** Fairness audit of a classifier across customer segments: the
    * quantity-threshold stump (p = l_quantity ≥ 30, the
    * thresholdMetrics classifier) scored against returns, broken out
    * by market segment with the two standard group-fairness readouts —
    * demographic parity (positive-rate gap) and equalized odds
    * (max of TPR/FPR gaps) — attached as constant columns. The audit
    * every model-governance pipeline runs before a gate ships: a
    * filter can be accurate overall and still fire twice as often on
    * one segment. Segment cells are taxonomy-bounded after one
    * fact-keyed join. */
  def fairnessAudit(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        (col("l_quantity") >= 30).cast("long").as("p"),
        (col("l_returnflag") === "R").cast("long").as("y"))
    val per = li.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("double").as("sp"),
        sum(col("p") * col("y")).cast("double").as("tp"),
        sum(col("y")).cast("double").as("ny"),
        sum(col("p") * (lit(1L) - col("y"))).cast("double").as("fp"))
      .withColumn("pos_rate", round4eps(col("sp") / col("n")))
      .withColumn("tpr", round4eps(col("tp") / col("ny")))
      .withColumn("fpr", round4eps(col("fp") / (col("n") - col("ny"))))
      .persistMemDisk
    val gaps = per.agg(
      round4eps(max(col("pos_rate")) - min(col("pos_rate")))
        .as("dem_parity_gap"),
      round4eps(greatest(max(col("tpr")) - min(col("tpr")),
        max(col("fpr")) - min(col("fpr")))).as("eq_odds_gap"))
    per.crossJoin(broadcast(gaps))
      .select(col("segment"), col("n"), col("pos_rate"), col("tpr"),
        col("fpr"), col("dem_parity_gap"), col("eq_odds_gap"))
      .orderBy(col("segment"))
  }

  /** Baron-Kenny mediation with the Sobel test: does order PRIORITY
    * (X) move revenue (Y) through quantity (M)? Three moment OLS fits
    * over one order-grain frame — total effect c (Y~X), the mediator
    * path a (M~X), and the joint fit (Y~X+M) giving direct c′ and
    * b — with indirect = a·b and Sobel z = a·b/√(a²σ_b² + b²σ_a²).
    * The proportion-mediated readout is what turns "priority orders
    * are bigger" into "priority works THROUGH volume, not price". */
  def mediation(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(col("l_quantity")).as("m0"),
        (sum(col("l_extendedprice")) / lit(1000.0)).as("y"))
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .cast("int").cast("double").as("x"))
      .join(li, col("o_orderkey") === col("ok"))
      .select(col("x"), col("m0").as("m"), col("y"))
    g.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("m")).as("sm"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("m")).as("sxm"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("m") * col("m")).as("smm"),
        sum(col("m") * col("y")).as("smy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxm", col("sxm") - col("sx") * col("sm") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("cmm", col("smm") - col("sm") * col("sm") / col("n"))
      .withColumn("cmy", col("smy") - col("sm") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("c_tot", col("cxy") / col("cxx"))
      .withColumn("a", col("cxm") / col("cxx"))
      .withColumn("det", col("cxx") * col("cmm") - col("cxm") * col("cxm"))
      .withColumn("c_dir",
        (col("cmm") * col("cxy") - col("cxm") * col("cmy")) / col("det"))
      .withColumn("b",
        (col("cxx") * col("cmy") - col("cxm") * col("cxy")) / col("det"))
      .withColumn("rss_y", col("cyy") - col("c_dir") * col("cxy") -
        col("b") * col("cmy"))
      .withColumn("s2y", col("rss_y") / (col("n") - lit(3.0)))
      .withColumn("var_b", col("s2y") * col("cxx") / col("det"))
      .withColumn("rss_m", col("cmm") - col("a") * col("cxm"))
      .withColumn("var_a",
        col("rss_m") / (col("n") - lit(2.0)) / col("cxx"))
      .withColumn("ab", col("a") * col("b"))
      .select(col("n").cast("long").as("n_orders"),
        round4eps(col("c_tot")).as("total_effect"),
        round4eps(col("c_dir")).as("direct_effect"),
        round4eps(col("ab")).as("indirect_effect"),
        round4eps(col("ab") /
          sqrt(col("a") * col("a") * col("var_b") +
            col("b") * col("b") * col("var_a"))).as("sobel_z"),
        round4eps(col("ab") / col("c_tot")).as("prop_mediated"))
  }

  /** Doubly-robust ATT (AIPW): the propensity model (the LPM score
    * of [[propensityAtt]]) and per-arm linear OUTCOME models combine
    * into the augmented estimator — consistent if EITHER model is
    * right, the production default for observational effect readouts:
    *   ATE = mean[ t(y−m₁)/e + m₁ ] − mean[ (1−t)(y−m₀)/(1−e) + m₀ ].
    * All three models are moment closed forms broadcast back over one
    * persisted customer frame; scores are clipped to [0.02, 0.98]
    * (quantized) so no weight explodes. */
  def aipwAte(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("double").as("n_ord"),
        (sum(col("o_totalprice")) / lit(1000.0)).as("y"))
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("int")
          .cast("double").as("tr"),
        (col("c_acctbal") / lit(1000.0)).as("x1"))
      .join(perCust, col("c_custkey") === col("o_custkey"))
      .withColumn("x2", col("n_ord"))
      .persistMemDisk
    // propensity LPM (tr ~ x1 + x2), same normal equations as
    // propensityAtt
    def fit2(df: DataFrame, target: Column): DataFrame = {
      val mm = df.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(target).as("st"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * target).as("s1t"),
        sum(col("x2") * target).as("s2t"))
      val c11 = col("s11") - col("s1") * col("s1") / col("n")
      val c12 = col("s12") - col("s1") * col("s2") / col("n")
      val c22 = col("s22") - col("s2") * col("s2") / col("n")
      val c1t = col("s1t") - col("s1") * col("st") / col("n")
      val c2t = col("s2t") - col("s2") * col("st") / col("n")
      val det = c11 * c22 - c12 * c12
      mm.select(
        round4eps((c22 * c1t - c12 * c2t) / det).as("b1"),
        round4eps((c11 * c2t - c12 * c1t) / det).as("b2"),
        round4eps(col("st") / col("n")).as("mt"),
        round4eps(col("s1") / col("n")).as("m1"),
        round4eps(col("s2") / col("n")).as("m2"))
    }
    def predict(fitted: DataFrame, out: String)(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(fitted))
        .withColumn(out, round4eps(col("mt") +
          col("b1") * (col("x1") - col("m1")) +
          col("b2") * (col("x2") - col("m2"))))
        .drop("b1", "b2", "mt", "m1", "m2")
    val withE = predict(fit2(base, col("tr")), "e_raw")(base)
      .withColumn("e", round4eps(
        greatest(lit(0.02), least(lit(0.98), col("e_raw")))))
    val withM1 = predict(
      fit2(base.filter(col("tr") === 1.0), col("y")), "mu1")(withE)
    val withAll = predict(
      fit2(base.filter(col("tr") === 0.0), col("y")), "mu0")(withM1)
    withAll.agg(count(lit(1)).cast("double").as("n"),
        sum(col("tr") * (col("y") - col("mu1")) / col("e") + col("mu1"))
          .as("s1"),
        sum((lit(1.0) - col("tr")) * (col("y") - col("mu0")) /
          (lit(1.0) - col("e")) + col("mu0")).as("s0"),
        sum(col("tr")).as("nt"))
      .select(col("n").cast("long").as("n_customers"),
        col("nt").cast("long").as("n_treated"),
        round4eps(col("s1") / col("n")).as("mean_y1"),
        round4eps(col("s0") / col("n")).as("mean_y0"),
        round4eps(col("s1") / col("n") - col("s0") / col("n"))
          .as("aipw_ate"))
  }

  /** Generalized-Pareto tail fit (peaks over threshold, method of
    * moments): exceedances of order value over the exact P90 boundary
    * give (ξ, σ) via ξ = (1 − m²/v)/2, σ = m(1 + m²/v)/2 — the EVT
    * companion of the Hill estimator already gated (Hill assumes
    * ξ > 0; GPD MoM measures it, sign and all). The threshold is the
    * type-1 P90 of the $10-QUANTIZED value (2 decimals in thousands):
    * the quantization collapses the frame to the VALUE DOMAIN before
    * the cumulative rank, so the quantile never needs the global
    * single-partition sort an exact row-rank would (a 60M-row
    * WindowExec funnel at 100×) — the threshold granularity is $10,
    * which is immaterial to a tail fit; moments are one aggregate
    * over the exceedance scan. */
  def gpdTail(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.orders(s, dir)
      .select((col("o_totalprice") / lit(1000.0)).as("x"))
      .persistMemDisk
    def q2(c: Column): Column =
      floor(c * lit(100.0) + lit(0.5) + lit(0.000001)) / lit(100.0)
    val hist = v.groupBy(q2(col("x")).as("vq"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("vq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = hist.agg(sum(col("c")).as("nn"))
    val thr = hist.crossJoin(broadcast(tot))
      .withColumn("cc", sum(col("c")).over(wCum))
      .filter(col("cc") >=
        ceil(col("nn").cast("double") * 0.9).cast("long"))
      .agg(min(col("vq")).as("u"))
    v.crossJoin(broadcast(thr))
      .filter(col("x") > col("u"))
      .select((col("x") - col("u")).as("e"), col("u"))
      .agg(first(col("u")).as("u"),
        count(lit(1)).cast("double").as("n"),
        sum(col("e")).as("se"), sum(col("e") * col("e")).as("see"))
      .withColumn("m", col("se") / col("n"))
      .withColumn("vv", (col("see") - col("se") * col("se") / col("n")) /
        (col("n") - lit(1.0)))
      .select(col("u").as("threshold"),
        col("n").cast("long").as("n_exceed"),
        round4eps(col("m")).as("mean_excess"),
        round4eps((lit(1.0) - col("m") * col("m") / col("vv")) / lit(2.0))
          .as("gpd_xi"),
        round4eps(col("m") * (lit(1.0) + col("m") * col("m") / col("vv"))
          / lit(2.0)).as("gpd_sigma"),
        ((lit(1.0) - col("m") * col("m") / col("vv")) / lit(2.0) > 0)
          .as("heavy_tail"))
  }

  /** First-order stochastic dominance screen between BUILDING-segment
    * and other order values: F_building(v) vs F_rest(v) on the $1000
    * value grid — dominance holds when one CDF sits under the other at
    * EVERY grid point. Reports the verdict plus the maximal violation
    * in each direction (the KS-style evidence, but signed and
    * decision-oriented: "is A's distribution unambiguously richer").
    * Value-domain-bounded frame after one fact scan. */
  def stochDominance(s: SparkSession, dir: String): DataFrame = {
    val vals = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select((col("c_mktsegment") === "BUILDING").cast("int").as("g"),
        floor(col("o_totalprice") / lit(1000.0)).as("v"))
      .groupBy(col("v"))
      .agg(sum(col("g")).cast("double").as("c1"),
        sum(lit(1) - col("g")).cast("double").as("c0"))
      .persistMemDisk
    val tot = vals.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vals.crossJoin(broadcast(tot))
      .withColumn("f1", round4eps(sum(col("c1")).over(wCum) / col("n1")))
      .withColumn("f0", round4eps(sum(col("c0")).over(wCum) / col("n0")))
      .agg(count(lit(1)).as("n_grid"),
        round4eps(max(col("f1") - col("f0"))).as("max_f1_minus_f0"),
        round4eps(max(col("f0") - col("f1"))).as("max_f0_minus_f1"))
      .select(col("n_grid"), col("max_f1_minus_f0"),
        col("max_f0_minus_f1"),
        (col("max_f1_minus_f0") <= 0.0).as("building_dominates"),
        (col("max_f0_minus_f1") <= 0.0).as("rest_dominates"))
  }

  /** Poisson regression (log-link GLM, one binary covariate) of daily
    * order counts on the weekend indicator, by 4 driver-side Newton
    * steps over the collected calendar-bounded frame with
    * 1e-6-quantized iterates (the coxPh discipline — the oracle's
    * recursive CTE walks the identical trajectory). With a binary
    * covariate the sufficient statistics collapse to 4 numbers
    * (n₀, n₁, Σy₀, Σy₁), so each Newton step is exact scalar algebra:
    * score U = (Σy − Σμ, Σy₁ − Σμ₁), info blocks from the same sums.
    * Reports the rate ratio e^b with its Wald z. */
  def poissonReg(s: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .select(col("y"),
        (dayofweek(col("d")).isin(1, 7)).cast("int").cast("double").as("x"))
      .groupBy(col("x"))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("y")).as("sy"))
      .collect()
    require(daily.length <= 2, "binary covariate must give <= 2 groups")
    val (n0, sy0) = daily.find(_.getDouble(0) == 0.0)
      .map(r => (r.getDouble(1), r.getDouble(2))).getOrElse((0.0, 0.0))
    val (n1, sy1) = daily.find(_.getDouble(0) == 1.0)
      .map(r => (r.getDouble(1), r.getDouble(2))).getOrElse((0.0, 0.0))
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5 + 1e-6) / 1e6
    var a = 0.0; var b = 0.0
    for (_ <- 1 to iters) {
      val mu0 = n0 * math.exp(a); val mu1 = n1 * math.exp(a + b)
      val ua = (sy0 + sy1) - (mu0 + mu1)
      val ub = sy1 - mu1
      // 2x2 information: [[mu0+mu1, mu1], [mu1, mu1]]
      val det = (mu0 + mu1) * mu1 - mu1 * mu1
      a = q6(a + (mu1 * ua - mu1 * ub) / det)
      b = q6(b + ((mu0 + mu1) * ub - mu1 * ua) / det)
    }
    val infoB = 1.0 / ((n0 * math.exp(a) + n1 * math.exp(a + b)) /
      (n0 * math.exp(a) * n1 * math.exp(a + b)))
    import s.implicits._
    Seq((n0.toLong, n1.toLong, a, b, math.exp(b),
        b * math.sqrt(infoB)))
      .toDF("n_weekday", "n_weekend", "a_raw", "b_raw", "rr_raw", "z_raw")
      .select(col("n_weekday"), col("n_weekend"),
        round4eps(col("a_raw")).as("intercept"),
        round4eps(col("b_raw")).as("beta_weekend"),
        round4eps(col("rr_raw")).as("rate_ratio"),
        round4eps(col("z_raw")).as("wald_z"))
  }

  /** Daily-revenue risk ratios — the portfolio-style summary of a
    * revenue stream: mean/vol of day-over-day log returns, annualized
    * Sharpe (rf = 0), Sortino (downside-only deviation), and the hit
    * ratio. One calendar-collapsed frame, one lag window, one moment
    * aggregate. Log returns are quantized before the moments so both
    * engines fold identical series. */
  def riskRatios(s: SparkSession, dir: String): DataFrame = {
    val wd = Window.orderBy(col("d"))
    val rets = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .withColumn("prev", lag(col("rev"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .select(round4eps(log(col("rev") / col("prev"))).as("r"))
    rets.agg(count(lit(1)).cast("double").as("n"),
        sum(col("r")).as("sr"),
        sum(col("r") * col("r")).as("srr"),
        sum(when(col("r") < 0, col("r") * col("r"))
          .otherwise(lit(0.0))).as("sdd"),
        sum((col("r") > 0).cast("int")).cast("double").as("nup"))
      .withColumn("mu", col("sr") / col("n"))
      .withColumn("sd", sqrt(
        (col("srr") - col("sr") * col("sr") / col("n")) /
          (col("n") - lit(1.0))))
      .withColumn("dd", sqrt(col("sdd") / col("n")))
      .select(col("n").cast("long").as("n_days"),
        round4eps(col("mu")).as("mean_ret"),
        round4eps(col("sd")).as("vol"),
        round4eps(col("mu") / col("sd") * sqrt(lit(365.0)))
          .as("sharpe_ann"),
        round4eps(col("mu") / col("dd") * sqrt(lit(365.0)))
          .as("sortino_ann"),
        round4eps(col("nup") / col("n")).as("hit_ratio"))
  }

  // -----------------------------------------------------------------
  // Round-11 batch: stationarity / volatility / spectral / state-space
  // time-series kit over the calendar-bounded daily collapse — the
  // same scale shape as adfTest/periodogramTop (scan grows with the
  // corpus, the regressed frame never does).
  // -----------------------------------------------------------------

  /** KPSS level-stationarity test — the ADF complement (null here is
    * STATIONARY; running both corners the unit-root diagnosis). Daily
    * order counts, demeaned; η = T⁻² Σ S_t² / s²_L with S_t the
    * partial sums and s²_L the Bartlett-kernel long-run variance at
    * the documented fixed lag L = 5 (w_l = 1 − l/(L+1)). All inputs
    * are exact integer counts; the partial-sum window runs over the
    * calendar-bounded daily frame (≤ ~2.4k rows), never the corpus.
    * Verdict compares the quantized η to the 5% critical value
    * 0.463. */
  def kpssTest(s: SparkSession, dir: String, lags: Int = 5): DataFrame = {
    val w = Window.orderBy(col("d"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .persistMemDisk
    val mu = daily.agg(avg(col("y")).as("mu"),
      count(lit(1)).cast("double").as("tt"))
    val e = daily.crossJoin(broadcast(mu))
      .withColumn("e", col("y") - col("mu"))
      .withColumn("s", sum(col("e")).over(wCum))
    val lagged = (1 to lags).foldLeft(e) { (df, l) =>
      df.withColumn(s"e$l", lag(col("e"), l).over(w))
    }
    val gammas = (1 to lags).map { l =>
      sum(when(col(s"e$l").isNotNull, col("e") * col(s"e$l"))
        .otherwise(lit(0.0))).as(s"g$l")
    }
    val aggCols = Seq(sum(col("e") * col("e")).as("g0")) ++ gammas
    lagged.groupBy(col("tt"))
      .agg(sum(col("s") * col("s")).as("ss"), aggCols: _*)
      .withColumn("s2l",
        (col("g0") +
          (1 to lags).map(l =>
            lit(2.0 * (1.0 - l / (lags + 1.0))) * col(s"g$l"))
            .reduce(_ + _)) / col("tt"))
      .withColumn("eta", round4eps(
        col("ss") / (col("tt") * col("tt")) / col("s2l")))
      .select(col("tt").cast("long").as("n_obs"),
        round4eps(col("s2l")).as("lrv"),
        col("eta").as("kpss_stat"),
        (col("eta") < 0.463).as("level_stationary"))
  }

  /** Engle's ARCH LM test (1 lag) on daily revenue residuals: does
    * today's squared shock predict tomorrow's? e_t = y_t − ȳ (y in
    * $M), then the R² of e²_t ~ e²_{t−1} in moment closed form;
    * LM = n·R² vs χ²(1) at 5% (3.84). The volatility-clustering
    * screen that decides whether a constant-variance model is even
    * admissible. Same two-pass daily-collapse shape as adfTest. */
  def archLm(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d"))
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("y"))
      .persistMemDisk
    val mu = daily.agg(avg(col("y")).as("mu"))
    val sq = daily.crossJoin(broadcast(mu))
      .withColumn("e2",
        round4eps((col("y") - col("mu")) * (col("y") - col("mu"))))
      .withColumn("x", lag(col("e2"), 1).over(w))
      .filter(col("x").isNotNull)
    sq.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("e2")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("e2")).as("sxy"),
        sum(col("e2") * col("e2")).as("syy"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("r2",
        col("cxy") * col("cxy") / (col("cxx") * col("cyy")))
      .withColumn("lm", round4eps(col("n") * col("r2")))
      .select(col("n").cast("long").as("n_obs"),
        round4eps(col("cxy") / col("cxx")).as("arch_slope"),
        col("lm").as("lm_stat"),
        (col("lm") > 3.84).as("arch_effects"))
  }

  /** Spectral entropy of daily revenue: the periodogram powers
    * (periodogramTop's exact DFT-sum construction over periods
    * 2..maxP) normalized to a distribution, then H = −Σ q ln q,
    * reported raw and normalized by ln(#periods) — ≈1 means white
    * noise (flat spectrum), ≈0 means one dominant cycle. The
    * one-number "is there seasonality worth modeling" screen that
    * complements the top-k periodogram gate. Powers are quantized
    * before normalization and ln is quantized at 6dp (the documented
    * libm-parity idiom the cos/sin terms already use). */
  def spectralEntropy(s: SparkSession, dir: String, maxP: Int = 60): DataFrame = {
    import graft.functions.Rounding.round6eps
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .persistMemDisk
    val base = daily.agg(min(col("d")).as("d0"),
      round4eps(avg(col("rev"))).as("mu"))
    val powers = daily.crossJoin(broadcast(base))
      .withColumn("t", datediff(col("d"), col("d0")))
      .withColumn("p", explode(sequence(lit(2), lit(maxP))))
      .withColumn("theta",
        lit(2.0 * math.Pi) * (col("t") % col("p")) /
          col("p").cast("double"))
      .groupBy(col("p"))
      .agg(sum((col("rev") - col("mu")) * round6eps(cos(col("theta"))))
          .as("c"),
        sum((col("rev") - col("mu")) * round6eps(sin(col("theta"))))
          .as("sn"))
      .select(col("p"),
        round4eps(col("c") * col("c") + col("sn") * col("sn"))
          .as("power"))
      // a quantized power of exactly 0 would put ln(0) in the sum;
      // excluded on both engines (lim q→0 of q·ln q is 0 anyway)
      .filter(col("power") > 0)
    val tot = powers.agg(sum(col("power")).as("tp"),
      count(lit(1)).cast("double").as("k"))
    powers.crossJoin(broadcast(tot))
      .withColumn("q", col("power") / col("tp"))
      .agg(max(col("k")).as("k"),
        sum(-col("q") * round6eps(log(col("q")))).as("h"))
      .select(col("k").cast("long").as("n_periods"),
        round4eps(col("h")).as("entropy"),
        round4eps(col("h") / round6eps(log(col("k")))).as("normalized"))
  }

  /** Matrix profile (brute-force, days²-bounded): for every 7-day
    * window of daily revenue, the squared z-normalized distance to
    * its nearest non-overlapping window — low values are MOTIFS
    * (repeated weekly shapes), spikes are DISCORDS (anomalous weeks).
    * The time-series analog of near-dup mining. The pair walk is the
    * calendar-bounded days² theta join (siegelSlope's band:
    * replication adds rows, never days); window vectors are 6dp
    * z-quantized so both engines difference identical arrays. Flat
    * windows (σ = 0) are excluded, exclusion zone |Δrn| < 4.
    *
    * r13 constant cut (the q_rouge treatment): the per-pair kernel is
    * the VecL2Sq codegen loop — the exact same left-to-right
    * (p−q)² fold as the old `aggregate(zip_with(...))` HOF pair, minus
    * the per-pair array allocation and interpreted lambdas — and the
    * theta join walks only the ordered half (rb − ra ≥ 4), each pair's
    * distance contributing to BOTH endpoints' minima via one explode.
    * Same multiset into every min ⇒ output bit-identical; half the
    * pairs, several-fold cheaper per pair. (The MASS cumulant identity
    * was rejected: Σa²+Σb²−2ab is not the oracle's fold order, so it
    * would break hash parity on the 6dp-quantized windows.) */
  def matrixProfile(s: SparkSession, dir: String, m: Int = 7): DataFrame = {
    import graft.functions.Rounding.round6eps
    val w = Window.orderBy(col("d"))
    val wArr = w.rowsBetween(0, m - 1)
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val sub = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("arr", collect_list(col("rev")).over(wArr))
      .filter(size(col("arr")) === m)
      .withColumn("mu",
        aggregate(col("arr"), lit(0.0), (a, x) => a + x) / lit(m.toDouble))
      .withColumn("sd", sqrt(
        aggregate(col("arr"), lit(0.0),
          (a, x) => a + (x - col("mu")) * (x - col("mu"))) /
          lit(m.toDouble)))
      .filter(col("sd") > 0)
      .withColumn("z", transform(col("arr"),
        x => round6eps((x - col("mu")) / col("sd"))))
      .select(col("d"), col("rn"), col("z"))
      .persistMemDisk
    val a = sub.select(col("d").as("da"), col("rn").as("ra"),
      col("z").as("za"))
    val b = sub.select(col("d").as("db"), col("rn").as("rb"),
      col("z").as("zb"))
    a.join(b, col("rb") - col("ra") >= 4)
      .withColumn("dist", round6eps(
        graft.functions.VectorFunctions.l2Sq(col("za"), col("zb"))))
      .select(explode(array(
        struct(col("da").as("d"), col("dist")),
        struct(col("db").as("d"), col("dist")))).as("e"))
      .groupBy(col("e.d").as("d"))
      .agg(round4eps(min(col("e.dist"))).as("mp_dist"))
      .orderBy(col("d"))
  }

  /** Pettitt change-point test: the rank-based CUSUM
    * U_t = Σ_{i≤t}Σ_{j>t} sgn(x_i − x_j), located at its |max| — the
    * nonparametric complement to the mean-CUSUM gate (no normality,
    * robust to the revenue spikes that fool it). Midranks come from
    * the revenue value collapse (exact rank arithmetic; 2W_t keeps
    * everything integer-valued), U_t = 2W_t − t(n+1) is windowed off
    * the calendar-bounded daily frame, argmax ties break to the
    * earliest day. */
  def pettittTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .persistMemDisk
    val perV = daily.groupBy(col("rev")).agg(count(lit(1)).as("t"))
    val wV = Window.orderBy(col("rev"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV
      .withColumn("cb", coalesce(sum(col("t")).over(wV), lit(0L)))
      .select(col("rev"), (col("cb") + (col("t") + 1) / lit(2.0)).as("r"))
    val wD = Window.orderBy(col("d"))
    val wCum = wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = daily.agg(count(lit(1)).as("n"))
    daily.join(broadcast(ranked), "rev")
      .crossJoin(broadcast(n))
      .withColumn("rn", row_number().over(wD))
      .withColumn("u",
        lit(2.0) * sum(col("r")).over(wCum) -
          col("rn").cast("double") * (col("n") + 1))
      .filter(col("rn") < col("n")) // U_n ≡ 0, not a candidate
      .orderBy(abs(col("u")).desc, col("d"))
      .limit(1)
      .select(col("d").as("change_day"),
        col("u").cast("long").as("u_stat"),
        col("n").as("n_days"))
  }

  /** Classical seasonal decomposition (moving-average method) of
    * daily revenue: trend = centered 7-day MA, seasonal index =
    * re-centered weekday mean of the detrended series — the additive
    * weekly profile ($M deviation per weekday) a planner reads
    * before any model. Weekday is computed as days-since-a-known-
    * Monday mod 7 (pure integer arithmetic — immune to the engines'
    * different DOW numbering conventions). Raw weekday means are
    * 6dp-quantized before re-centering. */
  def classicalDecomp(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val w = Window.orderBy(col("d"))
    val wMa = w.rowsBetween(-3, 3)
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val det = daily
      .withColumn("nw", count(lit(1)).over(wMa))
      .withColumn("trend", avg(col("rev")).over(wMa))
      .filter(col("nw") === 7)
      .withColumn("dow", pmod(datediff(col("d"), lit("1990-01-01").cast("date")), lit(7)))
      .select(col("dow"), (col("rev") - col("trend")).as("det"))
    val perDow = det.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), round6eps(avg(col("det"))).as("raw"))
      .persistMemDisk
    val center = perDow.agg(avg(col("raw")).as("c"))
    perDow.crossJoin(broadcast(center))
      .select(col("dow"), col("n_days"),
        round4eps(col("raw") - col("c")).as("seasonal_idx"))
      .orderBy(col("dow"))
  }

  /** Youden-J optimal threshold: sweep EVERY integer quantity cutoff
    * as the "large line → return risk" decision rule and report the
    * threshold maximizing J = TPR − FPR (the operating point
    * [[thresholdMetrics]] evaluates at its single fixed cutoff). The
    * sweep is a cumulative-count pass over the value-bounded quantity
    * collapse (≤50 distinct values), never a per-row sort; TPR/FPR
    * are exact integer ratios, the argmax breaks ties on the SMALLER
    * threshold. */
  def youdenJ(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("q"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      .groupBy(col("q"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
      .persistMemDisk
    val tot = cells.agg(sum(col("pos")).cast("double").as("tp"),
      sum(col("neg")).cast("double").as("tn"))
    // cumulative FROM ABOVE: predict positive when q >= threshold
    val wGe = Window.orderBy(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(tot))
      .withColumn("cpos", sum(col("pos")).over(wGe).cast("double"))
      .withColumn("cneg", sum(col("neg")).over(wGe).cast("double"))
      .withColumn("tpr", col("cpos") / col("tp"))
      .withColumn("fpr", col("cneg") / col("tn"))
      .withColumn("j", round4eps(col("tpr") - col("fpr")))
      .orderBy(col("j").desc, col("q"))
      .limit(1)
      .select(col("q").as("best_threshold"),
        round4eps(col("tpr")).as("tpr"),
        round4eps(col("fpr")).as("fpr"),
        col("j").as("youden_j"))
  }

  /** Qn-flavored robust scale of the order-value distribution: the
    * k-th order statistic (k = C(h,2), h = ⌊n/2⌋+1) of all pairwise
    * absolute differences, scaled by the consistency constant 2.2219
    * — Rousseeuw-Croux's 50%-breakdown scale that, unlike MAD, needs
    * no location estimate and keeps 82% Gaussian efficiency. The
    * "pair walk" is the $1000 VALUE-BUCKET weighted frame (same
    * collapse as [[hodgesLehmann]]): |differences| carry ca·cb
    * weights, equal-bucket pairs c(c−1)/2 at zero, and the k-th
    * statistic is exact integer rank arithmetic over the cumulative
    * weights — never an n² row join. */
  def qnScale(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / lit(1000.0)).cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .persistMemDisk
    val a = buckets.select(col("v").as("va"), col("c").as("ca"))
    val b = buckets.select(col("v").as("vb"), col("c").as("cb"))
    val cross = a.crossJoin(b).filter(col("va") < col("vb"))
      .groupBy((col("vb") - col("va")).as("diff"))
      .agg(sum(col("ca") * col("cb")).as("w"))
    val zero = buckets
      .agg((sum(col("c") * (col("c") - lit(1L))) / 2).cast("long").as("w"))
      .select(lit(0L).as("diff"), col("w"))
    val diffs = zero.unionAll(cross)
    val n = buckets.agg(sum(col("c")).as("n"))
      .withColumn("h", floor(col("n") / 2).cast("long") + 1)
      .withColumn("kk", (col("h") * (col("h") - 1) / 2).cast("long"))
    val wCum = Window.orderBy(col("diff"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    diffs.crossJoin(broadcast(n))
      .withColumn("cw", sum(col("w")).over(wCum))
      .filter(col("cw") >= col("kk"))
      .agg(max(col("n")).as("n"), max(col("kk")).as("kk"),
        min(col("diff")).as("qn_k"))
      .select(col("n").as("n_orders"), col("kk").as("k_rank"),
        col("qn_k").as("qn_raw_k"),
        round4eps(lit(2.2219) * col("qn_k")).as("qn_scale_k"))
  }

  /** Cochran-Armitage trend test: does the fulfilled-order rate move
    * MONOTONICALLY with order priority (scores 1..5 from the priority
    * prefix digit)? More powerful than the chi-square independence
    * screen when the alternative is ordered. T = Σ s_i(N·r_i − n_i·R)
    * and its variance are EXACT integer sums off one taxonomy-bounded
    * (5-row) rollup; the only doubles are the final two divisions. */
  def cochranArmitage(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("sc"),
        (col("o_orderstatus") === "F").cast("long").as("out"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("ni"), sum(col("out")).as("ri"))
      .persistMemDisk
    val tot = per.agg(sum(col("ni")).as("nn"), sum(col("ri")).as("rr"))
    per.crossJoin(broadcast(tot))
      .agg(max(col("nn")).as("nn"), max(col("rr")).as("rr"),
        sum(col("sc").cast("double") *
          (col("nn") * col("ri") - col("ni") * col("rr")).cast("double"))
          .as("t"),
        sum(col("sc") * col("sc") * col("ni")).cast("double").as("ssn"),
        sum(col("sc") * col("ni")).cast("double").as("sn"))
      .withColumn("nD", col("nn").cast("double"))
      .withColumn("varT",
        col("rr").cast("double") * (col("nn") - col("rr")) / col("nD") *
          (col("nD") * col("ssn") - col("sn") * col("sn")))
      .withColumn("z", round4eps(col("t") / sqrt(col("varT"))))
      .select(col("nn").as("n_orders"), col("rr").as("n_fulfilled"),
        col("z").as("trend_z"),
        (abs(col("z")) > 1.96).as("trend_present"))
  }

  /** Mantel-Haenszel pooled odds ratio across region strata: the
    * urgent-priority → fulfilled association, adjusted for region mix
    * (the confounder-stratified effect every segmented dashboard
    * should report INSTEAD of the crude pooled OR — Simpson's-paradox
    * insurance). OR_MH = Σ(aᵢdᵢ/nᵢ)/Σ(bᵢcᵢ/nᵢ) off one 5-stratum 2×2
    * rollup; the crude OR rides along for the comparison. */
  def mantelHaenszel(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").as("st"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          .cast("long").as("e"),
        (col("o_orderstatus") === "F").cast("long").as("o"))
      .groupBy(col("st"))
      .agg(sum(col("e") * col("o")).cast("double").as("a"),
        sum(col("e") * (lit(1L) - col("o"))).cast("double").as("b"),
        sum((lit(1L) - col("e")) * col("o")).cast("double").as("c"),
        sum((lit(1L) - col("e")) * (lit(1L) - col("o")))
          .cast("double").as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
    cells.agg(count(lit(1)).as("n_strata"),
        sum(col("a") * col("d") / col("n")).as("num"),
        sum(col("b") * col("c") / col("n")).as("den"),
        sum(col("a")).as("ta"), sum(col("b")).as("tb"),
        sum(col("c")).as("tc"), sum(col("d")).as("td"))
      .select(col("n_strata"),
        round4eps(col("num") / col("den")).as("or_mh"),
        round4eps(col("ta") * col("td") / (col("tb") * col("tc")))
          .as("or_crude"))
  }

  /** Dunn's post-hoc pairwise comparisons after [[kruskalWallis]]:
    * which REGION PAIRS actually differ in order-value distribution
    * once the omnibus H rejects? Mean ranks come from the same $1000
    * value-bucket distribution collapse (midranks via cumulative
    * bucket counts — the ranked frame is VALUE-DOMAIN-bounded, never
    * corpus-sized); z_ij uses the tie-corrected variance and the
    * Bonferroni-adjusted 5% cut for the 10 pairs (2.807). */
  def dunnPosthoc(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey").as("g"),
        floor(col("o_totalprice") / 1000).cast("long").as("v"))
    val cells = o.groupBy(col("v"), col("g")).agg(count(lit(1)).as("c"))
      .persistMemDisk
    val perV = cells.groupBy(col("v")).agg(sum(col("c")).as("t"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perV
      .withColumn("cb", coalesce(sum(col("t")).over(w), lit(0L)))
      .select(col("v"), col("t"), col("cb"))
      .persistMemDisk
    val rg = cells.join(broadcast(ranked), "v")
      .groupBy(col("g"))
      .agg(sum(col("c")).as("ng"),
        sum(col("c") * (col("cb") + (col("t") + 1) / lit(2.0))).as("rg"))
      .withColumn("mr", col("rg") / col("ng"))
      .persistMemDisk
    val tot = rg.agg(sum(col("ng")).cast("double").as("n")).crossJoin(
      broadcast(ranked.agg(
        sum(col("t").cast("double") * col("t") * col("t") - col("t"))
          .as("ties"))))
    val a = rg.select(col("g").as("g1"), col("ng").as("n1"), col("mr").as("m1"))
    val b = rg.select(col("g").as("g2"), col("ng").as("n2"), col("mr").as("m2"))
    a.crossJoin(b).filter(col("g1") < col("g2"))
      .crossJoin(broadcast(tot))
      .withColumn("varc",
        (col("n") * (col("n") + 1) / lit(12.0) -
          col("ties") / (lit(12.0) * (col("n") - 1))) *
          (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
      .withColumn("z", round4eps(
        (col("m1") - col("m2")) / sqrt(col("varc"))))
      .select(col("g1"), col("g2"), col("z").as("dunn_z"),
        (abs(col("z")) > 2.807).as("significant"))
      .orderBy(col("g1"), col("g2"))
  }

  /** Two-sample Anderson-Darling (discrete/tied form over the $1000
    * value-bucket collapse): fulfilled vs open order-value
    * distributions, with the classic AD tail weighting 1/(B(N−B)) —
    * more sensitive in the tails than KS, which is exactly where
    * order-value drift shows first. A² = (1/(m·n)) Σ_{j<k} l_j
    * (N·M_j − m·B_j)² / (B_j(N−B_j)): every symbol is an exact
    * integer off the bounded bucket frame. */
  def andersonDarling2(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select((col("o_orderstatus") === "F").cast("long").as("g1"),
        floor(col("o_totalprice") / 1000).cast("long").as("v"))
    val cells = o.groupBy(col("v"))
      .agg(sum(col("g1")).as("m1"), count(lit(1)).as("l"))
      .persistMemDisk
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.agg(sum(col("m1")).cast("double").as("m"),
      sum(col("l")).cast("double").as("nn"))
    val cum = cells
      .withColumn("mj", sum(col("m1")).over(w).cast("double"))
      .withColumn("bj", sum(col("l")).over(w).cast("double"))
      .crossJoin(broadcast(tot))
      .filter(col("bj") < col("nn")) // j < k: the last term is 0/0
    cum.agg(max(col("m")).as("m"), max(col("nn")).as("nn"),
        sum(col("l") * (col("nn") * col("mj") - col("m") * col("bj")) *
          (col("nn") * col("mj") - col("m") * col("bj")) /
          (col("bj") * (col("nn") - col("bj")))).as("acc"))
      .select(col("m").cast("long").as("n_fulfilled"),
        (col("nn") - col("m")).cast("long").as("n_open"),
        round4eps(col("acc") / (col("m") * (col("nn") - col("m"))))
          .as("a2_stat"))
  }

  /** Hausman endogeneity test on the [[iv2sls]] pair: is the OLS
    * quantity→revenue slope actually inconsistent (so the IV detour
    * is WORTH its variance cost), or statistically identical to the
    * IV slope? H = (b_IV − b_OLS)² / (V_IV − V_OLS) vs χ²(1); both
    * variances use the IV-residual σ² (the consistent-under-both
    * estimate), all from ONE moment aggregation over the order-grain
    * rollup. */
  def hausmanTest(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("ok"))
      .agg((sum(col("l_extendedprice")) / lit(100000.0)).as("y"),
        (sum(col("l_quantity")) / lit(100.0)).as("x"))
    val g = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .cast("int").cast("double").as("z"))
      .join(li, col("o_orderkey") === col("ok"))
    g.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(col("z") * col("x")).as("szx"),
        sum(col("z") * col("y")).as("szy"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("czx", col("szx") - col("sz") * col("sx") / col("n"))
      .withColumn("czy", col("szy") - col("sz") * col("sy") / col("n"))
      .withColumn("czz", col("szz") - col("sz") * col("sz") / col("n"))
      .withColumn("cxx", col("sxx") - col("sx") * col("sx") / col("n"))
      .withColumn("cxy", col("sxy") - col("sx") * col("sy") / col("n"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("n"))
      .withColumn("biv", col("czy") / col("czx"))
      .withColumn("bols", col("cxy") / col("cxx"))
      .withColumn("s2",
        (col("cyy") - lit(2.0) * col("biv") * col("cxy") +
          col("biv") * col("biv") * col("cxx")) / (col("n") - lit(2.0)))
      .withColumn("viv", col("s2") * col("czz") / (col("czx") * col("czx")))
      .withColumn("vols", col("s2") / col("cxx"))
      .withColumn("h", round4eps(
        (col("biv") - col("bols")) * (col("biv") - col("bols")) /
          (col("viv") - col("vols"))))
      .select(col("n").cast("long").as("n_orders"),
        round4eps(col("biv")).as("beta_iv"),
        round4eps(col("bols")).as("beta_ols"),
        col("h").as("hausman_stat"),
        (col("h") > 3.84).as("endogenous"))
  }

  /** Local-level Kalman filter over daily revenue ($M): the simplest
    * state-space smoother (x_{t+1} = x_t + w, y_t = x_t + v) with
    * documented fixed noise variances q = 0.01, r = 1.0, x₀ = y₀,
    * P₀ = 1. The filtered level is the online-denoised revenue trend
    * a monitoring pipeline tracks; gain K_t converges within ~20
    * steps.
    *
    * Scale shape: the distributed work is the daily collapse; the
    * recursion runs DRIVER-side over the calendar-bounded series
    * (loud require, same class as coxPh's Newton steps — a scalar
    * recursion over ≤ ~2.4k rows is not a distributed job). The state
    * is quantized to 6dp each step on BOTH engines (the coxPh
    * trajectory idiom), so the DuckDB recursive-CTE oracle replays
    * the trajectory bit-identically. */
  def kalmanLevel(s: SparkSession, dir: String,
      q: Double = 0.01, r: Double = 1.0): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("y"))
      .orderBy(col("d"))
    val series = daily.collect().map(row =>
      (row.getDate(0), row.getDouble(1)))
    require(series.length <= 6000,
      s"kalmanLevel: calendar-bounded series expected, got ${series.length} days")
    // the driver-side twin of Rounding.round6eps (identical constants,
    // so the oracle's floor(v*1e6 + 0.5 + 1e-6)/1e6 replays each step)
    def q6(v: Double): Double =
      math.floor(v * 1e6 + 0.5 + 1e-6) / 1e6
    var x = series.head._2
    var p = 1.0
    val out = series.map { case (d, y) =>
      val pPred = p + q
      val k = q6(pPred / (pPred + r))
      x = q6(x + k * (y - x))
      p = q6((1.0 - k) * pPred)
      (d, y, x, k)
    }
    import s.implicits._
    s.createDataset(out.toSeq)
      .toDF("d", "rev", "level", "gain")
      .select(col("d"), col("rev"),
        round4eps(col("level")).as("level"),
        round4eps(col("gain")).as("gain"))
  }

  /** Approximate query processing self-audit: per return flag, the
    * exact revenue total alongside its Horvitz-Thompson estimate from
    * a deterministic 10% hash sample (inclusion decided by a
    * replayable modular hash of the row key, so the "sample" is a
    * stable row property, not an RNG draw), the Bernoulli-sampling
    * variance estimate V̂ = ((1−p)/p²)·Σₛxᵢ², and whether the ±2se
    * interval covers the truth. At 100 TB the production form scans
    * ONLY the sample partition (a 10× scan cut for ~0.3% error on
    * these margins); this gate computes exact and estimate in one
    * pass to audit that trade.
    *
    * Scale shape: ONE conditional-moment aggregation keyed by flag
    * (3 groups), fully map-side combined. Whole-dollar integer
    * measures keep Σx and Σx² exact longs at any SF (cents would
    * overflow Σx² at sf1). */
  def aqpRevenue(s: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_extendedprice")).cast("long").as("v"),
      (((col("l_orderkey") % 1000003L) * 2654435761L +
        col("l_linenumber") * 97L) % 100L).as("h"))
    val p = pct / 100.0
    li.groupBy(col("flag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v")).as("exact_v"),
        sum(when(col("h") < pct, 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("h") < pct, col("v")).otherwise(0L)).as("sv"),
        sum(when(col("h") < pct, col("v") * col("v")).otherwise(0L))
          .as("svv"))
      .select(col("flag"), col("n_rows"), col("n_sampled"),
        round4eps(col("exact_v").cast("double") / lit(1e6))
          .as("exact_musd"),
        round4eps(col("sv").cast("double") / lit(p) / lit(1e6))
          .as("est_musd"),
        round4eps(abs(col("exact_v").cast("double") -
          col("sv").cast("double") / lit(p)) /
          col("exact_v").cast("double")).as("rel_err"),
        round4eps(sqrt(col("svv").cast("double") *
          lit((1.0 - p) / (p * p))) / lit(1e6)).as("se_musd"),
        (abs(col("exact_v").cast("double") -
          col("sv").cast("double") / lit(p)) <=
          lit(2.0) * sqrt(col("svv").cast("double") *
            lit((1.0 - p) / (p * p)))).as("covered"))
      .orderBy(col("flag"))
  }

  /** Murphy decomposition of the Brier score over the same
    * (discount-as-score, returned-as-outcome) panel the calibration
    * gate reads: Brier = reliability − resolution + uncertainty, with
    * reliability = Σnᵦ(confᵦ−accᵦ)²/N, resolution = Σnᵦ(accᵦ−ȳ)²/N,
    * uncertainty = ȳ(1−ȳ). Because the score is constant within each
    * bin, the identity is EXACT here — the identity_gap column pins
    * it at 0 as a cross-engine self-check. The decomposition says
    * WHY a Brier number is bad (miscalibration vs no discrimination),
    * which the raw score can't.
    *
    * Scale shape: one bin-keyed count pass (11 discount levels, a
    * fixed vocabulary), then scalar algebra on the 11-row frame —
    * the calibration gate's exact economics. */
  def brierDecomp(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      round(col("l_discount") * 100).cast("long").as("bin"),
      col("l_discount").as("score"),
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("y"))
    val bins = li.groupBy(col("bin"))
      .agg(count(lit(1)).cast("double").as("nb"),
        max(col("score")).as("conf"),
        sum(col("y")).as("sy"),
        sum((col("score") - col("y")) * (col("score") - col("y")))
          .as("sq"))
    val tot = bins.agg(sum(col("nb")).as("n"), sum(col("sy")).as("sy_all"),
      sum(col("sq")).as("sq_all"))
    val ybar = col("sy_all") / col("n")
    val acc = col("sy") / col("nb")
    bins.crossJoin(broadcast(tot))
      .agg(
        max(col("n")).cast("long").as("n"),
        round4eps(max(col("sq_all")) / max(col("n"))).as("brier"),
        round4eps(sum(col("nb") * (col("conf") - acc) * (col("conf") - acc)) /
          max(col("n"))).as("reliability"),
        round4eps(sum(col("nb") * (acc - ybar) * (acc - ybar)) /
          max(col("n"))).as("resolution"),
        round4eps(max(ybar) * (lit(1.0) - max(ybar))).as("uncertainty"),
        round4eps(max(col("sq_all")) / max(col("n")) -
          (sum(col("nb") * (col("conf") - acc) * (col("conf") - acc)) /
            max(col("n")) -
            sum(col("nb") * (acc - ybar) * (acc - ybar)) / max(col("n")) +
            max(ybar) * (lit(1.0) - max(ybar)))).as("identity_gap"))
  }

  /** Holm step-down (FWER) and Benjamini-Yekutieli (FDR under
    * arbitrary dependence) over the SAME per-nation z battery the BH
    * gate reads — the two corrections a dashboard adds when BH's
    * independence assumption is in doubt: Holm rejects while EVERY
    * smaller p clears α/(m−i+1) (a prefix-min), BY is BH with the
    * harmonic-number penalty c(m)=Σ1/i (a suffix-max step-up). The
    * harmonic number is computed FROM the ranked frame (Σ 1/rank), so
    * both engines derive it from identical integers.
    *
    * Scale shape: the battery is one fact scan collapsed to 25 nation
    * rows (see [[nationZBattery]]); everything here is windows over
    * that taxonomy-bounded frame. */
  def holmByFdr(s: SparkSession, dir: String, alpha: Double = 0.05,
      q: Double = 0.1): DataFrame = {
    val withZ = nationZBattery(s, dir)
    val m = withZ.count().toDouble
    val wRank = Window.orderBy(col("p"), col("nation"))
    val wAll = Window.orderBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrefix = Window.orderBy(col("p"), col("nation"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSuffix = Window.orderBy(col("p").desc, col("nation").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withZ
      .withColumn("rank", row_number().over(wRank))
      .withColumn("cm", sum(lit(1.0) / col("rank")).over(wAll))
      .withColumn("holm_crit",
        round4eps(lit(alpha) / (lit(m) - col("rank") + 1)))
      .withColumn("holm_below", (col("p") <= col("holm_crit")).cast("int"))
      .withColumn("rejected_holm", min(col("holm_below")).over(wPrefix) === 1)
      .withColumn("by_crit",
        round4eps(col("rank") / lit(m) / col("cm") * lit(q)))
      .withColumn("by_below", (col("p") <= col("by_crit")).cast("int"))
      .withColumn("rejected_by", max(col("by_below")).over(wSuffix) === 1)
      .select(col("nation"), col("rank"), col("p").as("p_value"),
        col("holm_crit"), col("rejected_holm"),
        col("by_crit"), col("rejected_by"))
      .orderBy(col("rank"))
  }

  /** TOST equivalence test: are BUILDING and MACHINERY mean order
    * values equivalent within ±5% of the pooled mean? Two one-sided
    * z tests — BOTH (diff+δ)/se and (δ−diff)/se must clear 1.645 —
    * the inferential opposite of the difference tests (absence of
    * evidence ≠ evidence of absence; TOST is how you CLAIM sameness).
    *
    * Scale shape: one segment-keyed moment pass (whole-dollar integer
    * sums — Σv² stays an exact long at any SF), then scalar algebra
    * on 2 rows. */
  def tostEquivalence(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select((col("c_mktsegment") === "BUILDING").as("grp"),
        round(col("o_totalprice")).cast("long").as("v"))
    val per = g.groupBy(col("grp"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("v")).cast("double").as("sv"),
        sum(col("v") * col("v")).cast("double").as("svv"))
    val wide = per.agg(
      sum(when(col("grp"), col("n")).otherwise(0.0)).as("n1"),
      sum(when(col("grp"), col("sv")).otherwise(0.0)).as("s1"),
      sum(when(col("grp"), col("svv")).otherwise(0.0)).as("ss1"),
      sum(when(!col("grp"), col("n")).otherwise(0.0)).as("n0"),
      sum(when(!col("grp"), col("sv")).otherwise(0.0)).as("s0"),
      sum(when(!col("grp"), col("svv")).otherwise(0.0)).as("ss0"))
    val mu1 = col("s1") / col("n1")
    val mu0 = col("s0") / col("n0")
    val v1 = (col("ss1") - col("s1") * col("s1") / col("n1")) /
      (col("n1") - 1)
    val v0 = (col("ss0") - col("s0") * col("s0") / col("n0")) /
      (col("n0") - 1)
    val se = sqrt(v1 / col("n1") + v0 / col("n0"))
    val delta = lit(0.05) * (col("s1") + col("s0")) /
      (col("n1") + col("n0"))
    val diff = mu1 - mu0
    wide.select(
      col("n1").cast("long").as("n_building"),
      col("n0").cast("long").as("n_machinery"),
      round4eps(diff).as("diff"),
      round4eps(se).as("se"),
      round4eps(delta).as("delta"),
      round4eps((diff + delta) / se).as("z_lower"),
      round4eps((delta - diff) / se).as("z_upper"),
      (round4eps((diff + delta) / se) > 1.645 &&
        round4eps((delta - diff) / se) > 1.645).as("equivalent"))
  }

  /** Hill-number diversity profile of the brand mix per region — the
    * one parametric family that unifies the gated diversity zoo:
    * q=0 is richness, q=1 is exp(Shannon entropy), q=2 is inverse
    * Simpson; read together, the three numbers say whether diversity
    * is carried by rare brands (q0 ≫ q1) or spread evenly (q0 ≈ q2).
    * The "effective number of brands" readout ecology standardized on
    * (Hill 1973) and mixture budgeting should too.
    *
    * Scale shape: one (region × brand)-keyed count over the fact
    * scan, then taxonomy-bounded share algebra (≤25×25 cells).
    * Shares come from exact integer counts. */
  def hillNumbers(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("rk"), col("p_brand"))
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy(col("rk"))
      .agg(sum(col("c")).as("nt"))
    cells.join(broadcast(tot), "rk")
      .select(col("rk"), (col("c").cast("double") / col("nt")).as("p"))
      .groupBy(col("rk"))
      .agg(count(lit(1)).as("q0_richness"),
        round4eps(exp(lit(-1.0) * sum(col("p") * log(col("p")))))
          .as("q1_exp_shannon"),
        round4eps(lit(1.0) / sum(col("p") * col("p")))
          .as("q2_inv_simpson"))
      .select(col("rk").cast("long").as("region_key"),
        col("q0_richness"), col("q1_exp_shannon"),
        col("q2_inv_simpson"),
        round4eps(col("q1_exp_shannon") / col("q0_richness"))
          .as("evenness"))
      .orderBy(col("region_key"))
  }

  /** Lilliefors-style normality screen on daily revenue: the KS
    * distance between the empirical CDF of the standardized series
    * and Φ (the shared A&S 26.2.17 polynomial kernel, engine-exact) —
    * the EDF-based normality check beside the gated moment-based
    * Jarque-Bera (each catches departures the other misses). Reports
    * D, √n·D, and the classic 0.886/√n Lilliefors 5% line.
    *
    * Scale shape: calendar collapse, one moment pass for (μ, s), one
    * rank window over the ~2400-day frame — all calendar-bounded;
    * z-scores are 1e-6-quantized before Φ. */
  def lilliefors(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000.0) + lit(0.5) + lit(0.000001)) / lit(1000000.0)
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("y"))
      .persistMemDisk
    val m = daily.agg(count(lit(1)).cast("double").as("n"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        round4eps(col("sy") / col("n")).as("mu"),
        round4eps(sqrt((col("syy") - col("sy") * col("sy") / col("n")) /
          (col("n") - 1))).as("sd"))
    val z = daily.crossJoin(broadcast(m))
      .select(col("n"), q6((col("y") - col("mu")) / col("sd")).as("z"))
    // Φ via the shared polynomial: Φ(z) = 1 − p/2 for z ≥ 0, p/2 below
    val p2 = pTwoSided(col("z"))
    val withPhi = z.select(col("n"),
      when(col("z") >= 0, lit(1.0) - p2 / 2).otherwise(p2 / 2).as("phi"),
      col("z"))
    val ranked = withPhi.withColumn("i",
      row_number().over(Window.orderBy(col("z"), col("phi"))).cast("double"))
    ranked.agg(
        max(col("n")).cast("long").as("n_days"),
        round4eps(greatest(
          max(col("i") / col("n") - col("phi")),
          max(col("phi") - (col("i") - 1) / col("n")))).as("ks_d"),
        round4eps(greatest(
          max(col("i") / col("n") - col("phi")),
          max(col("phi") - (col("i") - 1) / col("n"))) *
          sqrt(max(col("n")))).as("sqrt_n_d"),
        round4eps(lit(0.886) / sqrt(max(col("n")))).as("crit_5pct"))
      .withColumn("reject_normality", col("ks_d") > col("crit_5pct"))
  }

  /** Rolling-origin forecast backtest over the quarterly revenue
    * series: at every origin t (all quarters with a full history),
    * the 1-ahead forecasts of the three classical baselines — naive
    * (y_{t−1}), seasonal naive (y_{t−4}), drift (y_{t−1} plus the
    * average historical step) — and their equal-weight ensemble,
    * scored by MAE and mean error (bias). The honest model-selection
    * harness: every gated forecaster (Holt, theta, Croston) should
    * beat these or be deleted; the ensemble row shows the
    * combination effect.
    *
    * Scale shape: one fact collapse to the ~28-row quarterly frame,
    * lag windows over it, one 4-model explode — all calendar-
    * bounded. */
  def forecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")))
        .as("qi"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("y"))
    val w = Window.orderBy(col("qi"))
    val withLags = q
      .withColumn("t", row_number().over(w))
      .withColumn("l1", lag(col("y"), 1).over(w))
      .withColumn("l4", lag(col("y"), 4).over(w))
      .withColumn("y0", first(col("y")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("l4").isNotNull) // full history at every origin
    val preds = withLags.select(col("y"),
        col("l1").as("naive"),
        col("l4").as("snaive"),
        (col("l1") + (col("l1") - col("y0")) / (col("t") - 2))
          .as("drift"))
      .withColumn("ensemble",
        (col("naive") + col("snaive") + col("drift")) / 3)
    val long = preds.select(col("y"), explode(map(
        lit("1_naive"), col("naive"), lit("2_snaive"), col("snaive"),
        lit("3_drift"), col("drift"), lit("4_ensemble"), col("ensemble")))
        .as(Seq("model", "fc")))
    long.groupBy(col("model"))
      .agg(count(lit(1)).as("n_origins"),
        round4eps(avg(abs(col("y") - col("fc")))).as("mae"),
        round4eps(avg(col("y") - col("fc"))).as("bias"))
      .orderBy(col("model"))
  }

  /** Box-Cox transformation selection: profile log-likelihood
    * ℓ(λ) = −n/2·ln σ²(z_λ) + (λ−1)Σln x over the canonical λ grid
    * (−1, −½, 0, ½, 1), z_λ = (x^λ−1)/λ (ln x at λ=0) — "which power
    * transform makes this metric most normal", the pre-flight for
    * every Gaussian-assuming screen in this library. Reports the
    * grid with the argmax flagged.
    *
    * Scale shape: one ×5 grid explode of the fact scan, one
    * (λ)-keyed moment pass (map-side combined), scalar algebra on 5
    * rows. x is 4dp-quantized before pow/ln so both engines
    * transform identical doubles. */
  def boxCox(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .select(round4eps(col("o_totalprice") / lit(1000.0)).as("x"))
    val grid = x.withColumn("lam",
      explode(array(lit(-1.0), lit(-0.5), lit(0.0), lit(0.5), lit(1.0))))
      .withColumn("z", when(col("lam") === 0.0, log(col("x")))
        .otherwise((pow(col("x"), col("lam")) - 1) / col("lam")))
    val m = grid.groupBy(col("lam"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("szz"),
        sum(log(col("x"))).as("slx"))
    val sigma2 = col("szz") / col("n") -
      (col("sz") / col("n")) * (col("sz") / col("n"))
    val ll = m.select(col("lam").as("lambda"),
        round4eps(lit(-0.5) * col("n") * log(sigma2) +
          (col("lam") - 1) * col("slx")).as("loglik"))
    ll.withColumn("best",
        col("loglik") === max(col("loglik")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .orderBy(col("lambda"))
  }

  /** Bland-Altman agreement between the two "measurements" of order
    * value the schema carries — the header total vs the summed line
    * net (Σ extprice·(1−disc)) — bias, the SD of the differences,
    * the 95% limits of agreement, and the share of orders outside
    * them: the statistical-agreement readout behind every
    * two-system reconciliation (the gated yearly recon says totals
    * match; this says how individual records disagree).
    *
    * Scale shape: one orderkey-keyed line rollup (the only shuffle),
    * one moment pass over the order-grain diffs, one bounded
    * recount against the quantized limits. Diffs are 4dp-quantized
    * before the moments AND the limit compares, so the outside-count
    * is engine-exact. */
  def blandAltman(s: SparkSession, dir: String): DataFrame = {
    val lineAgg = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("line_net"))
    val diffs = Tables.orders(s, dir)
      .join(lineAgg, col("o_orderkey") === col("l_orderkey"))
      .select(round4eps((col("o_totalprice") - col("line_net")) /
        lit(1000.0)).as("d"))
      .persistMemDisk
    val m = diffs.agg(count(lit(1)).cast("double").as("n"),
        sum(col("d")).as("sd_"), sum(col("d") * col("d")).as("sdd"))
      .select(col("n"),
        round4eps(col("sd_") / col("n")).as("bias"),
        round4eps(sqrt((col("sdd") - col("sd_") * col("sd_") / col("n")) /
          (col("n") - 1))).as("sd_diff"))
      .select(col("n"), col("bias"), col("sd_diff"),
        round4eps(col("bias") - lit(1.96) * col("sd_diff")).as("loa_low"),
        round4eps(col("bias") + lit(1.96) * col("sd_diff")).as("loa_high"))
    diffs.crossJoin(broadcast(m))
      .agg(max(col("n")).cast("long").as("n_orders"),
        max(col("bias")).as("bias"),
        max(col("sd_diff")).as("sd_diff"),
        max(col("loa_low")).as("loa_low"),
        max(col("loa_high")).as("loa_high"),
        round4eps(sum(when(col("d") < col("loa_low") ||
          col("d") > col("loa_high"), 1L).otherwise(0L))
          .cast("double") / max(col("n"))).as("pct_outside"))
  }

  /** First-order vector autoregression VAR(1) of the daily
    * (revenue-in-millions, orders-in-thousands) pair: two 2-predictor
    * OLS equations in closed form (the olsMulti Cramer solve on the
    * lagged frame), plus the companion-matrix spectral radius —
    * max |eigenvalue| of B, with the complex-pair case handled as
    * √det — and the radius < 1 stability verdict. The multivariate
    * counterpart of the gated AR/ADF family: "do the two series
    * feed back into each other, and is the system stable".
    *
    * Scale shape: calendar-collapsed daily frame, one lag window,
    * ONE 14-sum moment aggregation, scalar 2×2 algebra. Flat at
    * 100×. */
  def varModel(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("x"),
        (count(lit(1)) / lit(1000.0)).as("y"))
    val wd = Window.orderBy(col("d"))
    val lagged = daily
      .withColumn("xl", lag(col("x"), 1).over(wd))
      .withColumn("yl", lag(col("y"), 1).over(wd))
      .filter(col("xl").isNotNull)
    val m = lagged.agg(count(lit(1)).cast("double").as("n"),
      sum(col("xl")).as("s1"), sum(col("yl")).as("s2"),
      sum(col("xl") * col("xl")).as("s11"),
      sum(col("xl") * col("yl")).as("s12"),
      sum(col("yl") * col("yl")).as("s22"),
      sum(col("x")).as("sx"), sum(col("xl") * col("x")).as("s1x"),
      sum(col("yl") * col("x")).as("s2x"),
      sum(col("y")).as("sy"), sum(col("xl") * col("y")).as("s1y"),
      sum(col("yl") * col("y")).as("s2y"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val det = c11 * c22 - c12 * c12
    def b(c1y: Column, c2y: Column): (Column, Column) = (
      (c1y * c22 - c2y * c12) / det,
      (c11 * c2y - c12 * c1y) / det)
    val c1x = col("s1x") - col("s1") * col("sx") / col("n")
    val c2x = col("s2x") - col("s2") * col("sx") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val (b11, b12) = b(c1x, c2x)
    val (b21, b22) = b(c1y, c2y)
    val tr = b11 + b22
    val detB = b11 * b22 - b12 * b21
    val disc = tr * tr - lit(4.0) * detB
    val radius = when(disc >= 0,
      greatest(abs((tr + sqrt(disc)) / 2), abs((tr - sqrt(disc)) / 2)))
      .otherwise(sqrt(detB))
    m.select(col("n").cast("long").as("n_days"),
      round4eps(b11).as("b_rev_rev"), round4eps(b12).as("b_rev_cnt"),
      round4eps(b21).as("b_cnt_rev"), round4eps(b22).as("b_cnt_cnt"),
      round4eps(radius).as("spectral_radius"),
      (round4eps(radius) < 1.0).as("stable"))
  }

  /** Error-correction model on the Engle-Granger pair (AMERICA vs
    * EUROPE daily revenue, the gated cointegration screen's exact
    * frame): Δa_t = α + γ·ecm_{t−1} + β·Δb_t with ecm the quantized
    * static-regression residual — γ < 0 is the correction pull, and
    * −ln2/ln(1+γ) its half-life in days. The "how fast does the
    * spread close" readout the EG test motivates but doesn't give.
    *
    * Scale shape: same calendar collapse as engleGranger, one lag
    * window, one 10-sum moment pass, scalar Cramer algebra. */
  def ecmModel(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(when(col("r_name") === "AMERICA",
          col("o_totalprice")).otherwise(lit(0.0))).as("ya_raw"),
        sum(when(col("r_name") === "EUROPE",
          col("o_totalprice")).otherwise(lit(0.0))).as("yb_raw"))
      .select(col("d"), (col("ya_raw") / lit(1000.0)).as("a"),
        (col("yb_raw") / lit(1000.0)).as("b"))
      .persistMemDisk
    val m1 = daily.agg(count(lit(1)).cast("double").as("n"),
        sum(col("b")).as("sb"), sum(col("a")).as("sa"),
        sum(col("b") * col("b")).as("sbb"),
        sum(col("b") * col("a")).as("sba"))
      .withColumn("cbb", col("sbb") - col("sb") * col("sb") / col("n"))
      .withColumn("beta",
        (col("sba") - col("sb") * col("sa") / col("n")) / col("cbb"))
      .withColumn("alpha",
        col("sa") / col("n") - col("beta") * col("sb") / col("n"))
      .select(round4eps(col("beta")).as("beta_s"),
        round4eps(col("alpha")).as("alpha_s"))
    val wd = Window.orderBy(col("d"))
    val frame = daily.crossJoin(broadcast(m1))
      .withColumn("e", round4eps(
        col("a") - col("alpha_s") - col("beta_s") * col("b")))
      .withColumn("el", lag(col("e"), 1).over(wd))
      .withColumn("da", col("a") - lag(col("a"), 1).over(wd))
      .withColumn("db", col("b") - lag(col("b"), 1).over(wd))
      .filter(col("el").isNotNull)
    val m = frame.agg(count(lit(1)).cast("double").as("n"),
      sum(col("el")).as("s1"), sum(col("db")).as("s2"),
      sum(col("da")).as("sy"),
      sum(col("el") * col("el")).as("s11"),
      sum(col("el") * col("db")).as("s12"),
      sum(col("db") * col("db")).as("s22"),
      sum(col("el") * col("da")).as("s1y"),
      sum(col("db") * col("da")).as("s2y"),
      sum(col("da") * col("da")).as("syy"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val cyy = col("syy") - col("sy") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val gamma = (c1y * c22 - c2y * c12) / det
    val beta = (c11 * c2y - c12 * c1y) / det
    val a0 = (col("sy") - gamma * col("s1") - beta * col("s2")) / col("n")
    m.select(col("n").cast("long").as("n_days"),
      round4eps(a0).as("alpha"),
      round4eps(gamma).as("gamma"),
      round4eps(beta).as("beta_dx"),
      round4eps(lit(1.0) - (cyy - gamma * c1y - beta * c2y) / cyy)
        .as("r2"),
      round4eps(when(gamma > -1 && gamma < 0,
        lit(-math.log(2.0)) / log(lit(1.0) + gamma))
        .otherwise(lit(-1.0))).as("half_life_days"))
  }

  /** Variance inflation factors for the three lineitem predictors
    * (quantity, discount, tax): VIF_i = [R⁻¹]ᵢᵢ from the 3×3
    * correlation matrix in closed form (adjugate diagonal / det),
    * plus det(R) itself — det → 0 flags collinearity the pairwise
    * correlations (already gated) can hide. The pre-flight every
    * multi-predictor fit in this library (olsMulti, iv2sls, …)
    * assumes has been run.
    *
    * Scale shape: ONE 9-sum moment aggregation over the fact scan
    * (map-side combined), then scalar 3×3 algebra. Exact 2-decimal
    * inputs. */
  def vif(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").as("x1"), col("l_discount").as("x2"),
      col("l_tax").as("x3"))
    val m = li.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x3")).as("s3"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x3") * col("x3")).as("s33"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x1") * col("x3")).as("s13"),
      sum(col("x2") * col("x3")).as("s23"))
    def r(sab: Column, sa: Column, sb: Column, saa: Column,
        sbb: Column): Column =
      (sab - sa * sb / col("n")) /
        sqrt((saa - sa * sa / col("n")) * (sbb - sb * sb / col("n")))
    val r12 = r(col("s12"), col("s1"), col("s2"), col("s11"), col("s22"))
    val r13 = r(col("s13"), col("s1"), col("s3"), col("s11"), col("s33"))
    val r23 = r(col("s23"), col("s2"), col("s3"), col("s22"), col("s33"))
    val det = lit(1.0) + lit(2.0) * r12 * r13 * r23 -
      r12 * r12 - r13 * r13 - r23 * r23
    m.select(col("n").cast("long").as("n"),
      round4eps(r12).as("r_qty_disc"),
      round4eps(r13).as("r_qty_tax"),
      round4eps(r23).as("r_disc_tax"),
      round4eps((lit(1.0) - r23 * r23) / det).as("vif_quantity"),
      round4eps((lit(1.0) - r13 * r13) / det).as("vif_discount"),
      round4eps((lit(1.0) - r12 * r12) / det).as("vif_tax"),
      round4eps(det).as("det_r"))
  }

  /** GEE / Chao1 number-of-distinct-values estimation from the SAME
    * deterministic 10% hash sample the AQP gate reads: the sampled
    * per-key occurrence profile (d_s distinct, f1 singletons, f2
    * doubletons) yields GEE D̂ = √(1/q)·f1 + (d_s − f1) and Chao1
    * D̂ = d_s + f1²/2f2, beside the exact NDV — the cardinality-
    * estimation trade a 100 TB optimizer makes when it can only
    * afford a sample scan.
    *
    * Scale shape: one partkey-keyed conditional count (map-side
    * combined), one conditional count over the key frame, exact
    * integers throughout. */
  def ndvEstimate(s: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_partkey"),
      (((col("l_orderkey") % 1000003L) * 2654435761L +
        col("l_linenumber") * 97L) % 100L < pct).as("in_sample"))
    val perKey = li.groupBy(col("l_partkey"))
      .agg(sum(when(col("in_sample"), 1L).otherwise(0L)).as("cs"))
    perKey.agg(
        count(lit(1)).as("exact_ndv"),
        sum(when(col("cs") > 0, 1L).otherwise(0L)).as("d_s"),
        sum(when(col("cs") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("cs") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("exact_ndv"), col("d_s").as("sample_ndv"),
        col("f1"), col("f2"),
        round4eps(sqrt(lit(1.0) / lit(pct / 100.0)) *
          col("f1").cast("double") +
          (col("d_s") - col("f1")).cast("double")).as("gee_est"),
        round4eps(col("d_s").cast("double") +
          col("f1").cast("double") * col("f1").cast("double") /
            (lit(2.0) * col("f2").cast("double"))).as("chao_est"),
        round4eps(abs(sqrt(lit(1.0) / lit(pct / 100.0)) *
          col("f1").cast("double") +
          (col("d_s") - col("f1")).cast("double") -
          col("exact_ndv").cast("double")) /
          col("exact_ndv").cast("double")).as("rel_err_gee"))
  }

  /** Shared (region × 1995-quarter) revenue cells for the
    * randomized-block trend tests ([[pageTrend]], [[quadeTest]]):
    * blocks = the 5 regions, ordered treatments = the 4 quarters of
    * 1995, cell = 4dp-quantized revenue. One taxonomy-bounded
    * aggregation (20 cells) off the pushed-down year filter. */
  private def regionQuarterCells(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === 1995)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"),
        quarter(col("o_orderdate")).as("q"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))

  /** Page's L trend test for an ORDERED alternative across the 1995
    * quarters within region blocks: within-block ranks r_ij (revenue
    * ascending, quarter tie-break), L = Σ_j j·R_j with R_j the rank
    * sum of quarter j, z = (L − bk(k+1)²/4) / √(bk²(k+1)(k²−1)/144).
    * The monotone-trend companion of Friedman (which only asks "any
    * difference"). Scale shape: the corpus collapses to the 20-cell
    * block frame; everything after is scalar algebra. */
  def pageTrend(s: SparkSession, dir: String): DataFrame = {
    val cells = regionQuarterCells(s, dir)
    val ranked = cells.withColumn("r", row_number().over(
      Window.partitionBy(col("region")).orderBy(col("rev"), col("q"))))
    ranked.agg(
        countDistinct(col("region")).cast("double").as("b"),
        countDistinct(col("q")).cast("double").as("k"),
        sum(col("q") * col("r")).as("l_stat"))
      .select(col("b").cast("long").as("n_blocks"),
        col("k").cast("long").as("k_treatments"),
        col("l_stat").cast("long").as("l_stat"),
        round4eps((col("l_stat") -
          col("b") * col("k") * (col("k") + 1) * (col("k") + 1) / lit(4.0)) /
          sqrt(col("b") * col("k") * col("k") * (col("k") + 1) *
            (col("k") * col("k") - 1) / lit(144.0))).as("z_stat"))
  }

  /** Quade test over the same block frame: within-block ranks r_ij,
    * block weights Q_i = rank of the block's revenue RANGE (blocks
    * with more spread count more — the power upgrade over Friedman
    * for heterogeneous blocks), S_ij = Q_i·(r_ij − (k+1)/2),
    * F = (b−1)·B/(A−B) with A = ΣS², B = ΣS_j²/b. */
  def quadeTest(s: SparkSession, dir: String): DataFrame = {
    val cells = regionQuarterCells(s, dir)
    val ranked = cells
      .withColumn("r", row_number().over(
        Window.partitionBy(col("region")).orderBy(col("rev"), col("q"))))
      .withColumn("rng",
        max(col("rev")).over(Window.partitionBy(col("region"))) -
          min(col("rev")).over(Window.partitionBy(col("region"))))
    val weighted = ranked.withColumn("qw", dense_rank().over(
        Window.orderBy(col("rng"), col("region"))))
      .withColumn("kk", count(lit(1)).over(
        Window.partitionBy(col("region"))).cast("double"))
      .withColumn("sij", col("qw") * (col("r") - (col("kk") + 1) / 2))
    val perT = weighted.groupBy(col("q"))
      .agg(sum(col("sij")).as("sj"), sum(col("sij") * col("sij")).as("aj"),
        count(lit(1)).as("b"))
    perT.agg(sum(col("aj")).as("a"),
        sum(col("sj") * col("sj")).as("b2"),
        max(col("b")).cast("double").as("b"),
        count(lit(1)).cast("double").as("k"))
      .select(col("b").cast("long").as("n_blocks"),
        col("k").cast("long").as("k_treatments"),
        round4eps(col("a")).as("a_stat"),
        round4eps(col("b2") / col("b")).as("b_stat"),
        round4eps((col("b") - 1) * (col("b2") / col("b")) /
          (col("a") - col("b2") / col("b"))).as("f_stat"))
  }

  /** Jonckheere-Terpstra test for an ordered alternative across the
    * five order priorities (1-URGENT < … < 5-LOW) on total price:
    * J = Σ_{i<j} U_ij counted on the NDV-bounded $100 price-bucket
    * frame (within-bucket cross-group pairs get half credit — the
    * midrank convention), z against the untied mean/variance
    * (N²−Σnᵢ²)/4 and (N²(2N+3)−Σnᵢ²(2nᵢ+3))/72, the standard
    * approximation under light ties. Scale shape: one bucket-keyed
    * count aggregation, cumulative sums over the bounded bucket
    * frame, scalar algebra after. */
  def jonckheere(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bucket"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("grp"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
        (2 to 5).map(i =>
          sum(when(col("grp") === i, 1L).otherwise(0L)).as(s"n$i")): _*)
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = (1 to 5).foldLeft(g) { (df, i) =>
      df.withColumn(s"c$i", coalesce(sum(col(s"n$i")).over(w), lit(0L)))
    }
    val jTerms = (for { i <- 1 to 5; j <- (i + 1) to 5 } yield
      col(s"n$j") * (col(s"c$i") + col(s"n$i") / lit(2.0))).reduce(_ + _)
    val agg = cum.agg(sum(jTerms).as("j_stat"),
      (1 to 5).map(i => sum(col(s"n$i")).as(s"t$i")): _*)
    val nTot = (1 to 5).map(i => col(s"t$i")).reduce(_ + _)
    val sumSq = (1 to 5).map(i => col(s"t$i") * col(s"t$i")).reduce(_ + _)
    val sumV = (1 to 5).map(i =>
      col(s"t$i") * col(s"t$i") * (lit(2.0) * col(s"t$i") + 3)).reduce(_ + _)
    agg.select(nTot.cast("long").as("n"),
        round4eps(col("j_stat")).as("j_stat"),
        round4eps((col("j_stat") -
          (nTot * nTot - sumSq) / lit(4.0)) /
          sqrt((nTot * nTot * (lit(2.0) * nTot + 3) - sumV) / lit(72.0)))
          .as("z_stat"))
  }

  /** Rayleigh uniformity test on event time-of-day, per event type:
    * each event's clock time maps to an angle θ = 2π·s/86400, the
    * mean resultant length R̄ = ‖(ΣcosΘ, ΣsinΘ)‖/n says how
    * concentrated the daily rhythm is, z = n·R̄² is Rayleigh's
    * uniformity statistic, and the circular mean hour locates the
    * peak. THE diurnal-pattern screen for event streams (an arrival
    * model that assumes uniform hours is wrong whenever z is large).
    *
    * Parity: C̄ and S̄ are 1e-6-quantized before the atan2/√ so ulp
    * drift in the trig sums cannot reach the 4dp outputs. Scale
    * shape: one type-keyed moment aggregation, map-side combined. */
  def rayleighHours(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    // FRACTIONAL epoch seconds on both engines (cast-to-double here ≡
    // DuckDB epoch(); the events fixture is entirely sub-second, so
    // truncating unix_timestamp would silently drop the micros)
    val theta = Tables.events(s, dir)
      .select(col("event_type"),
        (pmod(col("ts").cast("double"), lit(86400.0)) /
          lit(86400.0) * lit(2.0 * math.Pi)).as("th"))
    theta.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(cos(col("th"))).as("cs"), sum(sin(col("th"))).as("sn"))
      .withColumn("cb", q6(col("cs") / col("n")))
      .withColumn("sb", q6(col("sn") / col("n")))
      .withColumn("rbar", sqrt(col("cb") * col("cb") + col("sb") * col("sb")))
      .withColumn("h",
        atan2(col("sb"), col("cb")) / lit(2.0 * math.Pi) * lit(24.0))
      .select(col("event_type"), col("n").cast("long").as("n"),
        round4eps(col("rbar")).as("r_bar"),
        round4eps(col("n") * col("rbar") * col("rbar")).as("rayleigh_z"),
        round4eps(when(col("h") < 0, col("h") + 24).otherwise(col("h")))
          .as("mean_hour"))
      .orderBy(col("event_type"))
  }

  /** Lo-MacKinlay variance-ratio test on daily revenue log returns:
    * VR(q) = V̂ar(q-day overlapping sums)/(q·V̂ar(1-day)), z under
    * the homoscedastic null (random walk ⇒ VR = 1). VR < 1 flags
    * mean reversion, VR > 1 momentum — the market-efficiency screen
    * repurposed as a demand-series memory readout. Returns are
    * 1e-6-quantized; both variances use population denominators over
    * their own sample counts (mirrored exactly in the oracle).
    * Scale shape: calendar-bounded daily collapse + one window. */
  def varianceRatio(s: SparkSession, dir: String, q: Int = 5): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("d"))
    val rets = daily
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("r", q6(log(col("rev") / col("prev"))))
      .filter(col("r").isNotNull)
    val wq = Window.orderBy(col("d")).rowsBetween(-(q - 1), 0)
    val sums = rets
      .withColumn("rq", sum(col("r")).over(wq))
      .withColumn("nq", count(col("r")).over(wq))
      .persistMemDisk
    val mu = sums.agg(avg(col("r")).as("mu"),
      count(lit(1)).cast("double").as("n"))
    val stats = sums.crossJoin(broadcast(mu)).agg(
      max(col("n")).as("n"),
      (sum((col("r") - col("mu")) * (col("r") - col("mu"))) /
        max(col("n"))).as("v1"),
      sum(when(col("nq") === q,
        (col("rq") - lit(q.toDouble) * col("mu")) *
          (col("rq") - lit(q.toDouble) * col("mu"))))
        .as("sq"),
      sum(when(col("nq") === q, 1L).otherwise(0L)).cast("double").as("nqc"))
    stats.select(col("n").cast("long").as("n_returns"),
        lit(q).as("q"),
        round4eps(col("sq") / col("nqc") / (lit(q.toDouble) * col("v1")))
          .as("vr"),
        round4eps((col("sq") / col("nqc") / (lit(q.toDouble) * col("v1")) -
          1) / sqrt(lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) / col("n")))
          .as("z_stat"))
  }

  private def q6c(c: Column): Column =
    floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)

  /** Gamma fit of order value (k$) per market segment: the
    * method-of-moments pair (k̂ = m²/v, θ̂ = v/m) beside the
    * closed-form MLE approximation k̂ ≈ (3−s+√((s−3)²+24s))/(12s)
    * with s = ln m − mean(ln x) (Minka's iteration-free seed — no
    * digamma needed). The heavier-than-exponential order-size model
    * the newsvendor/inventory gates consume. s is 1e-6-quantized
    * before the closed form so log-sum ulp drift cannot reach the
    * 4dp outputs. One segment-keyed moment pass. */
  def gammaFit(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice") / lit(1000.0)).as("x"))
    x.groupBy(col("seg"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(log(col("x"))).as("slx"))
      .withColumn("m", col("sx") / col("n"))
      .withColumn("v", (col("sxx") - col("sx") * col("sx") / col("n")) /
        (col("n") - 1))
      .withColumn("s", q6c(log(col("m")) - col("slx") / col("n")))
      .select(col("seg"), col("n").cast("long").as("n"),
        round4eps(col("m")).as("mean_k"),
        round4eps(col("v")).as("var_k"),
        round4eps(col("m") * col("m") / col("v")).as("shape_mom"),
        round4eps(col("v") / col("m")).as("scale_mom"),
        round4eps((lit(3.0) - col("s") +
          sqrt((col("s") - 3) * (col("s") - 3) + lit(24.0) * col("s"))) /
          (lit(12.0) * col("s"))).as("shape_mle"))
      .orderBy(col("seg"))
  }

  /** Lognormal fit of order value per market segment: μ̂/σ̂ on the
    * log scale, the implied median e^μ̂ and mean e^(μ̂+σ̂²/2), and
    * the implied-vs-actual mean ratio — the right-skew model audit
    * (ratio ≈ 1 ⇒ lognormal explains the tail; ratio ≪ 1 ⇒ the tail
    * is heavier than lognormal). Same one-pass moment shape. */
  def lognormalFit(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("x"))
    x.groupBy(col("seg"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"),
        sum(log(col("x"))).as("sl"),
        sum(log(col("x")) * log(col("x"))).as("sll"))
      .withColumn("mu", q6c(col("sl") / col("n")))
      .withColumn("sig2", q6c((col("sll") - col("sl") * col("sl") / col("n")) /
        (col("n") - 1)))
      .select(col("seg"), col("n").cast("long").as("n"),
        round4eps(col("mu")).as("mu_log"),
        round4eps(sqrt(col("sig2"))).as("sigma_log"),
        round4eps(exp(col("mu"))).as("median_fit"),
        round4eps(exp(col("mu") + col("sig2") / 2)).as("mean_fit"),
        round4eps(exp(col("mu") + col("sig2") / 2) /
          (col("sx") / col("n"))).as("mean_ratio"))
      .orderBy(col("seg"))
  }

  /** D'Agostino K² omnibus normality test per market segment on
    * order value: the skewness z (Johnson S_U transform) and
    * kurtosis z (Anscombe-Glynn cube-root transform) combined as
    * K² = z₁² + z₂² — the moment-based omnibus beside Jarque-Bera
    * (whose χ² calibration is poor at these n) and the EDF screens
    * (Lilliefors/Anderson-Darling). g1 and b2 are 1e-6-quantized
    * before the transforms. One segment-keyed moment pass; the
    * transforms are scalar algebra on the 5-row frame. */
  def dagostinoK2(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice") / lit(100000.0)).as("x"))
    val m = x.groupBy(col("seg"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .withColumn("mu", col("s1") / col("n"))
    val mu = col("mu"); val n = col("n")
    val m2 = col("s2") / n - mu * mu
    val m3 = col("s3") / n - lit(3.0) * mu * col("s2") / n +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4") / n - lit(4.0) * mu * col("s3") / n +
      lit(6.0) * mu * mu * col("s2") / n - lit(3.0) * mu * mu * mu * mu
    val t = m
      .withColumn("g1", q6c(m3 / sqrt(m2 * m2 * m2)))
      .withColumn("b2", q6c(m4 / (m2 * m2)))
      // Johnson S_U for skewness
      .withColumn("y", col("g1") * sqrt((n + 1) * (n + 3) / ((n - 2) * 6)))
      .withColumn("beta2", lit(3.0) * (n * n + lit(27.0) * n - 70) *
        (n + 1) * (n + 3) / ((n - 2) * (n + 5) * (n + 7) * (n + 9)))
      .withColumn("w2", sqrt(lit(2.0) * (col("beta2") - 1)) - 1)
      .withColumn("delta", lit(1.0) / sqrt(log(sqrt(col("w2")))))
      .withColumn("alpha", sqrt(lit(2.0) / (col("w2") - 1)))
      .withColumn("z1", col("delta") * log(col("y") / col("alpha") +
        sqrt(col("y") * col("y") / (col("alpha") * col("alpha")) + 1)))
      // Anscombe-Glynn for kurtosis
      .withColumn("eb2", lit(3.0) * (n - 1) / (n + 1))
      .withColumn("vb2", lit(24.0) * n * (n - 2) * (n - 3) /
        ((n + 1) * (n + 1) * (n + 3) * (n + 5)))
      .withColumn("xx", (col("b2") - col("eb2")) / sqrt(col("vb2")))
      .withColumn("sb", lit(6.0) * (n * n - lit(5.0) * n + 2) /
        ((n + 7) * (n + 9)) *
        sqrt(lit(6.0) * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3))))
      .withColumn("aa", lit(6.0) + lit(8.0) / col("sb") *
        (lit(2.0) / col("sb") +
          sqrt(lit(1.0) + lit(4.0) / (col("sb") * col("sb")))))
      .withColumn("z2", ((lit(1.0) - lit(2.0) / (lit(9.0) * col("aa"))) -
        cbrt((lit(1.0) - lit(2.0) / col("aa")) /
          (lit(1.0) + col("xx") *
            sqrt(lit(2.0) / (col("aa") - 4))))) /
        sqrt(lit(2.0) / (lit(9.0) * col("aa"))))
    t.select(col("seg"), n.cast("long").as("n"),
        round4eps(col("g1")).as("skewness"),
        round4eps(col("b2")).as("kurtosis"),
        round4eps(col("z1")).as("z_skew"),
        round4eps(col("z2")).as("z_kurt"),
        round4eps(col("z1") * col("z1") + col("z2") * col("z2")).as("k2_stat"))
      .orderBy(col("seg"))
  }

  /** Cuzick's trend test across the five ORDERED priorities on total
    * price — the rank-correlation member of the ordered-alternative
    * family (Jonckheere counts pairwise wins; Cuzick weights pooled
    * ranks by the group score, the form clinical dose-response
    * reporting standardized on): T = Σ lⱼ·rⱼ over observations with
    * group scores l = 1..5 and pooled midranks r,
    * E[T] = (N+1)/2·L₁, Var[T] = (N+1)/12·(N·L₂ − L₁²) with
    * Lₖ = Σ nᵢ lᵢᵏ (exchangeable-ranks variance; midranks for ties,
    * untied variance — the same convention as [[jonckheere]]).
    *
    * Scale shape: the same NDV-bounded $100 price-bucket frame as
    * Jonckheere — one bucket-keyed count aggregation, one cumulative
    * window over the bounded frame, scalar algebra after. */
  def cuzickTrend(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / 100).cast("long").as("bucket"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("grp"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n1"),
        (2 to 5).map(i =>
          sum(when(col("grp") === i, 1L).otherwise(0L)).as(s"n$i")): _*)
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("n1") + col("n2") + col("n3") + col("n4") + col("n5")
    val mid = g
      .withColumn("cb", coalesce(sum(t).over(w), lit(0L)))
      .withColumn("r", col("cb") + (t + 1) / lit(2.0))
    val tSum = (1 to 5).map(i => col(s"n$i") * lit(i.toDouble) * col("r"))
      .reduce(_ + _)
    val agg = mid.agg(sum(tSum).as("t_stat"),
      (1 to 5).map(i => sum(col(s"n$i")).as(s"m$i")): _*)
    val nTot = (1 to 5).map(i => col(s"m$i")).reduce(_ + _).cast("double")
    val l1 = (1 to 5).map(i => col(s"m$i") * i).reduce(_ + _).cast("double")
    val l2 = (1 to 5).map(i => col(s"m$i") * (i * i)).reduce(_ + _)
      .cast("double")
    agg.select(nTot.cast("long").as("n"),
      round4eps(col("t_stat")).as("t_stat"),
      round4eps((col("t_stat") - (nTot + 1) / 2 * l1) /
        sqrt((nTot + 1) / 12 * (nTot * l2 - l1 * l1))).as("z_stat"))
  }

  /** Welch's heteroscedastic one-way ANOVA on order value (k$) across
    * market segments — the unequal-variance completion of the ANOVA
    * family ([[Behavior]]'s classical F assumes homoscedasticity;
    * [[leveneBf]] tests that assumption; this is what to run when it
    * fails): weights wᵢ = nᵢ/sᵢ², F* = Σwᵢ(mᵢ−m̄w)²/(k−1) over
    * 1 + 2(k−2)/(k²−1)·Λ with Λ = Σ(1−wᵢ/W)²/(nᵢ−1), and the
    * Welch-Satterthwaite df₂ = (k²−1)/(3Λ). One segment-keyed moment
    * pass; everything after is scalar algebra on the 5-row frame. */
  def welchAnova(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_totalprice") / lit(1000.0)).as("x"))
    val g = x.groupBy(col("seg"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("m", col("sx") / col("n"))
      .withColumn("s2", (col("sxx") - col("sx") * col("sx") / col("n")) /
        (col("n") - 1))
      .withColumn("w", col("n") / col("s2"))
      .persistMemDisk
    val tot = g.agg(sum(col("w")).as("bw"),
      sum(col("w") * col("m")).as("bwm"),
      count(lit(1)).cast("double").as("k"))
    g.crossJoin(broadcast(tot))
      .agg(max(col("k")).as("k"), max(col("bw")).as("bw"),
        max(col("bwm")).as("bwm"),
        sum(col("w") * (col("m") - col("bwm") / col("bw")) *
          (col("m") - col("bwm") / col("bw"))).as("num"),
        sum((lit(1.0) - col("w") / col("bw")) *
          (lit(1.0) - col("w") / col("bw")) / (col("n") - 1)).as("lam"))
      .select(col("k").cast("long").as("k_groups"),
        round4eps(col("num") / (col("k") - 1) /
          (lit(1.0) + lit(2.0) * (col("k") - 2) /
            (col("k") * col("k") - 1) * col("lam"))).as("f_stat"),
        round4eps((col("k") - 1)).as("df1"),
        round4eps((col("k") * col("k") - 1) /
          (lit(3.0) * col("lam"))).as("df2"))
  }

  /** Stratified-sampling AQP with HETEROGENEOUS per-stratum rates
    * (A 5% / N 10% / R 20% — the rate a real system would tune to
    * stratum variance) — the allocation-aware upgrade of
    * [[aqpRevenue]]'s uniform Bernoulli: per return flag, the exact
    * total beside its per-stratum Horvitz-Thompson estimate and
    * variance, plus the COMBINED estimate's standard error (stratum
    * variances add — the property that makes stratified AQP beat
    * uniform sampling at equal budget). Inclusion is the same
    * replayable modular row hash, so the sample is a stable row
    * property. One flag-keyed conditional-moment pass. */
  def aqpStratified(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_extendedprice")).cast("long").as("v"),
      (((col("l_orderkey") % 1000003L) * 2654435761L +
        col("l_linenumber") * 97L) % 100L).as("h"))
    val withP = li.withColumn("pct",
      when(col("flag") === "A", 5).when(col("flag") === "N", 10)
        .otherwise(20))
    val per = withP.groupBy(col("flag"), col("pct"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v")).as("exact_v"),
        sum(when(col("h") < col("pct"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("h") < col("pct"), col("v")).otherwise(0L)).as("sv"),
        sum(when(col("h") < col("pct"), col("v") * col("v")).otherwise(0L))
          .as("svv"))
      .withColumn("p", col("pct") / lit(100.0))
      .withColumn("est", col("sv") / col("p"))
      .withColumn("vhat", col("svv") * (lit(1.0) - col("p")) /
        (col("p") * col("p")))
      .persistMemDisk
    val comb = per.agg(sum(col("exact_v")).as("texact"),
      sum(col("est")).as("test"), sum(col("vhat")).as("tvar"))
    per.crossJoin(broadcast(comb))
      .select(col("flag"), col("n_rows"), col("n_sampled"),
        round4eps(col("exact_v") / lit(1e6)).as("exact_musd"),
        round4eps(col("est") / lit(1e6)).as("est_musd"),
        round4eps(sqrt(col("vhat")) / lit(1e6)).as("se_musd"),
        round4eps(col("test") / lit(1e6)).as("combined_est_musd"),
        round4eps(sqrt(col("tvar")) / lit(1e6)).as("combined_se_musd"),
        round4eps(abs(col("test") - col("texact")) / col("texact"))
          .as("combined_rel_err"))
      .orderBy(col("flag"))
  }

  /** Sample entropy (Richman & Moorman 2000) of daily revenue,
    * m = 2, r = 0.2σ: −ln(A/B) where B counts ordered template pairs
    * whose 2-day windows stay within Chebyshev distance r and A the
    * same for 3-day windows — the regularity readout (low SampEn =
    * repetitive dynamics) complementing the matrix-profile motif view.
    * Standard N−m convention: BOTH counts range over the first N−m
    * templates (those with a full 3-day window), so A and B are
    * comparable per the cited definition — the final 2-day-only
    * template is excluded from B as well (r13 ADVICE).
    *
    * Exact-integer threshold algebra: daily revenue is collapsed to
    * integral 4dp units v, so Δ ≤ 0.2σ becomes
    * 25·Δ²·n² ≤ n·Σv² − (Σv)² — every comparison is BIGINT-exact on
    * both engines (no σ rounding seam). Templates come from one
    * lead-window pass; the pair walk is the same calendar-bounded
    * days² theta join as matrixProfile (both template lengths ride ONE
    * join). ln quantized at 6dp (libm-parity idiom). */
  def sampleEntropy(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val w = Window.orderBy(col("d"))
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .select(col("d"),
        round(col("rev") * 10000).cast("long").as("v"))
    // r15 (guide §1.2 step 2 — per-pair work): the tolerance test
    // 25·Δ²·n² ≤ n·Σv² − (Σv)² ran TWO decimal(38,0) multiply chains
    // per pair over the C(n,2) template join. All quantities are
    // integers, so the inequality collapses to Δ ≤ T with ONE
    // precomputed integer threshold:
    //   T = max{ t ≥ 0 : 25·t²·n² ≤ X },  X = n·Σv² − (Σv)²
    // computed once: X in exact decimal(38,0) (it passes 2⁶³ at bench
    // scale), a double seed t0 = ⌊√X / (5n)⌋ (X exact before the one
    // lossy cast, so t0 is within 1 of T), then two exact-decimal CASE
    // probes pin T. The per-pair test is a pure long compare — the
    // same pairs pass by construction; oracle re-verified at both SFs.
    val dec38 = "decimal(38,0)"
    def d38(c: org.apache.spark.sql.Column) = c.cast(dec38)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("svv"))
      .withColumn("xq",
        d38(d38(col("n")) * d38(col("svv")) - d38(col("sv")) * d38(col("sv"))))
      .withColumn("t0",
        floor(sqrt(col("xq").cast("double")) / (lit(5.0) * col("n")))
          .cast("long"))
      .withColumn("thr",
        when(lit(25).cast(dec38) * d38(col("t0") + 1) * d38(col("t0") + 1) *
            d38(col("n")) * d38(col("n")) <= col("xq"), col("t0") + 1)
          .when(lit(25).cast(dec38) * d38(col("t0")) * d38(col("t0")) *
            d38(col("n")) * d38(col("n")) <= col("xq"), col("t0"))
          .otherwise(col("t0") - 1))
    val tpl = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("v2", lead(col("v"), 1).over(w))
      .withColumn("v3", lead(col("v"), 2).over(w))
      .filter(col("v3").isNotNull) // N−m templates: both counts comparable
      .select(col("rn"), col("v").as("v1"), col("v2"), col("v3"))
      .persistMemDisk
    val a = tpl.select(col("rn").as("ra"), col("v1").as("a1"),
      col("v2").as("a2"), col("v3").as("a3"))
    val b = tpl.select(col("rn").as("rb"), col("v1").as("b1"),
      col("v2").as("b2"), col("v3").as("b3"))
    val cheb2 = greatest(abs(col("a1") - col("b1")), abs(col("a2") - col("b2")))
    val d3 = abs(col("a3") - col("b3"))
    a.join(b, col("ra") < col("rb"))
      .crossJoin(broadcast(tot.select(col("n"), col("thr"))))
      .agg(max(col("n")).as("n_days"),
        sum(when(cheb2 <= col("thr"), 1L).otherwise(0L)).as("b_count"),
        sum(when(cheb2 <= col("thr") && d3 <= col("thr"), 1L)
          .otherwise(0L)).as("a_count"))
      .select(col("n_days"), col("b_count"), col("a_count"),
        round4eps(-round6eps(log(col("a_count").cast("double") /
          col("b_count")))).as("sampen"))
  }

  /** Seasonal Mann-Kendall (Hirsch & Slack 1984): the monotone-trend
    * test immune to SEASONALITY — the plain Mann-Kendall gate compares
    * every pair of days, so a strong weekly/annual cycle masquerades
    * as (or masks) a trend; the seasonal variant compares each
    * calendar month ONLY with the same month of other years,
    * S = Σₘ Sₘ, Var = Σₘ nₘ(nₘ−1)(2nₘ+5)/18 (tie-corrected),
    * Z = (S − sgn S)/√Var. Monthly cells are integral 4dp revenue
    * units, so every sign and tie is engine-exact; the cross-year
    * pair frame is calendar-bounded (12 × C(years, 2) rows). */
  def seasonalKendall(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(round(round4eps(sum(col("o_totalprice")) / lit(1e6)) *
        10000).cast("long").as("v"))
      .persistMemDisk
    val a = cells.select(col("m"), col("y").as("ya"), col("v").as("va"))
    val b = cells.select(col("m"), col("y").as("yb"), col("v").as("vb"))
    val sM = a.join(b, Seq("m")).filter(col("ya") < col("yb"))
      .groupBy(col("m"))
      .agg(sum(signum((col("vb") - col("va")).cast("double")))
        .cast("long").as("sm"))
    val tiesM = cells.groupBy(col("m"), col("v"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("nv"),
        sum(col("t")).as("nm"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tadj"))
    val perM = sM.join(tiesM, Seq("m"))
      .select(col("m"), col("sm"), col("nm"),
        ((col("nm") * (col("nm") - 1) * (lit(2) * col("nm") + 5) - col("tadj"))
          .cast("double") / 18.0).as("varm"))
    perM.agg(count(lit(1)).as("n_seasons"),
      sum(col("sm")).as("s_stat"),
      sum(col("varm")).as("variance"))
      .select(col("n_seasons"), col("s_stat"),
        round4eps(col("variance")).as("variance"),
        round4eps((col("s_stat") -
          signum(col("s_stat").cast("double"))).cast("double") /
          sqrt(col("variance"))).as("z_stat"))
  }

  /** Seasonal Sen slope — [[seasonalKendall]]'s magnitude companion
    * (Hirsch et al.): the MEDIAN of all within-month cross-year slopes
    * (v_y₂ − v_y₁)/(y₂ − y₁), in $M 4dp-revenue units per year —
    * robust to outlier years AND immune to the annual cycle (every
    * slope compares like months). Exact lower-median convention over
    * the calendar-bounded slope frame (12 × C(years, 2) rows), the
    * q_exact_median discipline. Also reports the min/max monthly
    * median slope — which seasons drive the trend. */
  def seasonalSenSlope(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("v"))
      .persistMemDisk
    val a = cells.select(col("m"), col("y").as("ya"), col("v").as("va"))
    val b = cells.select(col("m"), col("y").as("yb"), col("v").as("vb"))
    val slopes = a.join(b, Seq("m")).filter(col("ya") < col("yb"))
      .select(col("m"),
        round4eps((col("vb") - col("va")) / (col("yb") - col("ya")))
          .as("sl"))
      .persistMemDisk
    // exact lower median: the element at rank ceil(n/2) ascending
    def lowerMedian(df: DataFrame, keys: Seq[String]): DataFrame = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("sl"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("nn", count(lit(1))
          .over(Window.partitionBy(keys.map(col): _*)))
        .filter(col("rn") === ((col("nn") + 1) / 2).cast("int"))
    }
    val overall = lowerMedian(slopes.withColumn("g", lit(1)), Seq("g"))
      .select(col("nn").as("n_slopes"), col("sl").as("sen_slope"))
    val perMonth = lowerMedian(slopes, Seq("m"))
      .agg(min(col("sl")).as("min_month_slope"),
        max(col("sl")).as("max_month_slope"))
    overall.crossJoin(perMonth)
      .select(col("n_slopes"), col("sen_slope"),
        col("min_month_slope"), col("max_month_slope"))
  }

  /** Skellam fit of day-over-day order-count CHANGES: Δₜ = nₜ − nₜ₋₁
    * is the difference of two Poisson-ish arrival streams, so the
    * moment fit μ̂₁ = (s² + Δ̄)/2, μ̂₂ = (s² − Δ̄)/2 recovers the
    * up-tick and down-tick intensities separately — the demand-churn
    * decomposition a plain mean-of-diffs hides. Reports the symmetry
    * z (Δ̄ against the fitted null), the observed zero-change fraction,
    * and the fitted log₁₀ P(Δ=0) via the large-x Bessel asymptotic
    * ln I₀(x) ≈ x − ½ln(2πx) (exact enough at these intensities;
    * the same closed form on both engines). One calendar-bounded
    * daily collapse + one window — flat at any scale. */
  def skellamFit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val w = Window.orderBy(col("d"))
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val diffs = daily
      .withColumn("delta", col("cnt") - lag(col("cnt"), 1).over(w))
      .filter(col("delta").isNotNull)
    val a = diffs.agg(count(lit(1)).cast("double").as("n"),
      sum(col("delta")).cast("double").as("sd"),
      sum(col("delta") * col("delta")).cast("double").as("sdd"),
      sum(when(col("delta") === 0, 1L).otherwise(0L)).as("z0"))
    val mean = col("sd") / col("n")
    val vr = col("sdd") / col("n") - mean * mean // population variance
    val mu1 = (vr + mean) / 2
    val mu2 = (vr - mean) / 2
    val x = lit(2.0) * sqrt(mu1 * mu2)
    a.select(col("n").cast("long").as("n_diffs"),
      round4eps(mean).as("mean_delta"),
      round4eps(vr).as("var_delta"),
      round4eps(mu1).as("mu_up"),
      round4eps(mu2).as("mu_down"),
      round4eps(mean / sqrt(vr / col("n"))).as("symmetry_z"),
      round4eps(col("z0").cast("double") / col("n")).as("obs_zero_frac"),
      round4eps((-(mu1 + mu2) + x -
        lit(0.5) * round6eps(log(lit(2.0 * math.Pi) * x))) /
        round6eps(log(lit(10.0)))).as("fit_log10_p0"))
  }

  /** Permutation entropy (Bandt & Pompe 2002), order 3, of daily
    * revenue: each consecutive 3-day window maps to its ordinal
    * pattern (ranks with the stable-argsort tie rule: earlier position
    * wins ties), H = −Σ p ln p over the ≤6 pattern frequencies,
    * normalized by ln 6 — the complexity screen that is invariant to
    * any monotone transform of revenue (pure windows + one bounded
    * aggregate; patterns are integer-exact on both engines). */
  def permEntropy(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val w = Window.orderBy(col("d"))
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .select(col("d"), round(col("rev") * 10000).cast("long").as("v"))
    val pat = daily
      .withColumn("v2", lead(col("v"), 1).over(w))
      .withColumn("v3", lead(col("v"), 2).over(w))
      .filter(col("v3").isNotNull)
      // stable argsort ranks: position i beats later ties
      .withColumn("r1", lit(1) +
        when(col("v2") < col("v"), 1).otherwise(0) +
        when(col("v3") < col("v"), 1).otherwise(0))
      .withColumn("r2", lit(1) +
        when(col("v") <= col("v2"), 1).otherwise(0) +
        when(col("v3") < col("v2"), 1).otherwise(0))
      .withColumn("r3", lit(1) +
        when(col("v") <= col("v3"), 1).otherwise(0) +
        when(col("v2") <= col("v3"), 1).otherwise(0))
      .select((col("r1") * 100 + col("r2") * 10 + col("r3")).as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("c"))
      .persistMemDisk
    val tot = pat.agg(sum(col("c")).as("nw"))
    val h = pat.crossJoin(broadcast(tot))
      .withColumn("p", col("c").cast("double") / col("nw"))
      .agg(max(col("nw")).as("n_windows"),
        count(lit(1)).as("n_patterns"),
        sum(-col("p") * round6eps(log(col("p")))).as("h"),
        max(struct(col("c").as("c"), (-col("pattern")).as("np"))).as("m"))
    h.select(col("n_windows"), col("n_patterns"),
      round4eps(col("h")).as("entropy"),
      round4eps(col("h") / round6eps(log(lit(6.0)))).as("norm_entropy"),
      (-col("m.np")).as("top_pattern"),
      round4eps(col("m.c").cast("double") / col("n_windows")).as("top_p"))
  }

  /** Watson's U² circular uniformity test of event times-of-day, per
    * event type — the rotation-invariant cousin of the Rayleigh gate
    * (Rayleigh misses bimodal clumping at opposite hours; U² does
    * not): U² = Σ(uᵢ − (2i−1)/2n)² − n(ū − ½)² + 1/(12n) over sorted
    * day fractions. One per-type sort (range-partitioned sort at
    * scale, the order-statistics cost every EDF test pays); the sum is
    * tie-order invariant (equal u across consecutive i contribute a
    * fixed multiset). Fractional epoch seconds (the rayleighHours
    * idiom). */
  def watsonU2(s: SparkSession, dir: String): DataFrame = {
    val u = pmod(col("ts").cast("double"), lit(86400.0)) / lit(86400.0)
    // VALUE-COLLAPSED EDF (r13 verdict Next #5 — the cliffsDelta
    // dominance-count idiom applied to a rank statistic): U² touches
    // each observation's rank only through per-tie-block rank RANGES
    // (the sum is tie-order invariant), so equal day-fractions fold to
    // (type, u, count) blocks first — a map-side-combining aggregation
    // — and each block contributes the closed form
    //   Σ_{i=m+1}^{m+c}(u − (2i−1)/2n)²
    //     = c·u² − u·c(2m+c)/n + Σ(2i−1)²/(4n²),
    // with Σ(2i−1)² expanded ABOUT 2m−1 (c(2m−1)² + 2(2m−1)c(c+1)
    // + ⅔c(c+1)(2c+1)) so every term stays ≤ c·(2n)² — never the
    // e22-scale cumulant differencing a prefix-S₂ formulation would
    // hit at 10⁷ rows. The per-type sort shrinks from all rows to the
    // distinct time-of-day blocks (≤86 400 at second granularity, = n
    // only in the worst all-unique case, where this degrades to the
    // old shape).
    val blocks = Tables.events(s, dir)
      .select(col("event_type"), u.as("u"))
      .groupBy(col("event_type"), col("u"))
      .agg(count(lit(1)).cast("double").as("c"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // n factors OUT of the block sum (Σt2 = Σc·u² − Σu·s1/n + Σsq/4n²),
    // so no all-partition count window is needed — one prefix-sum
    // window over the blocks is the whole order-statistics cost
    val contrib = blocks
      .withColumn("m", coalesce(sum(col("c")).over(wPrev), lit(0.0)))
      .withColumn("s1", col("c") * (lit(2.0) * col("m") + col("c")))
      .withColumn("sq",
        col("c") * (lit(2.0) * col("m") - 1) * (lit(2.0) * col("m") - 1)
          + lit(2.0) * (lit(2.0) * col("m") - 1) * col("c") * (col("c") + 1)
          + lit(2.0 / 3.0) * col("c") * (col("c") + 1)
            * (lit(2.0) * col("c") + 1))
    contrib.groupBy(col("event_type"))
      .agg(sum(col("c")).as("nd"),
        (sum(col("u") * col("c")) / sum(col("c"))).as("ub"),
        sum(col("c") * col("u") * col("u")).as("cu2"),
        sum(col("u") * col("s1")).as("us1"),
        sum(col("sq")).as("sqs"))
      .withColumn("ss", col("cu2") - col("us1") / col("nd")
        + col("sqs") / (lit(4.0) * col("nd") * col("nd")))
      .select(col("event_type"), col("nd").cast("long").as("n"),
        round4eps(col("ub")).as("mean_frac"),
        round4eps(col("ss") - col("nd") * (col("ub") - 0.5) *
          (col("ub") - 0.5) + lit(1.0) / (lit(12.0) * col("nd"))).as("u2_stat"))
      .orderBy(col("event_type"))
  }
}
