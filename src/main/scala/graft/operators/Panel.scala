package graft.operators

import graft.Caching.CachingOps
import graft.Tables
import graft.functions.Rounding.round4eps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Panel/causal/spatial screen kit: synthetic control, event-study
  * leads-and-lags, Moran's I spatial autocorrelation, the one-sided
  * Fisher exact test, and Hellinger/Bhattacharyya distribution drift —
  * the observational-inference layer that complements the gated
  * DiD / IV / RDD / propensity family (Stats.scala) with the designs
  * those don't cover: donor-pool counterfactuals, dynamic treatment
  * paths, spatial dependence, exact small-table inference, and
  * geometry-based drift.
  *
  * Scale shape (whole file): each operator collapses the fact scan to
  * a bounded frame FIRST — the calendar (synthControl, eventStudy),
  * the 25-nation map (moransI), a 2×2 table (fisherExact), a
  * value-domain histogram (hellingerDrift) — then does scalar or
  * bounded-frame algebra. The only data-scaled term anywhere is the
  * initial map-side-combined aggregation. Inputs are quantized
  * (round4eps / exact integer counts) per the cross-engine parity
  * discipline in Rounding.scaladoc. */
object Panel {

  /** Synthetic control: region 0's daily revenue modeled as
    * b0 + b1·(region 1) + b2·(region 2) fitted on the PRE-period
    * (first calendar half, the fixed knot), then the post-period gap
    * actual − synthetic is the treatment-effect estimate. The
    * donor-pool counterfactual design (Abadie et al.) in its
    * OLS-weights form — closed-form, no simplex solver.
    *
    * Scale shape: one fact-scan aggregation to the (day × 3 regions)
    * pivoted calendar frame, one pre-period moment pass (centered
    * 2×2 Cramer — the olsMulti solve), coefficients broadcast back,
    * one residual pass. Flat at 100×. */
  def synthControl(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(
        round4eps(sum(when(col("n_regionkey") === 0, col("o_totalprice"))
          .otherwise(lit(0.0))) / lit(1e6)).as("y0"),
        round4eps(sum(when(col("n_regionkey") === 1, col("o_totalprice"))
          .otherwise(lit(0.0))) / lit(1e6)).as("y1"),
        round4eps(sum(when(col("n_regionkey") === 2, col("o_totalprice"))
          .otherwise(lit(0.0))) / lit(1e6)).as("y2"))
    val base = daily.agg(min(col("d")).as("d0"),
      floor(datediff(max(col("d")), min(col("d"))) / 2).as("knot"))
    val t = daily.crossJoin(broadcast(base))
      .withColumn("t", datediff(col("d"), col("d0")).cast("double"))
      .withColumn("pre", col("t") < col("knot"))
      .persistMemDisk
    val m = t.filter(col("pre"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("y1")).as("s1"), sum(col("y2")).as("s2"),
        sum(col("y0")).as("sy"),
        sum(col("y1") * col("y1")).as("s11"),
        sum(col("y1") * col("y2")).as("s12"),
        sum(col("y2") * col("y2")).as("s22"),
        sum(col("y1") * col("y0")).as("s1y"),
        sum(col("y2") * col("y0")).as("s2y"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val coef2 = m.select(col("n").as("n_pre"),
      ((c1y * c22 - c2y * c12) / det).as("b1"),
      ((c11 * c2y - c12 * c1y) / det).as("b2"),
      ((col("sy") - (c1y * c22 - c2y * c12) / det * col("s1") -
        (c11 * c2y - c12 * c1y) / det * col("s2")) / col("n")).as("b0"))
    val gaps = t.crossJoin(broadcast(coef2))
      .withColumn("gap",
        col("y0") - (col("b0") + col("b1") * col("y1") +
          col("b2") * col("y2")))
    gaps.agg(
        max(col("n_pre")).cast("long").as("n_pre"),
        sum(when(!col("pre"), 1L).otherwise(0L)).as("n_post"),
        round4eps(max(col("b0"))).as("b0"),
        round4eps(max(col("b1"))).as("b1"),
        round4eps(max(col("b2"))).as("b2"),
        round4eps(sqrt(
          sum(when(col("pre"), col("gap") * col("gap")).otherwise(lit(0.0))) /
            max(col("n_pre")))).as("pre_rmse"),
        round4eps(
          sum(when(!col("pre"), col("gap")).otherwise(lit(0.0))) /
            sum(when(!col("pre"), 1L).otherwise(0L))).as("att"))
  }

  /** Event-study leads and lags: the BUILDING-segment vs rest
    * per-order revenue difference by month relative to the calendar-
    * midpoint event, re-centered on the k = −1 baseline (the standard
    * dynamic-DiD readout; the single-coefficient DiD is already
    * gated). A flat pre-path validates the parallel-trends
    * assumption; the post-path traces effect dynamics.
    *
    * Scale shape: one (relative-month × group) cents-exact
    * aggregation over the fact scan (13×2 cells), the k = −1
    * baseline broadcast back — everything after the scan is a
    * 13-row frame. */
  def eventStudy(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .as("mi"),
        (col("c_mktsegment") === "BUILDING").as("treated"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .persistMemDisk
    val base = o.agg(
      floor((min(col("mi")) + max(col("mi"))) / lit(2.0)).cast("int")
        .as("me"))
    val cells = o.crossJoin(broadcast(base))
      .withColumn("rel", col("mi") - col("me"))
      .filter(col("rel") >= -6 && col("rel") <= 6)
      .groupBy(col("rel"))
      .agg(
        sum(when(col("treated"), 1L).otherwise(0L)).as("n_treated"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("n_control"),
        (sum(when(col("treated"), col("cents")).otherwise(0L))
          .cast("double") /
          sum(when(col("treated"), 1L).otherwise(0L)) / lit(100.0) -
          sum(when(!col("treated"), col("cents")).otherwise(0L))
            .cast("double") /
            sum(when(!col("treated"), 1L).otherwise(0L)) / lit(100.0))
          .as("diff"))
      .persistMemDisk
    val baseDiff = cells.filter(col("rel") === -1)
      .select(col("diff").as("base_diff"))
    cells.crossJoin(broadcast(baseDiff))
      .select(col("rel").cast("long").as("rel_month"),
        col("n_treated"), col("n_control"),
        round4eps(col("diff")).as("diff"),
        round4eps(col("diff") - col("base_diff")).as("coef"))
      .orderBy(col("rel_month"))
  }

  /** Moran's I spatial autocorrelation of per-nation revenue under
    * same-region contiguity weights (wᵢⱼ = 1 iff same region, i≠j):
    * I = (n/W)·ΣΣ wᵢⱼ zᵢ zⱼ / Σzᵢ², computed via the block identity
    * ΣΣ wᵢⱼ zᵢ zⱼ = Σ_regions [(Σz)² − Σz²] so the weight matrix is
    * never materialized. The "is the metric spatially clustered"
    * screen for any per-geo panel.
    *
    * Scale shape: one fact-scan aggregation to the 25-nation frame,
    * then region-block algebra on 5 rows. */
  def moransI(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("x"))
      .persistMemDisk
    val mu = x.agg(round4eps(avg(col("x"))).as("mu"),
      count(lit(1)).cast("double").as("n"))
    val z = x.crossJoin(broadcast(mu))
      .select(col("rk"), col("n"), (col("x") - col("mu")).as("z"))
    val blocks = z.groupBy(col("rk"))
      .agg(max(col("n")).as("n"),
        count(lit(1)).cast("double").as("nr"),
        sum(col("z")).as("sz"), sum(col("z") * col("z")).as("qz"))
    blocks.agg(
        max(col("n")).cast("long").as("n_nations"),
        sum(col("nr") * (col("nr") - 1)).cast("long").as("w_sum"),
        round4eps(
          (max(col("n")) / sum(col("nr") * (col("nr") - 1))) *
            sum(col("sz") * col("sz") - col("qz")) / sum(col("qz")))
          .as("morans_i"),
        round4eps(lit(-1.0) / (max(col("n")) - 1)).as("expected_i"))
  }

  /** Stirling log-gamma (x ≥ 1): the shared deterministic kernel for
    * exact-test log-binomials — (x−½)ln x − x + ½ln 2π + 1/12x −
    * 1/360x³. Accuracy ~1e-13 for the x ≥ 10 arguments that carry
    * any probability mass; more importantly the formula is IDENTICAL
    * algebra on both engines, so the test statistic is deterministic
    * by construction. */
  private def lg(x: Column): Column =
    (x - lit(0.5)) * log(x) - x + lit(0.5 * math.log(2.0 * math.Pi)) +
      lit(1.0) / (lit(12.0) * x) -
      lit(1.0) / (lit(360.0) * x * x * x)

  private def lnChoose(m: Column, j: Column): Column =
    lg(m + 1) - lg(j + 1) - lg(m - j + 1)

  /** One-sided Fisher exact test on the 2×2 table
    * (urgent-priority?) × (F-status?) over orders:
    * p = P(X ≥ a) under the hypergeometric null, summed term-by-term
    * with Stirling log-binomials — a contiguous tail sum, so no
    * boundary comparisons that ulp drift could flip. Exact inference
    * for small-count strata where the chi-square approximation
    * (already gated) is unreliable.
    *
    * Scale shape: ONE conditional-count aggregation to four integers,
    * then a k-range explode of the 1-row frame (support-bounded:
    * ≤ min(K, n) terms — table-margin-bounded, not corpus-bounded)
    * and one sum. */
  def fisherExact(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(s, dir).agg(
      sum(when(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderstatus") === "F", 1L).otherwise(0L)).as("a"),
      sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
        .as("kk"),
      sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("nn"),
      count(lit(1)).as("tt"))
    val terms = counts
      .withColumn("k", explode(sequence(col("a"), least(col("kk"), col("nn")))))
      .select(col("a"), col("kk"), col("nn"), col("tt"),
        exp(lnChoose(col("kk").cast("double"), col("k").cast("double")) +
          lnChoose((col("tt") - col("kk")).cast("double"),
            (col("nn") - col("k")).cast("double")) -
          lnChoose(col("tt").cast("double"), col("nn").cast("double")))
          .as("p_k"))
    terms.groupBy(col("a"), col("kk"), col("nn"), col("tt"))
      .agg(sum(col("p_k")).as("p"))
      .select(col("a").as("n_11"), col("kk").as("row1"),
        col("nn").as("col1"), col("tt").as("total"),
        round4eps(
          (col("a") * (col("tt") - col("kk") - col("nn") + col("a")))
            .cast("double") /
          ((col("kk") - col("a")) * (col("nn") - col("a"))).cast("double"))
          .as("odds_ratio"),
        round4eps(col("p")).as("p_one_sided"))
  }

  /** Hellinger / Bhattacharyya distance between the order-value
    * distributions of URGENT vs LOW priority orders over 10k-wide
    * price buckets: BC = Σ√(pᵢqᵢ), H = √(1−BC), B = −ln BC — the
    * geometry-based drift pair complementing the gated KL/JS/PSI/
    * Wasserstein family (H is a true metric and bounded, so it is
    * the one you threshold in a drift monitor).
    *
    * Scale shape: one bucket-keyed conditional-count aggregation
    * (value-domain-bounded ~60 buckets), then one sum over the
    * bucket frame. Exact integer counts throughout. */
  def hellingerDrift(s: SparkSession, dir: String): DataFrame = {
    val buckets = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .groupBy(floor(col("o_totalprice") / 10000).cast("long").as("b"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("cp"),
        sum(when(col("o_orderpriority") === "5-LOW", 1L).otherwise(0L))
          .as("cq"))
    val tot = buckets.agg(sum(col("cp")).cast("double").as("np"),
      sum(col("cq")).cast("double").as("nq"))
    buckets.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_buckets"),
        sum(sqrt(col("cp").cast("double") / col("np") *
          (col("cq").cast("double") / col("nq")))).as("bc"))
      .select(col("n_buckets"),
        round4eps(col("bc")).as("bc_coef"),
        round4eps(sqrt(lit(1.0) - least(col("bc"), lit(1.0))))
          .as("hellinger"),
        round4eps(lit(-1.0) * log(col("bc"))).as("bhattacharyya"))
  }
}
