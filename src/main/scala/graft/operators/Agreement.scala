package graft.operators

import graft.Caching.CachingOps
import graft.Tables
import graft.functions.Rounding.round4eps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Agreement / reliability / homogeneity test kit — the classical
  * screens an annotation-heavy training-data pipeline runs over rater
  * pools and metric panels before trusting a label set: variance
  * homogeneity (Bartlett), distribution-free location (Mood's median),
  * correlated binary outcomes (Cochran's Q), rank concordance
  * (Kendall's W), internal consistency (Cronbach's alpha), and
  * cluster reliability (one-way ICC). The reference's dbt marts stop
  * at grouped sums (`models/marts/fct_sales_summary.sql`); these are
  * the QA layer a labeling pipeline bolts on top of the same tables.
  *
  * Scale shape (whole file): every operator is one or two map-side-
  * combined moment aggregations over the fact scan — the shuffle
  * carries a handful of doubles per (group × map task), the final
  * statistic is scalar algebra on a group-bounded frame (≤ tens of
  * rows). No windows over fact-scale frames, no driver collects, no
  * iteration: each is the textbook flat-at-100× pattern. Inputs are
  * quantized to exact integers (floor-bucketed prices, cents, counts)
  * so partial-aggregate summation order cannot produce cross-engine
  * ulp drift; the final round4eps absorbs the last-ulp noise of the
  * scalar algebra (see Rounding.scaladoc).
  */
object Agreement {

  private def ordersByRegion(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))

  /** Bartlett's test for homogeneity of variances of the bucketed
    * order value across the five regions. X² = [(N−k)·ln Sp² −
    * Σ(nᵢ−1)·ln sᵢ²] / C with the usual small-sample correction
    * C = 1 + (Σ1/(nᵢ−1) − 1/(N−k)) / (3(k−1)).
    *
    * Scale shape: ONE (n, Σv, Σv²) aggregation keyed by region (5
    * groups), then scalar algebra on the 5-row frame. Values are
    * floor(price/1000) — exact integer doubles, so the moment sums
    * are order-independent and the only float ops are the final logs
    * and ratios (round4eps-absorbed). */
  def bartlettTest(s: SparkSession, dir: String): DataFrame = {
    val o = ordersByRegion(s, dir).select(
      col("n_regionkey").as("g"),
      floor(col("o_totalprice") / 1000).cast("double").as("v"))
    val g = o.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"))
      .select(col("n"),
        ((col("svv") - col("sv") * col("sv") / col("n")) / (col("n") - 1))
          .as("s2"))
    g.agg(
        count(lit(1)).cast("double").as("k"),
        sum(col("n")).as("nn"),
        sum((col("n") - 1) * log(col("s2"))).as("sls"),
        sum((col("n") - 1) * col("s2")).as("ssp"),
        sum(lit(1.0) / (col("n") - 1)).as("sinv"))
      .select(
        col("k").cast("long").as("k"),
        col("nn").cast("long").as("n"),
        round4eps(
          ((col("nn") - col("k")) * log(col("ssp") / (col("nn") - col("k"))) -
            col("sls")) /
          (lit(1.0) + (col("sinv") - lit(1.0) / (col("nn") - col("k"))) /
            (lit(3.0) * (col("k") - 1)))).as("chi2_stat"),
        round4eps(lit(1.0) +
          (col("sinv") - lit(1.0) / (col("nn") - col("k"))) /
          (lit(3.0) * (col("k") - 1))).as("c_factor"))
  }

  /** Mood's median test: does the bucketed order value have the same
    * median across the five order priorities? Classifies each order
    * as above / not-above the GLOBAL lower median and chi-squares the
    * resulting 2×k contingency table against independence.
    *
    * Scale shape: the global median comes from a value-domain
    * collapse (distinct floor(price/100) buckets, NDV-bounded ~5k)
    * with a cumulative count — never a fact-scale sort; the 2×k
    * table is one conditional-count aggregation keyed by priority.
    * Both passes are map-side combined; all counts are exact
    * integers, so the chi-square arithmetic is deterministic. */
  def moodMedianTest(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_orderpriority").as("g"),
      floor(col("o_totalprice") / 100).cast("long").as("v"))
      .persistMemDisk
    val cells = o.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wAll = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // lower median = smallest bucket whose cumulative count reaches
    // floor((N+1)/2); the cumulative runs over the NDV-bounded bucket
    // frame, not the fact table.
    val med = cells
      .withColumn("cc", sum(col("c")).over(wAll))
      .withColumn("nn", sum(col("c")).over(Window.partitionBy()))
      .agg(min(when(col("cc") >= floor((col("nn") + 1) / lit(2.0)), col("v")))
        .as("med"))
    val tab = o.crossJoin(broadcast(med))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("ng"),
        sum(when(col("v") > col("med"), 1L).otherwise(0L)).cast("double")
          .as("a"),
        max(col("med")).as("med"))
    val tot = tab.agg(sum(col("ng")).as("nn"), sum(col("a")).as("aa"),
      count(lit(1)).cast("double").as("k"))
    tab.crossJoin(broadcast(tot))
      .agg(
        max(col("nn")).cast("long").as("n"),
        max(col("med")).as("median"),
        (max(col("k")) - 1).cast("long").as("df"),
        round4eps(sum(
          (col("a") - col("ng") * col("aa") / col("nn")) *
            (col("a") - col("ng") * col("aa") / col("nn")) /
            (col("ng") * col("aa") / col("nn")) +
          ((col("ng") - col("a")) - col("ng") * (col("nn") - col("aa")) / col("nn")) *
            ((col("ng") - col("a")) - col("ng") * (col("nn") - col("aa")) / col("nn")) /
            (col("ng") * (col("nn") - col("aa")) / col("nn"))))
          .as("chi2_stat"))
  }

  /** Cochran's Q over three correlated binary outcomes per customer —
    * "did this customer ever place an urgent order / a >150k order /
    * a completed (F-status) order". Q = (k−1)[k·ΣCⱼ² − (ΣC)²] /
    * (k·ΣRᵢ − ΣRᵢ²) where Cⱼ are outcome totals and Rᵢ per-customer
    * row sums. The repeated-measures screen for "do these three
    * labeling heuristics fire at the same rate on the same units".
    *
    * Scale shape: one customer-keyed conditional-max aggregation
    * (the fact scan), then one global sum over the customer frame —
    * both map-side combined; every quantity is an exact integer. */
  def cochranQ(s: SparkSession, dir: String): DataFrame = {
    val flags = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("t1"),
        max(when(col("o_totalprice") > 150000, 1L).otherwise(0L)).as("t2"),
        max(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("t3"))
    flags
      .select(col("t1"), col("t2"), col("t3"),
        (col("t1") + col("t2") + col("t3")).as("r"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(col("t1")).as("c1"), sum(col("t2")).as("c2"),
        sum(col("t3")).as("c3"),
        sum(col("r")).as("sr"), sum(col("r") * col("r")).as("srr"))
      .select(col("n_subjects"), lit(2L).as("df"),
        col("c1").as("n_urgent"), col("c2").as("n_high"),
        col("c3").as("n_complete"),
        round4eps(
          (lit(2.0) * (lit(3.0) *
            (col("c1") * col("c1") + col("c2") * col("c2") +
              col("c3") * col("c3")).cast("double") -
            (col("sr") * col("sr")).cast("double"))) /
          (lit(3.0) * col("sr").cast("double") - col("srr").cast("double")))
          .as("q_stat"))
  }

  /** Kendall's coefficient of concordance W across the five regions
    * ranking the twelve calendar months by exact-cents revenue —
    * "do independent rater pools agree on the ordering". W = 12·S /
    * (m²(n³−n)) with S = Σ(Rⱼ − m(n+1)/2)²; chi2 = m(n−1)W.
    *
    * Scale shape: one (region × month) cents-sum aggregation (60
    * cells, exact BIGINT — summation-order-proof), ranks via a
    * row_number over the 60-row frame (deterministic month-asc
    * tie-break), then scalar algebra on 12 rank sums. */
  def kendallW(s: SparkSession, dir: String): DataFrame = {
    val cells = ordersByRegion(s, dir)
      .groupBy(col("n_regionkey").as("g"),
        month(col("o_orderdate")).as("m"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val ranked = cells.withColumn("rk",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("cents").desc, col("m"))))
    val rsums = ranked.groupBy(col("m"))
      .agg(sum(col("rk")).cast("double").as("rj"))
    // S = Σrj² − (Σrj)²/n (the mean rank sum is m(n+1)/2 identically,
    // so the computational form is exact integer algebra)
    rsums
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("rj")).as("sr"), sum(col("rj") * col("rj")).as("srr"))
      .select(lit(5L).as("m_raters"), col("n").cast("long").as("n_items"),
        round4eps(lit(12.0) * (col("srr") - col("sr") * col("sr") / col("n")) /
          (lit(25.0) * (col("n") * col("n") * col("n") - col("n"))))
          .as("w_stat"),
        round4eps(lit(5.0) * (col("n") - 1) * lit(12.0) *
          (col("srr") - col("sr") * col("sr") / col("n")) /
          (lit(25.0) * (col("n") * col("n") * col("n") - col("n"))))
          .as("chi2_stat"))
  }

  /** Cronbach's alpha over a five-item "scale" — each customer's
    * order counts in the five priority classes. α = k/(k−1) ·
    * (1 − Σvar_item / var_total): the internal-consistency check a
    * labeling pipeline runs on a rubric's sub-scores.
    *
    * Scale shape: one customer-keyed conditional-count aggregation,
    * then one global moment pass over the customer frame computing
    * all five item variances and the total-score variance in a
    * single aggregate (12 sums, map-side combined). Counts are exact
    * integers; variances use the explicit (Σx² − (Σx)²/n)/(n−1)
    * form so both engines do identical scalar algebra. */
  def cronbachAlpha(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val itemCols = prios.zipWithIndex.map { case (p, i) =>
      sum(when(col("o_orderpriority") === p, 1L).otherwise(0L))
        .cast("double").as(s"x$i")
    }
    val items = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(itemCols.head, itemCols.tail: _*)
    val withT = items.withColumn("t",
      col("x0") + col("x1") + col("x2") + col("x3") + col("x4"))
    val momentCols: Seq[org.apache.spark.sql.Column] =
      count(lit(1)).cast("double").as("n") +:
        ((0 to 4).flatMap(i => Seq(
          sum(col(s"x$i")).as(s"s$i"),
          sum(col(s"x$i") * col(s"x$i")).as(s"ss$i"))) :+
          sum(col("t")).as("st") :+ sum(col("t") * col("t")).as("sst"))
    val moments = withT.agg(momentCols.head, momentCols.tail: _*)
    def v(sc: String, ssc: String) =
      (col(ssc) - col(sc) * col(sc) / col("n")) / (col("n") - 1)
    val sumItemVar = (0 to 4).map(i => v(s"s$i", s"ss$i"))
      .reduce(_ + _)
    moments.select(
      lit(5L).as("k_items"),
      col("n").cast("long").as("n_subjects"),
      round4eps(sumItemVar).as("sum_item_var"),
      round4eps(v("st", "sst")).as("total_var"),
      round4eps(lit(1.25) * (lit(1.0) - sumItemVar / v("st", "sst")))
        .as("alpha"))
  }

  /** One-way random-effects intraclass correlation ICC(1) of the
    * floored customer account balance clustered by nation — "how much
    * of the metric's variance is between clusters": the reliability
    * screen for any per-annotator or per-source metric panel.
    * MSB/MSW from the one-way ANOVA decomposition; unequal cluster
    * sizes use k₀ = (N − Σnᵢ²/N)/(k−1);
    * ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW).
    *
    * Scale shape: ONE nation-keyed (n, Σv, Σv²) aggregation over the
    * customer scan (25 groups), then scalar algebra on the 25-row
    * frame. floor(acctbal/100) is an exact small-integer double, so
    * the cross-group sums stay far below the magnitude where
    * summation-order ulp noise could reach the 4dp rounding. */
  def iccOneWay(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.customer(s, dir)
      .select(col("c_nationkey").as("g"),
        floor(col("c_acctbal") / 100).cast("double").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"))
    g.agg(
        count(lit(1)).cast("double").as("k"),
        sum(col("n")).as("nn"),
        sum(col("sv")).as("s_all"),
        sum(col("svv")).as("ss_all"),
        sum(col("sv") * col("sv") / col("n")).as("sbn"),
        sum(col("n") * col("n")).as("snn"))
      .select(
        col("k").cast("long").as("k_groups"),
        col("nn").cast("long").as("n"),
        round4eps((col("sbn") - col("s_all") * col("s_all") / col("nn")) /
          (col("k") - 1)).as("msb"),
        round4eps((col("ss_all") - col("sbn")) / (col("nn") - col("k")))
          .as("msw"),
        round4eps(
          ((col("sbn") - col("s_all") * col("s_all") / col("nn")) / (col("k") - 1) -
            (col("ss_all") - col("sbn")) / (col("nn") - col("k"))) /
          ((col("sbn") - col("s_all") * col("s_all") / col("nn")) / (col("k") - 1) +
            (((col("nn") - col("snn") / col("nn")) / (col("k") - 1)) - 1) *
              ((col("ss_all") - col("sbn")) / (col("nn") - col("k")))))
          .as("icc1"))
  }
}
