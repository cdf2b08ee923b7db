package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Statistical process-control charts over daily pipeline metrics —
  * the monitoring layer a production data platform runs on its own
  * operational series (volumes, error rates, latencies).
  *
  * All three charts work on DISTRIBUTION-COLLAPSED daily frames
  * (calendar-bounded NDV ≤ the corpus date span), so every window
  * below is bounded and corpus-size-independent; the only fact-linear
  * term is the first daily aggregate.
  *
  * Cross-engine discipline: the EWMA is defined AS its K-truncated
  * closed form (K = [[EwmaWindow]]) — z_r = λ·Σ_{k<min(r,K)} a^k·x_{r−k}
  * (+ a^r·z₀ while r ≤ K), a = 1−λ — an IDENTICAL finite formula on
  * both engines rather than a recursion one engine approximates
  * (a^K ≈ 2e−12 at λ=0.2, far below the 1e-4 quantization). The
  * weighted window sum is computed positionally over the window's
  * collected array, in ascending index order on both sides. */
object ControlCharts {

  val Lambda = 0.2
  val EwmaWindow = 120

  /** EWMA control chart on daily order counts: z_t with time-varying
    * ±3σ√(λ/(2−λ)·(1−a^{2t})) limits around the series mean.
    * Output: (d, x, z, lcl, ucl, breach). */
  def ewmaChart(s: SparkSession, dir: String): DataFrame = {
    val a = 1.0 - Lambda
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
    val stats = daily.agg(
      avg(col("x")).as("mu"),
      // population variance from exact sums (counts are integers)
      (sum(col("x") * col("x")) / count(lit(1)) -
        avg(col("x")) * avg(col("x"))).as("varx"))
    val wOrd = Window.orderBy(col("d"))
    val wArr = wOrd.rowsBetween(-(EwmaWindow - 1), 0)
    daily.crossJoin(broadcast(stats))
      .withColumn("r", row_number().over(wOrd))
      .withColumn("arr", collect_list(col("x")).over(wArr))
      // weighted sum, ascending array index: element j of m carries
      // weight a^(m-j) (newest = weight 1)
      .withColumn("wsum", aggregate(
        transform(sequence(lit(1), size(col("arr"))),
          j => element_at(col("arr"), j) *
            pow(lit(a), size(col("arr")) - j)),
        lit(0.0), (acc, v) => acc + v))
      .withColumn("z",
        lit(Lambda) * col("wsum") +
          when(col("r") <= EwmaWindow,
            pow(lit(a), col("r")) * col("mu")).otherwise(0.0))
      .withColumn("halfw",
        lit(3.0) * sqrt(col("varx") * lit(Lambda / (2.0 - Lambda)) *
          (lit(1.0) - pow(lit(a), col("r") * 2))))
      // quantize-before-compare: the breach flag reads the ROUNDED
      // z/limits so a boundary case cannot flip on engine ulp drift
      .select(col("d"), col("x").cast("long").as("x"),
        round4eps(col("z")).as("z"),
        round4eps(col("mu") - col("halfw")).as("lcl"),
        round4eps(col("mu") + col("halfw")).as("ucl"))
      .withColumn("breach",
        (col("z") < col("lcl") || col("z") > col("ucl")).cast("int"))
      .orderBy(col("d"))
  }

  /** p-chart on the daily error-event proportion: p̄ ± 3√(p̄(1−p̄)/n_t)
    * limits (n_t = that day's event volume). */
  def pChart(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "error").cast("int")).as("bad"))
    val pbar = daily.agg((sum(col("bad")).cast("double") /
      sum(col("n")).cast("double")).as("pbar"))
    daily.crossJoin(broadcast(pbar))
      .withColumn("p", col("bad").cast("double") / col("n").cast("double"))
      .withColumn("halfw", lit(3.0) * sqrt(
        col("pbar") * (lit(1.0) - col("pbar")) / col("n").cast("double")))
      .select(col("d"), col("n"), col("bad"),
        round4eps(col("p")).as("p"),
        round4eps(greatest(col("pbar") - col("halfw"), lit(0.0))).as("lcl"),
        round4eps(col("pbar") + col("halfw")).as("ucl"))
      .withColumn("breach",
        (col("p") < col("lcl") || col("p") > col("ucl")).cast("int"))
      .orderBy(col("d"))
  }

  /** Individuals / moving-range (X-MR) chart on daily revenue:
    * x̄ ± 2.66·MR̄ limits, MR̄ = mean |x_t − x_{t−1}|. Revenue sums are
    * rounded to cents (floor(x·100+0.5)/100) BEFORE differencing so
    * the moving ranges are exact on both engines. */
  def xmrChart(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((floor(sum(col("o_totalprice")) * 100 + 0.5) / 100).as("x"))
      .withColumn("mr", abs(col("x") - lag(col("x"), 1).over(wOrd)))
    val stats = daily.agg(avg(col("x")).as("xbar"), avg(col("mr")).as("mrbar"))
    daily.crossJoin(broadcast(stats))
      .select(col("d"), col("x"),
        round4eps(col("mr")).as("mr"),
        round4eps(col("xbar") - lit(2.66) * col("mrbar")).as("lcl"),
        round4eps(col("xbar") + lit(2.66) * col("mrbar")).as("ucl"))
      .withColumn("breach",
        (col("x") < col("lcl") || col("x") > col("ucl")).cast("int"))
      .orderBy(col("d"))
  }

  /** Process capability per brand for the order quantity against the
    * fixed spec window [1, 50]: Cp = (USL−LSL)/6s (potential),
    * Cpk = min(USL−μ, μ−LSL)/3s (actual, centering-penalized), and
    * the EXACT share outside spec — the capability complement of the
    * control-chart family (charts ask "is it stable", capability
    * asks "does stable meet spec").
    *
    * Scale shape: one brand-keyed integer-moment pass, exact counts;
    * everything after is 25 rows. */
  def processCapability(s: SparkSession, dir: String,
      lsl: Double = 1.0, usl: Double = 50.0): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").as("x"))
    val mu = col("sx") / col("n")
    val sd = sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
      (col("n") - 1))
    li.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(when(col("x") < lsl || col("x") > usl, 1L).otherwise(0L))
          .as("n_out"))
      .select(col("p_brand"), col("n").cast("long").as("n"),
        round4eps(mu).as("mean_qty"),
        round4eps(sd).as("sd_qty"),
        round4eps(lit(usl - lsl) / (lit(6.0) * sd)).as("cp"),
        round4eps(least(lit(usl) - mu, mu - lit(lsl)) /
          (lit(3.0) * sd)).as("cpk"),
        round4eps(col("n_out").cast("double") / col("n"))
          .as("pct_out_of_spec"))
      .orderBy(col("p_brand"))
  }
}
