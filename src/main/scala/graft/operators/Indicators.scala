package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.{round4eps, round6eps}

/** Technical-indicator kit over the daily revenue series — the
  * momentum/volatility monitors a metrics platform runs on any KPI
  * stream (revenue here; error rates, volumes, latencies in
  * production). Reference surface: the reference's mart is the daily
  * OHLC-style rollup (`fct_bitcoin_daily` — min/max/avg per day,
  * README.md:388); these are the standard indicator layer above it.
  *
  * ALL indicators run on the DISTRIBUTION-COLLAPSED daily frame
  * (calendar-bounded NDV), so every window below is bounded and
  * corpus-size-independent; the only fact-linear term is the daily
  * aggregate. Series values are quantized before the windows so both
  * engines fold identical inputs.
  *
  * Cross-engine discipline:
  *  - RSI uses CUTLER's variant (simple moving averages of gains and
  *    losses) — window-EXACT on both engines, where Wilder's original
  *    smoothing is a recursion an engine can only truncate.
  *  - MACD's EMAs are DEFINED as their K-truncated closed forms
  *    (K = [[EmaWindow]], the ControlCharts.ewmaChart idiom): with
  *    a26 = 1 − 2/27, a26^240 ≈ 9e−9 — far below the 1e-4 quantum.
  *    The signal line is the same truncated EMA over the QUANTIZED
  *    macd series (two positional window passes).
  */
object Indicators {

  val EmaWindow = 240

  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1000000.0)).as("x"))

  /** Cutler's RSI(14): 100 − 100/(1 + SMA₁₄(gains)/SMA₁₄(losses)),
    * with the zero-loss window pinned to RSI 100. Warm-up rows (< 14
    * prior days) are dropped. */
  def rsi(s: SparkSession, dir: String, n: Int = 14): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val wN = wOrd.rowsBetween(-(n - 1), 0)
    dailyRevenue(s, dir)
      .withColumn("chg", round4eps(col("x") - lag(col("x"), 1).over(wOrd)))
      .filter(col("chg").isNotNull)
      .withColumn("gain", when(col("chg") > 0, col("chg")).otherwise(lit(0.0)))
      .withColumn("loss", when(col("chg") < 0, -col("chg")).otherwise(lit(0.0)))
      .withColumn("r", row_number().over(wOrd))
      .withColumn("ag", avg(col("gain")).over(wN))
      .withColumn("al", avg(col("loss")).over(wN))
      .filter(col("r") >= n)
      .select(col("d"),
        round4eps(col("x")).as("close"),
        when(round4eps(col("al")) === 0.0, lit(100.0))
          .otherwise(round4eps(lit(100.0) -
            lit(100.0) / (lit(1.0) + col("ag") / col("al")))).as("rsi"))
      .orderBy(col("d"))
  }

  /** The K-truncated EMA term: α·Σ_{j} a^{m−j}·arr[j] (+ a^r·mu while
    * the window is still warming up), positional over the collected
    * window array — identical finite arithmetic on both engines. */
  private def truncEma(series: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, mu: org.apache.spark.sql.Column,
      span: Int) = {
    val alpha = 2.0 / (span + 1.0)
    val a = 1.0 - alpha
    val wsum = aggregate(
      transform(sequence(lit(1), size(series)),
        j => element_at(series, j) * pow(lit(a), size(series) - j)),
      lit(0.0), (acc, v) => acc + v)
    lit(alpha) * wsum +
      when(r <= EmaWindow, pow(lit(a), r) * mu).otherwise(lit(0.0))
  }

  /** MACD(12, 26, 9): macd = EMA₁₂ − EMA₂₆ of the daily close; signal
    * = EMA₉ of the (quantized) macd; histogram = macd − signal with a
    * sign flag (the crossover monitor). */
  def macd(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val wArr = wOrd.rowsBetween(-(EmaWindow - 1), 0)
    val daily = dailyRevenue(s, dir)
    val stats = daily.agg(avg(col("x")).as("mu"))
    val withMacd = daily.crossJoin(broadcast(stats))
      .withColumn("r", row_number().over(wOrd))
      .withColumn("arr", collect_list(col("x")).over(wArr))
      .withColumn("macd", round4eps(
        truncEma(col("arr"), col("r"), col("mu"), 12) -
          truncEma(col("arr"), col("r"), col("mu"), 26)))
      .select(col("d"), col("x"), col("r"), col("macd"))
    // second pass: EMA9 over the QUANTIZED macd series (its own mean
    // as the warm-up anchor, same truncated form)
    val mstats = withMacd.agg(avg(col("macd")).as("mmu"))
    withMacd.crossJoin(broadcast(mstats))
      .withColumn("marr", collect_list(col("macd")).over(wArr))
      .withColumn("signal", round4eps(
        truncEma(col("marr"), col("r"), col("mmu"), 9)))
      .select(col("d"), round4eps(col("x")).as("close"),
        col("macd"), col("signal"),
        round4eps(col("macd") - col("signal")).as("histogram"),
        (col("macd") > col("signal")).as("bullish"))
      .orderBy(col("d"))
  }

  /** Bollinger bands(20, 2): rolling mean ± 2 population sigma, %B
    * position and bandwidth. Warm-up rows (< 20 days) dropped so every
    * reported band is a full-window statistic. */
  def bollinger(s: SparkSession, dir: String, n: Int = 20): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val wN = wOrd.rowsBetween(-(n - 1), 0)
    dailyRevenue(s, dir)
      .withColumn("r", row_number().over(wOrd))
      .withColumn("mid", avg(col("x")).over(wN))
      // population sigma from exact window sums
      .withColumn("sig", sqrt(
        sum(col("x") * col("x")).over(wN) / lit(n.toDouble) -
          (sum(col("x")).over(wN) / lit(n.toDouble)) *
            (sum(col("x")).over(wN) / lit(n.toDouble))))
      .filter(col("r") >= n)
      .select(col("d"), round4eps(col("x")).as("close"),
        round4eps(col("mid")).as("mid"),
        round4eps(col("mid") - lit(2.0) * col("sig")).as("lower"),
        round4eps(col("mid") + lit(2.0) * col("sig")).as("upper"),
        round4eps((col("x") - (col("mid") - lit(2.0) * col("sig"))) /
          (lit(4.0) * col("sig"))).as("pct_b"),
        round4eps(lit(4.0) * col("sig") / col("mid")).as("bandwidth"))
      .orderBy(col("d"))
  }

  /** Theta-method forecast (the M3-winning two-line decomposition,
    * standard-θ=2 variant): h-step-ahead revenue = SES level of the
    * series (the θ-line average collapses to plain SES for θ=2) plus
    * half the linear drift — b/2·(h − 1 + 1/α + terms the documented
    * simplification folds to b/2·(h + 1/α − 1)). The drift b is the
    * closed-form OLS slope of daily revenue on t; the SES level at T
    * uses the same K-truncated positional form as [[macd]]'s EMAs
    * (identical finite arithmetic on both engines, α = 0.3, K = 240).
    * Output: the last observed level plus forecasts for h = 1..14 —
    * the horizon table a replenishment planner reads. */
  def thetaForecast(s: SparkSession, dir: String,
      alpha: Double = 0.3, horizon: Int = 14): DataFrame = {
    val wOrd = Window.orderBy(col("d"))
    val wArr = wOrd.rowsBetween(-(EmaWindow - 1), 0)
    val daily = dailyRevenue(s, dir).persistMemDisk
    // drift: exact-moment OLS slope of x on t = datediff(d, d0)
    val base = daily.agg(min(col("d")).as("d0"),
      avg(col("x")).as("mu"),
      count(lit(1)).cast("double").as("tt"))
    val mo = daily.crossJoin(broadcast(base))
      .withColumn("t", datediff(col("d"), col("d0")).cast("double"))
      .agg(max(col("tt")).as("n"), max(col("mu")).as("mu"),
        sum(col("t")).as("st"), sum(col("x")).as("sx"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("x")).as("stx"))
      .withColumn("b", round6eps(
        (col("stx") - col("st") * col("sx") / col("n")) /
          (col("stt") - col("st") * col("st") / col("n"))))
    // SES level at the LAST row via the truncated positional fold
    val sesT = daily.crossJoin(broadcast(base.select(col("mu"))))
      .withColumn("r", row_number().over(wOrd))
      .withColumn("arr", collect_list(col("x")).over(wArr))
      .withColumn("ses", truncEmaAlpha(col("arr"), col("r"), col("mu"), alpha))
      .orderBy(col("r").desc).limit(1)
      .select(round6eps(col("ses")).as("ses_t"), col("r").cast("double").as("tmax"))
    sesT.crossJoin(broadcast(mo.select(col("b"))))
      .withColumn("h", explode(sequence(lit(1), lit(horizon))))
      .select(col("h").cast("long").as("h"),
        round4eps(col("ses_t")).as("level"),
        round4eps(col("b")).as("drift"),
        round4eps(col("ses_t") +
          col("b") / lit(2.0) *
            (col("h").cast("double") + lit(1.0 / alpha - 1.0)))
          .as("forecast"))
      .orderBy(col("h"))
  }

  /** [[truncEma]] with an explicit smoothing α (the span form maps
    * α = 2/(span+1); theta wants α pinned directly). */
  private def truncEmaAlpha(series: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column, mu: org.apache.spark.sql.Column,
      alpha: Double) = {
    val a = 1.0 - alpha
    val wsum = aggregate(
      transform(sequence(lit(1), size(series)),
        j => element_at(series, j) * pow(lit(a), size(series) - j)),
      lit(0.0), (acc, v) => acc + v)
    lit(alpha) * wsum +
      when(r <= EmaWindow, pow(lit(a), r) * mu).otherwise(lit(0.0))
  }
}
