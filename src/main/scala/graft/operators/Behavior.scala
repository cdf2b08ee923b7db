package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Behavioral / product-analytics operators over `events`: funnel
  * conversion and cohort retention — the two aggregate shapes every
  * event warehouse serves, absent from the reference (whose mart is a
  * single-table rollup, SURVEY §2.4).
  *
  * Scale posture: both operators reduce to user-keyed aggregates and
  * user-keyed joins — ONE shuffle partitioning (user_id) serves every
  * stage, and each stage's output is strictly smaller than its input
  * (min-per-user, distinct-per-user-day), so partials combine map-side
  * and nothing reshuffles on a second key until the final tiny rollup.
  */
object Behavior {

  /** Ordered funnel: view → click → purchase, strictly increasing
    * event time per user. Stage N counts users whose earliest stage-N
    * event follows their earliest stage-(N-1) event — the standard
    * "earliest-path" funnel (conversion measured against the first
    * opportunity, immune to event duplication). Output: one row per
    * stage with the user count and conversion from stage 1. */
  def funnelStages(s: SparkSession, dir: String,
                   stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val events = Tables.events(s, dir)
    // earliest qualifying ts per user per stage, chained; each stage
    // frame feeds BOTH the next stage and its own count, so persist
    // (lifecycle: cleared by the caller / bench harness)
    val first = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts0"))
      .persistMemDisk
    val chained = stages.tail.zipWithIndex.foldLeft(Seq(first)) {
      case (acc, (stage, i)) =>
        val prev = acc.last
        acc :+ events.filter(col("event_type") === stage)
          .join(prev.select(col("user_id"), col(s"ts$i").as("prev_ts")), "user_id")
          .filter(col("ts") > col("prev_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"ts${i + 1}"))
          .persistMemDisk
    }
    val counts = chained.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
    // conversion against stage 1, computed in-plan (no driver action)
    val base = counts.filter(col("stage") === 1)
      .select(col("n_users").cast("double").as("base"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("event_type"), col("n_users"),
        round4eps(col("n_users") / col("base")).as("conversion"))
  }

  /** Strict-window funnel — [[funnelStages]] with a per-step time
    * budget: stage N counts only users whose earliest qualifying
    * stage-N event lands within `maxGapSec` AFTER their stage-(N-1)
    * anchor. The product-analytics default ("converted within 7
    * days"), where the unbounded funnel answers "ever converted".
    * Identical dataflow: one user-keyed aggregate per stage, each
    * stage's output strictly smaller than its input. */
  def funnelStagesWithin(s: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      maxGapSec: Long = 604800L): DataFrame = {
    val events = Tables.events(s, dir)
    val first = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts0"))
      .persistMemDisk
    val chained = stages.tail.zipWithIndex.foldLeft(Seq(first)) {
      case (acc, (stage, i)) =>
        val prev = acc.last
        acc :+ events.filter(col("event_type") === stage)
          .join(prev.select(col("user_id"), col(s"ts$i").as("prev_ts")), "user_id")
          .filter(col("ts") > col("prev_ts") &&
            col("ts") <= col("prev_ts") + expr(s"INTERVAL $maxGapSec SECONDS"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"ts${i + 1}"))
          .persistMemDisk
    }
    val counts = chained.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
    val base = counts.filter(col("stage") === 1)
      .select(col("n_users").cast("double").as("base"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("event_type"), col("n_users"),
        round4eps(col("n_users") / col("base")).as("conversion"))
  }

  /** Cohort retention: users bucketed by first-activity date, then
    * counted per (cohort_date, day_offset) of later activity. The
    * (user, day) de-dup happens before the join, so the join input is
    * already collapsed to at most users × days rows. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val cohort = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val active = events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_date"), datediff(col("d"), col("cohort_date")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort LTV curve: cumulative purchase value per signup cohort
    * over day offsets (the corpus spans one month — day grain is the
    * informative axis; at multi-year scale swap the truncation for
    * months), normalized per cohort user — the
    * lifetime-value report product/finance reads off every event
    * warehouse. Dataflow: user→cohort assignment (one user-keyed
    * aggregate), purchase revenue per (cohort, offset) (one more), a
    * running-sum window over the per-cohort OFFSET axis (days, not
    * rows — the window input is cohort×offset-sized, thousands of
    * rows at any corpus scale), and a broadcast of cohort sizes. */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
      .persistMemDisk
    val sizes = cohort.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("cohort_size"))
    val rev = ev.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .join(cohort, "user_id")
      .groupBy(col("cohort_date"),
        datediff(to_date(col("ts")), col("cohort_date")).as("day_offset"))
      .agg(sum(col("value")).as("rev_raw"))
    val w = Window.partitionBy(col("cohort_date")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.join(broadcast(sizes), "cohort_date")
      .withColumn("cum_raw", sum(col("rev_raw")).over(w))
      .select(col("cohort_date"), col("day_offset"),
        round4eps(col("rev_raw")).as("revenue"),
        round4eps(col("cum_raw")).as("cum_revenue"),
        round4eps(col("cum_raw") / col("cohort_size")).as("ltv_per_user"),
        col("cohort_size"))
      .orderBy(col("cohort_date"), col("day_offset"))
  }

  /** First-order Markov transition matrix over each user's event
    * stream: P(next event type | current type), estimated from every
    * adjacent pair in (ts, event_id) order. The behavioral model
    * behind next-action prediction and funnel leak analysis ("after
    * `view`, 40% `click` but 20% bounce to another `view`").
    * One lead() window per user + one (cur, next)-keyed count; the
    * row-probability normalizer is a window over the #types² result.
    * Probabilities are grid-quantized for cross-engine hash parity. */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byCur = org.apache.spark.sql.expressions.Window.partitionBy(col("cur_type"))
    Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_next", round4eps(col("n_transitions") /
        sum(col("n_transitions")).over(byCur)))
  }

  /** Stationary distribution of the event-type Markov chain — where
    * user behavior settles long-run (the fixed point of
    * [[transitionMatrix]]): x' = xP iterated to convergence.
    *
    * Scale split: the transition COUNTING is the distributed part (one
    * user-keyed window + one keyed aggregate over the corpus); the
    * matrix itself is |types|²-bounded — a behavioral taxonomy, not a
    * corpus dimension — so the power iteration runs on the driver over
    * the collected matrix (guarded: aborts loudly past 10k states
    * rather than silently collecting a corpus-scaling frame). Each
    * matrix cell and each iterate is 1e-6-quantized so both engines
    * walk the SAME trajectory — cross-engine float drift cannot
    * compound over the 25 rounds. */
  def markovStationary(s: SparkSession, dir: String,
      iters: Int = 25): DataFrame = {
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5 + 1e-6) / 1e6
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
      .collect()
    require(counts.length <= 10000,
      s"markovStationary: ${counts.length} transition cells — the state " +
        "space is expected to be a bounded taxonomy; refusing to iterate " +
        "a corpus-scaling matrix on the driver")
    val rowTot = counts.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    val p = counts.map { r =>
      (r.getString(0), r.getString(1),
        q6(r.getLong(2).toDouble / rowTot(r.getString(0))))
    }
    val states = (p.map(_._1) ++ p.map(_._2)).distinct.sorted
    var x = states.map(st => st -> q6(1.0 / states.length)).toMap
    for (_ <- 1 to iters) {
      val nx = states.map { st =>
        st -> q6(p.filter(_._2 == st).map { case (c, _, pr) => x(c) * pr }.sum)
      }.toMap
      x = nx
    }
    import s.implicits._
    states.map(st => (st, x(st))).toSeq
      .toDF("event_type", "stationary_prob")
      .orderBy(col("event_type"))
  }

  /** Expected events until purchase (absorbing-Markov hitting time)
    * from each non-purchase state: t = 1 + Q·t iterated 30 rounds
    * with q6-pinned values, where Q is the empirical transition
    * matrix restricted to transient states — "how far is each
    * engagement state from converting", the funnel readout a
    * transition matrix alone doesn't give.
    *
    * Scale posture: identical to [[markovStationary]] — the corpus
    * collapses to the |types|² transition cells in ONE user-keyed
    * window + count pass; the bounded matrix is collected under the
    * same loud guard and iterated driver-side. The oracle walks the
    * same trajectory via the `__one__` self-loop trick (the constant
    * +1 rides as a virtual state with a probability-1 self-loop, so
    * a recursive CTE needs no left join). */
  def markovAbsorption(s: SparkSession, dir: String,
      absorbing: String = "purchase", iters: Int = 30): DataFrame = {
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5 + 1e-6) / 1e6
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val counts = Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
      .collect()
    require(counts.length <= 10000,
      s"markovAbsorption: ${counts.length} transition cells — the state " +
        "space is expected to be a bounded taxonomy; refusing to iterate " +
        "a corpus-scaling matrix on the driver")
    val rowTot = counts.groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    // transient-to-transient probabilities (row totals INCLUDE the
    // absorbed mass, which is what ends the walk)
    val q = counts
      .filter(r => r.getString(0) != absorbing &&
        r.getString(1) != absorbing)
      .map(r => (r.getString(0), r.getString(1),
        q6(r.getLong(2).toDouble / rowTot(r.getString(0)))))
      .sortBy(e => (e._1, e._2))
    val states = counts.map(_.getString(0)).distinct
      .filter(_ != absorbing).sorted
    var t = states.map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      t = states.map { st =>
        st -> q6(1.0 + q.filter(_._1 == st)
          .map { case (_, nxt, pr) => pr * t(nxt) }.sum)
      }.toMap
    }
    import s.implicits._
    states.map(st => (st, t(st))).toSeq
      .toDF("event_type", "expected_steps")
      .orderBy(col("event_type"))
  }

  /** Multi-window SLO burn-rate alert on the error share of the
    * event stream (budget: 25% errors): for the trailing 1-, 7- and
    * 28-day windows ending at the stream's newest event, the error
    * rate over the budget — the SRE page-worthiness test (a fast burn
    * must show in BOTH a short and a long window to page). One scan
    * with per-window conditional aggregates; every rate is a ratio of
    * exact integer counts. */
  def sloBurn(s: SparkSession, dir: String, budget: Double = 0.25):
      DataFrame = {
    val ev = Tables.events(s, dir)
    val mx = ev.agg(max(to_date(col("ts"))).as("dmax"))
    val aged = ev.crossJoin(broadcast(mx))
      .select(datediff(col("dmax"), to_date(col("ts"))).as("age"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("e"))
    val frames = Seq(("1d", 0), ("7d", 6), ("28d", 27))
    frames.map { case (label, maxAge) =>
      aged.filter(col("age") <= maxAge)
        .agg(count(lit(1)).as("n_events"), sum(col("e")).as("n_errors"))
        .select(lit(label).as("win_label"), col("n_events"), col("n_errors"),
          round4eps(col("n_errors").cast("double") / col("n_events"))
            .as("error_rate"),
          round4eps(col("n_errors").cast("double") / col("n_events") /
            lit(budget)).as("burn_rate"),
          (col("n_errors").cast("double") / col("n_events") >
            lit(budget)).as("breach"))
    }.reduce(_ unionAll _).orderBy(col("win_label"))
  }

  /** Cohort payback period: for each signup-quarter cohort of
    * customers, the first month whose cumulative revenue per customer
    * crosses a fixed acquisition cost — the unit-economics readout
    * next to [[cohortLtv]]'s curve ("WHEN do we break even", not just
    * how much). Cohort = quarter of the customer's first order.
    *
    * Scale shape: customer-grain first-order pass, (cohort × month)
    * rollup, one cohort-keyed cumulative window over the
    * calendar-bounded month frame, then a min-month conditional
    * aggregate. Cumulative revenue is quantized before the threshold
    * compare so the crossing month can't flip on engine ulp. */
  def paybackPeriod(s: SparkSession, dir: String, cac: Double = 30000.0):
      DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstOrder = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_d"))
      .select(col("o_custkey").as("ck"),
        date_trunc("quarter", col("first_d")).cast("date").as("cohort"))
    val rev = Tables.orders(s, dir)
      .join(firstOrder, col("o_custkey") === col("ck"))
      .groupBy(col("cohort"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val size = firstOrder.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_cust"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = rev.join(broadcast(size), "cohort")
      .withColumn("cum_per_cust",
        round4eps(sum(col("rev")).over(w) / col("n_cust")))
      .withColumn("age", (months_between(col("m"), col("cohort")) + 1)
        .cast("long"))
    cum.groupBy(col("cohort"))
      .agg(max(col("n_cust")).as("n_customers"),
        min(when(col("cum_per_cust") >= cac, col("age")))
          .as("payback_months"),
        round4eps(max(col("cum_per_cust"))).as("ltv_to_date"))
      .orderBy(col("cohort"))
  }

  /** Retention-decay curve fit: pool the cohort retention triangle
    * over cohorts into a retention rate per day offset, then fit the
    * shifted power law r(t) = a·t^(−b) by log-log moment regression
    * (offsets ≥ 1) — the decay exponent b is the one-number retention
    * health metric (b near 0 = sticky, b ≥ 1 = leaky bucket).
    *
    * Scale shape: the same two user-keyed rollups as cohortRetention,
    * pooled to the offset-bounded frame (≤ calendar days); the fit is
    * one moment aggregate over that frame with q6-pinned rates. */
  def retentionCurve(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round6eps
    val events = Tables.events(s, dir)
    val cohort = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
      .persistMemDisk
    val sizes = cohort.groupBy(col("cohort_date"))
      .agg(count(lit(1)).as("cs"))
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    // pooled: how many (user, offset) actives vs users AT RISK at that
    // offset (cohorts old enough to have reached it)
    val perOffset = active.join(cohort, "user_id")
      .select(datediff(col("d"), col("cohort_date")).as("t"))
      .filter(col("t") >= 1)
      .groupBy(col("t")).agg(count(lit(1)).as("n_active"))
    val maxD = events.agg(max(to_date(col("ts"))).as("dmax"))
    val atRisk = sizes.crossJoin(broadcast(maxD))
      .select(col("cs"),
        datediff(col("dmax"), col("cohort_date")).as("reach"))
    // risk set per offset t: users in cohorts with reach >= t — a
    // bounded (offset × cohort) comparison via a small cross join
    val offsets = perOffset.select(col("t"))
    val risk = offsets.crossJoin(broadcast(atRisk))
      .filter(col("reach") >= col("t"))
      .groupBy(col("t")).agg(sum(col("cs")).as("n_risk"))
    val rates = perOffset.join(risk, "t")
      .select(col("t"),
        round6eps(col("n_active").cast("double") / col("n_risk"))
          .as("r"))
      .filter(col("r") > 0)
    val mom = rates.agg(count(lit(1)).cast("double").as("n"),
      sum(log(col("t").cast("double"))).as("sx"),
      sum(log(col("r"))).as("sy"),
      sum(log(col("t").cast("double")) * log(col("t").cast("double")))
        .as("sxx"),
      sum(log(col("t").cast("double")) * log(col("r"))).as("sxy"))
    val slope = (col("sxy") - col("sx") * col("sy") / col("n")) /
      (col("sxx") - col("sx") * col("sx") / col("n"))
    mom.select(col("n").cast("long").as("n_offsets"),
      round4eps(-slope).as("decay_exponent"),
      round4eps(exp((col("sy") - slope * col("sx")) / col("n")))
        .as("day1_rate_fit"))
  }

  /** Delta-method standard error for the ratio metric revenue-per-
    * event (the experimentation-platform correction: a ratio of sums
    * over users is NOT a mean of per-user ratios, and its naive SE is
    * wrong): SE²(X̄/Ȳ) ≈ (μx/μy)²(σx²/(nμx²) + σy²/(nμy²) −
    * 2·cov/(nμxμy)) from one user-grain rollup + one moment pass —
    * the user is the randomization unit, so all moments are over
    * user-level (revenue, events) pairs. */
  def deltaMethodSe(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(round4eps(sum(when(col("event_type") === "purchase",
        coalesce(col("value"), lit(0.0))).otherwise(0.0))).as("x"),
        count(lit(1)).cast("double").as("y"))
    val m = u.agg(count(lit(1)).cast("double").as("n"),
      avg(col("x")).as("mx"), avg(col("y")).as("my"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val vx = col("sxx") / col("n") - col("mx") * col("mx")
    val vy = col("syy") / col("n") - col("my") * col("my")
    val cxy = col("sxy") / col("n") - col("mx") * col("my")
    val ratio = col("mx") / col("my")
    val se2 = ratio * ratio * (vx / (col("n") * col("mx") * col("mx")) +
      vy / (col("n") * col("my") * col("my")) -
      lit(2.0) * cxy / (col("n") * col("mx") * col("my")))
    m.select(col("n").cast("long").as("n_users"),
      round4eps(ratio).as("revenue_per_event"),
      round4eps(sqrt(se2)).as("delta_se"),
      round4eps(sqrt(vx / col("n")) / col("my")).as("naive_se"))
  }

  /** Cross-correlation between two event types' daily counts at lags
    * −3..+3 — "do errors lead or lag purchases?" A positive peak at
    * negative lag means series X moves first. Pearson correlation on
    * the calendar-aligned join (y shifted by k days); both daily
    * frames are calendar-bounded, so every join and corr here runs on
    * constant-size inputs — only the two daily rollups scan the
    * corpus. */
  def crossCorrDaily(s: SparkSession, dir: String,
      typeX: String = "purchase", typeY: String = "error",
      maxLag: Int = 3): DataFrame = {
    def daily(t: String) = Tables.events(s, dir)
      .filter(col("event_type") === t)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val dx = daily(typeX).persistMemDisk
    val dy = daily(typeY).persistMemDisk
    val perLag = (-maxLag to maxLag).map { k =>
      dx.select(col("d"), col("n").as("x"))
        .join(dy.select(date_sub(col("d"), k).as("d"), col("n").as("y")), "d")
        .agg(round4eps(corr(col("x").cast("double"), col("y").cast("double"))).as("xcorr"),
          count(lit(1)).as("n_days"))
        .select(lit(k).as("lag"), col("xcorr"), col("n_days"))
    }
    perLag.reduce(_ unionByName _).orderBy(col("lag"))
  }

  /** Time-to-convert percentiles between funnel stages — the latency
    * companion to [[funnelStages]] (counts say WHETHER users convert;
    * this says HOW FAST). Same earliest-path semantics: each user's
    * first view, first click AFTER that view, first purchase AFTER
    * that click; deltas are integer seconds, so the per-stage
    * percentile interpolates identical inputs in both engines.
    * Everything is user-keyed mins then one aggregate per stage pair —
    * no windows, no self-joins on the raw stream. The gate uses the
    * EXACT percentile (it buffers the user-grain deltas in the single
    * summary group); at 100 TB swap in approx_percentile or the
    * [[graft.functions.HashReservoir]] sketch — same output schema,
    * mergeable partials. */
  def funnelLatency(s: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val events = Tables.events(s, dir)
    def firstAfter(stage: String, prev: DataFrame, prevTs: String) =
      events.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col(prevTs)), "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy(col("user_id"), col(prevTs))
        .agg(min(col("ts")).as(s"ts_$stage"))
    val v = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_view"))
      .persistMemDisk
    val c = firstAfter(stages(1), v, "ts_view")
      .persistMemDisk
    val p = firstAfter(stages(2), c, s"ts_${stages(1)}")
    def summary(df: DataFrame, from: String, to: String) =
      df.select((unix_timestamp(col(s"ts_$to")) -
          unix_timestamp(col(s"ts_$from"))).as("delta"))
        .agg(count(lit(1)).as("n_users"),
          round4eps(expr("percentile(delta, 0.5)")).as("p50_secs"),
          round4eps(expr("percentile(delta, 0.9)")).as("p90_secs"))
        .select(lit(s"${from}_to_$to").as("stage_pair"),
          col("n_users"), col("p50_secs"), col("p90_secs"))
    summary(c, "view", stages(1))
      .unionByName(summary(p, stages(1), stages(2)))
      .orderBy(col("stage_pair"))
  }

  /** Session duration percentiles per day over MULTI-EVENT sessions —
    * the engagement-depth companion to [[bounceRate]] (bounces have
    * duration 0 by definition and are ~95% of sessions here; including
    * them would pin every quantile at 0 — the degenerate report).
    * Duration is last−first event seconds within the 30-min-gap
    * session (truncated-second diffs — integer inputs, so both engines
    * interpolate identically). User-keyed windows, then a
    * calendar-bounded day rollup; per-day groups buffer that day's
    * sessions for the exact percentile — the 100 TB path swaps in
    * approx_percentile / [[graft.functions.HashReservoir]] per day. */
  def sessionDurations(s: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val isNew = when(col("prev_ts").isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds,
      1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", isNew)
      .withColumn("seq", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("seq"))
      .agg(min(col("ts")).as("t0"), count(lit(1)).as("n"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration"))
      .filter(col("n") > 1)
      .groupBy(to_date(col("t0")).as("day"))
      .agg(count(lit(1)).as("n_multi"),
        round4eps(expr("percentile(duration, 0.5)")).as("p50_secs"),
        round4eps(expr("percentile(duration, 0.9)")).as("p90_secs"))
      .orderBy(col("day"))
  }

  /** Weekly growth accounting — the canonical actives decomposition
    * (new + retained + resurrected = actives; churned = last week's
    * actives − retained): the report that distinguishes "growth from
    * acquisition" from "growth from win-back" that a bare actives
    * curve hides. One (week, user) presence frame; first-seen week is
    * a user-keyed min, the previous-active week a user-keyed lag; the
    * churn column is a calendar-bounded lag over the weekly rollup. */
  def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Tables.events(s, dir)
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        col("user_id"))
      .distinct()
      .persistMemDisk
    val fw = wk.groupBy(col("user_id")).agg(min(col("week")).as("first_week"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("week"))
    val flagged = wk.join(fw, "user_id")
      .withColumn("prev_active", lag(col("week"), 1).over(byUser))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("week") === col("first_week"), 1L).otherwise(0L))
          .as("new_users"),
        sum(when(col("week") > col("first_week") &&
          col("prev_active") === date_sub(col("week"), 7), 1L).otherwise(0L))
          .as("retained"),
        sum(when(col("week") > col("first_week") &&
          (col("prev_active").isNull ||
            col("prev_active") < date_sub(col("week"), 7)), 1L).otherwise(0L))
          .as("resurrected"))
    val wWeek = Window.orderBy(col("week")) // weeks-bounded frame
    flagged
      .withColumn("churned",
        coalesce(lag(col("n_active"), 1).over(wWeek) - col("retained"),
          lit(0L)))
      .orderBy(col("week"))
  }

  /** DAU/WAU stickiness per day — how much of the weekly audience
    * shows up daily (the engagement-quality ratio; 1.0 = everyone
    * daily, 1/7 = each user once a week). WAU is the trailing-7-day
    * DISTINCT count via a (user, day) presence frame joined to the
    * day spine (×7 linear fan-out, then a day-keyed distinct) — never
    * a sliding COUNT DISTINCT window, which Spark can't partial-merge. */
  def stickiness(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .persistMemDisk
    val days = ud.select(col("d")).distinct().select(col("d").as("day"))
    val wau = days.join(ud,
        col("d") <= col("day") && col("d") > date_sub(col("day"), 7))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round4eps(col("dau").cast("double") / col("wau")).as("stickiness"))
      .orderBy(col("day"))
  }

  /** One-way ANOVA across ALL event types' value distributions:
    * F = (SSB/(k−1))/(SSW/(n−k)) with η² = SSB/SST as the effect size
    * — the k-group generalization of the two-sample gates (t/z, MW,
    * Cohen's d). Everything reduces to per-group moment aggregates
    * (count, mean, Σx²) — one keyed pass, then arithmetic over k
    * rows. */
  def anovaTypes(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("gn"), avg(col("value")).as("mu"),
        sum(col("value") * col("value")).as("ss"))
    val tot = g.agg((sum(col("mu") * col("gn")) / sum(col("gn"))).as("gm"))
    g.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("kg"), sum(col("gn")).as("tn"),
        sum(col("gn") * (col("mu") - col("gm")) * (col("mu") - col("gm")))
          .as("ssb"),
        sum(col("ss") - col("gn") * col("mu") * col("mu")).as("ssw"))
      .select(col("kg").as("k"), col("tn").as("n"),
        round4eps((col("ssb") / (col("kg") - 1)) /
          (col("ssw") / (col("tn") - col("kg")))).as("f_stat"),
        round4eps(col("ssb") / (col("ssb") + col("ssw"))).as("eta_sq"))
  }

  /** Minimum detectable effect for a two-sample mean test at
    * α = 0.05 (two-sided) and 80% power, given the CURRENT sample
    * sizes and pooled variance — the pre-registration number every
    * experiment review asks for ("could this test even see a 5%
    * move?"). MDE = (z_{α/2}+z_{power})·s_p·√(1/n_a+1/n_b); the z
    * constants are fixed quantiles, everything else is one moment
    * aggregate per arm. */
  def minDetectableEffect(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click",
      zAlpha: Double = 1.96, zPower: Double = 0.8416): DataFrame = {
    val m = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), var_samp(col("value")).as("v"),
        avg(col("value")).as("mu"))
    val a = m.filter(col("event_type") === typeA)
      .select(col("n").as("na"), col("v").as("va"), col("mu").as("mua"))
    val b = m.filter(col("event_type") === typeB)
      .select(col("n").as("nb"), col("v").as("vb"))
    val sp = sqrt(((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb")) /
      (col("na") + col("nb") - 2))
    val mde = lit(zAlpha + zPower) * sp *
      sqrt(lit(1.0) / col("na") + lit(1.0) / col("nb"))
    a.crossJoin(broadcast(b))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round4eps(sp).as("pooled_sd"),
        round4eps(mde).as("mde_abs"),
        round4eps(mde / col("mua")).as("mde_rel"))
  }

  /** Sample-ratio-mismatch check for a deterministic 50/50 hash split:
    * users land in arms by md5(user_id) % 2, and the z-statistic tests
    * the observed ratio against the designed one — the first thing an
    * experimentation platform alerts on (an SRM means the assignment
    * or logging is broken and every downstream readout is invalid).
    * One distinct-user pass; the z is closed-form in exact counts. */
  def sampleRatioCheck(s: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .select((conv(substring(md5(col("user_id").cast("string")), 1, 15),
        16, 10).cast("long") % 2).as("arm"))
    arms.agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
        count(lit(1)).as("n"))
      .select(col("na").as("n_a"), (col("n") - col("na")).as("n_b"),
        round4eps((col("na") - col("n") / lit(2.0)) /
          sqrt(col("n") / lit(4.0))).as("srm_z"))
  }

  /** CUPED variance reduction (Deng et al. 2013): adjust each user's
    * post-period metric by their PRE-period covariate,
    * Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) — the standard trick
    * that shrinks experiment confidence intervals for free. Reports θ
    * and the achieved variance reduction. Two user-keyed rollups, one
    * join, two moment aggregates — no iteration, no resampling. */
  def cupedAdjustment(s: SparkSession, dir: String,
      cutover: String = "2024-01-16"): DataFrame = {
    val pre = Tables.events(s, dir)
      .filter(col("ts") < lit(cutover).cast("timestamp"))
      .groupBy(col("user_id")).agg(sum(col("value")).as("x"))
    val post = Tables.events(s, dir)
      .filter(col("ts") >= lit(cutover).cast("timestamp"))
      .groupBy(col("user_id")).agg(sum(col("value")).as("y"))
    val j = pre.join(post, "user_id")
      .persistMemDisk
    val st = j.agg(covar_samp(col("x"), col("y")).as("cxy"),
      var_samp(col("x")).as("vx"), var_samp(col("y")).as("vy"),
      avg(col("x")).as("mx"), count(lit(1)).as("n"))
    j.crossJoin(broadcast(st))
      .agg(max(col("n")).as("n_users"),
        round4eps(max(col("cxy") / col("vx"))).as("theta"),
        round4eps(lit(1.0) -
          var_samp(col("y") - (col("cxy") / col("vx")) *
            (col("x") - col("mx"))) / max(col("vy"))).as("var_reduction"))
  }

  /** Cohen's d effect size between two event types' value
    * distributions — the magnitude companion to the Mann-Whitney /
    * z-test significance gates (a tiny p with d ≈ 0 is a big-sample
    * artifact, not a finding). Pooled-SD form; two single-pass moment
    * aggregates, no row pairing. */
  def cohensD(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    val m = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mu"),
        var_samp(col("value")).as("v"))
    val a = m.filter(col("event_type") === typeA)
      .select(col("n").as("na"), col("mu").as("ma"), col("v").as("va"))
    val b = m.filter(col("event_type") === typeB)
      .select(col("n").as("nb"), col("mu").as("mb"), col("v").as("vb"))
    a.crossJoin(broadcast(b))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round4eps((col("ma") - col("mb")) /
          sqrt(((col("na") - 1) * col("va") + (col("nb") - 1) * col("vb")) /
            (col("na") + col("nb") - 2))).as("cohens_d"))
  }

  /** Difference-in-differences estimate between a treated and a
    * control event series around a cutover date: DiD = (post−pre of
    * treated) − (post−pre of control), with the unpooled-variance
    * standard error — the first-line causal read on "did the launch
    * move purchases beyond the ambient trend views also show". The
    * corpus collapses to (type, day) means in one pass; the estimate
    * is arithmetic over FOUR aggregate rows. */
  def diffInDiff(s: SparkSession, dir: String,
      treated: String = "purchase", control: String = "view",
      cutover: String = "2024-01-16"): DataFrame = {
    val m = Tables.events(s, dir)
      .filter(col("event_type").isin(treated, control))
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("period",
        when(col("d") >= lit(cutover).cast("date"), "post").otherwise("pre"))
      .groupBy(col("event_type"), col("period"))
      .agg(avg(col("n")).as("mu"), count(lit(1)).as("nd"),
        var_samp(col("n")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    def q4(x: Double): Double = math.floor(x * 1e4 + 0.5 + 1e-6) / 1e4
    val (pa, qa) = (m((treated, "post")), m((treated, "pre")))
    val (pb, qb) = (m((control, "post")), m((control, "pre")))
    val est = (pa._1 - qa._1) - (pb._1 - qb._1)
    val se = math.sqrt(pa._3 / pa._2 + qa._3 / qa._2 +
      pb._3 / pb._2 + qb._3 / qb._2)
    import s.implicits._
    Seq((q4(est), q4(se), pa._2 + qa._2 + pb._2 + qb._2))
      .toDF("did_estimate", "se", "n_days")
  }

  /** Entropy rate of the event-type process: conditional entropy
    * H(next | current) vs the marginal H(next) — their gap is the
    * information the previous event carries about the next (≈ 0 means
    * the sequence is memoryless and the [[transitionMatrix]] buys
    * nothing over base rates; the model-selection check run BEFORE
    * fitting sequence models). Same user-keyed transition counting as
    * the Markov gates; all entropies are arithmetic over the
    * |types|²-bounded count frame. */
  def entropyRate(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .withColumn("nxt", lead(col("event_type"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .persistMemDisk
    val t = c.agg(sum(col("n")).as("tn"))
    val rowt = c.groupBy(col("cur")).agg(sum(col("n")).as("rn"))
    val marg = c.groupBy(col("nxt")).agg(sum(col("n")).as("mn"))
      .crossJoin(broadcast(t))
      .agg(round4eps(-sum((col("mn").cast("double") / col("tn")) *
        log(col("mn").cast("double") / col("tn")))).as("marginal_entropy"))
    c.join(broadcast(rowt), "cur").crossJoin(broadcast(t))
      .agg(round4eps(-sum((col("n").cast("double") / col("tn")) *
        log(col("n").cast("double") / col("rn")))).as("cond_entropy"),
        max(col("tn")).as("n_transitions"))
      .crossJoin(broadcast(marg))
      .select(col("cond_entropy"), col("marginal_entropy"),
        col("n_transitions"))
  }

  /** Event-type co-occurrence PMI within sessions — which behaviors
    * cluster in the same visit (positive PMI) vs repel (negative):
    * PMI(a,b) = ln(N·n_ab / (n_a·n_b)) over session type-SETS (presence,
    * not multiplicity — the association measure, immune to event spam).
    * Sessions are the 30-min-gap definition shared with
    * [[bounceRate]]/[[Windows.sessionize]].
    *
    * Scale shape: sessionization is user-keyed windows; the pair join
    * is keyed on (user, session) and each side is the session's
    * DISTINCT type set — per-session output is ≤ C(|types|,2), a
    * taxonomy bound, so the join output is sessions × a constant, and
    * the final PMI table is |types|²-bounded. */
  def sessionCooccurrence(s: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val isNew = when(col("prev_ts").isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds,
      1).otherwise(0)
    val st = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", isNew)
      .withColumn("seq", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("seq"), col("event_type"))
      .distinct()
      .persistMemDisk
    val nSessions = st.select(col("user_id"), col("seq")).distinct()
      .agg(count(lit(1)).cast("double").as("ns"))
    val singles = st.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val pairs = st.select(col("user_id"), col("seq"), col("event_type").as("type_a"))
      .join(st.select(col("user_id"), col("seq"), col("event_type").as("type_b")),
        Seq("user_id", "seq"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("cab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"),
        col("c").as("ca"))), "type_a")
      .join(broadcast(singles.select(col("event_type").as("type_b"),
        col("c").as("cb"))), "type_b")
      .crossJoin(broadcast(nSessions))
      .select(col("type_a"), col("type_b"),
        col("cab").as("n_sessions_both"),
        round4eps(log(col("cab") * col("ns") / (col("ca") * col("cb"))))
          .as("pmi"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Top user journeys: each user's first `k` events (in (ts,
    * event_id) order) joined into a `>`-separated path, ranked by how
    * many users share it — the "what do people actually do" report.
    * The per-user collect is one grouped sort_array over structs (no
    * window pre-pass), and the top-N is a TakeOrdered with the path
    * string as tie-break so the cutoff set is deterministic. */
  def topPaths(s: SparkSession, dir: String, k: Int = 5, topN: Int = 10): DataFrame = {
    val paths = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("evs"))
      .select(concat_ws(">",
        slice(transform(col("evs"), e => e.getField("event_type")), 1, k)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
    paths.orderBy(col("n_users").desc, col("path")).limit(topN)
      .select(row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_users").desc, col("path"))).as("rank"),
        col("path"), col("n_users"))
  }

  /** Per-user monthly activity bitmap: day-of-month presence packed
    * into one BIGINT via `bit_or(1 << (day-1))` — the roaring-bitmap
    * idea at word width, the standard trick for cheap
    * retention/streak analytics (set ops between periods become
    * bitwise AND/OR on 8-byte values instead of day-grain joins;
    * active-day counts become popcounts). One (user, month)-keyed
    * aggregate whose partials OR-combine map-side — at 100 TB the
    * shuffle carries one long per user-month, not one row per event. */
  def activityBitmap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), trunc(col("ts"), "month").as("month"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), dayofmonth(ts) - 1)"))
        .as("days_bitmap"))
      .select(col("user_id"), col("month"), col("days_bitmap"),
        bit_count(col("days_bitmap")).cast("long").as("n_active_days"))

  /** Market-basket association rules (Agrawal & Srikant's Apriori at
    * the 2-itemset level): parts co-purchased within an order, scored
    * by support, confidence and lift, top-k by lift above a minimum
    * co-occurrence count. The canonical affinity-mining query every
    * retail warehouse runs.
    *
    * Scale posture: the pair enumeration is an order-keyed self-join —
    * quadratic only in ORDER size (baskets are small and bounded: ≤7
    * lines here; a size guard would cap pathological baskets), so pair
    * volume is linear in lineitems. Both metric joins are keyed on
    * part id against part-cardinality aggregates, and the top-k is a
    * TakeOrdered — no global sort, no part×part blowup (pairs below
    * minCount never reach the joins). */
  def basketRules(s: SparkSession, dir: String,
      minCount: Long = 3, topK: Int = 20): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .persistMemDisk
    val nOrders = l.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val singles = l.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_one"))
    val pairs = l.select(col("l_orderkey"), col("l_partkey").as("pa"))
      .join(l.select(col("l_orderkey"), col("l_partkey").as("pb")), "l_orderkey")
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minCount)
    pairs
      .join(singles.select(col("l_partkey").as("pa"), col("n_one").as("n_a")), "pa")
      .join(singles.select(col("l_partkey").as("pb"), col("n_one").as("n_b")), "pb")
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("n_both"),
        round4eps(col("n_both").cast("double") / col("n_orders")).as("support"),
        round4eps(col("n_both").cast("double") / col("n_a")).as("confidence"),
        round4eps(col("n_both").cast("double") * col("n_orders")
          / (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb")).limit(topK)
  }

  /** Ehrenberg's double-jeopardy screen: per brand, market
    * penetration (buyer share) and average purchase frequency among
    * buyers, with frequency regressed on ln(penetration) across
    * brands — small brands are punished twice (fewer buyers who also
    * buy less often), so a brand sitting far ABOVE the fitted line is
    * a genuine loyalty outlier, not just big. The marketing-science
    * null model every "loyal niche brand" claim must beat.
    *
    * Scale shape: one (brand × customer)-keyed rollup (map-side
    * combined), one 25-row brand frame, closed-form simple OLS on
    * it. */
  def doubleJeopardy(s: SparkSession, dir: String): DataFrame = {
    val bo = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("p_brand"), col("o_custkey"), col("o_orderkey"))
      .distinct()
      .persistMemDisk
    val total = Tables.orders(s, dir)
      .agg(countDistinct(col("o_custkey")).as("n_cust"))
    val perBrand = bo.groupBy(col("p_brand"))
      .agg(countDistinct(col("o_custkey")).as("buyers"),
        count(lit(1)).as("n_brand_orders"))
      .crossJoin(broadcast(total))
      .select(col("p_brand"),
        (col("buyers").cast("double") / col("n_cust")).as("pen"),
        (col("n_brand_orders").cast("double") / col("buyers")).as("w"))
      .persistMemDisk
    val fit = perBrand.agg(count(lit(1)).cast("double").as("n"),
        sum(log(col("pen"))).as("sx"), sum(col("w")).as("sy"),
        sum(log(col("pen")) * log(col("pen"))).as("sxx"),
        sum(log(col("pen")) * col("w")).as("sxy"))
      .select(
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (col("sxx") - col("sx") * col("sx") / col("n"))).as("slope"),
        (col("sy") / col("n") -
          (col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n")) *
            (col("sx") / col("n"))).as("icept"))
    perBrand.crossJoin(broadcast(fit))
      .select(col("p_brand"),
        round4eps(col("pen")).as("penetration"),
        round4eps(col("w")).as("avg_freq"),
        round4eps(col("icept") + col("slope") * log(col("pen")))
          .as("expected_freq"),
        round4eps(col("w") -
          (col("icept") + col("slope") * log(col("pen"))))
          .as("loyalty_gap"))
      .orderBy(col("p_brand"))
  }

  /** Level-3 association rules: brand triples co-purchased within an
    * order, with 3-way lift P(abc)/(P(a)P(b)P(c)) — the step past the
    * gated pair rules (basketRules) where independence-baseline
    * corrections actually start to matter. Triple enumeration is the
    * within-basket 3-way self-join: baskets are brand-bounded (≤ ~7
    * distinct brands per order), so candidates are C(7,3)-per-order
    * LINEAR in orders — the reason a-priori's candidate pruning is a
    * no-op at this basket shape and the direct join is the right
    * plan.
    *
    * Scale shape: one distinct (order, brand) projection, the
    * bounded-fanout triple join keyed on orderkey, one triple-keyed
    * count — all fact-linear with map-side combine. */
  def tripleRules(s: SparkSession, dir: String,
      minCount: Long = 5, topK: Int = 20): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .persistMemDisk
    val nOrders = l.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val singles = l.groupBy(col("p_brand")).agg(count(lit(1)).as("n_one"))
    val triples = l.select(col("l_orderkey"), col("p_brand").as("ba"))
      .join(l.select(col("l_orderkey"), col("p_brand").as("bb")),
        "l_orderkey")
      .filter(col("ba") < col("bb"))
      .join(l.select(col("l_orderkey"), col("p_brand").as("bc")),
        "l_orderkey")
      .filter(col("bb") < col("bc"))
      .groupBy(col("ba"), col("bb"), col("bc"))
      .agg(count(lit(1)).as("n_all3"))
      .filter(col("n_all3") >= minCount)
    triples
      .join(broadcast(singles.select(col("p_brand").as("ba"),
        col("n_one").as("n_a"))), "ba")
      .join(broadcast(singles.select(col("p_brand").as("bb"),
        col("n_one").as("n_b"))), "bb")
      .join(broadcast(singles.select(col("p_brand").as("bc"),
        col("n_one").as("n_c"))), "bc")
      .crossJoin(broadcast(nOrders))
      .select(col("ba").as("brand_a"), col("bb").as("brand_b"),
        col("bc").as("brand_c"), col("n_all3"),
        round4eps(col("n_all3").cast("double") / col("n_orders"))
          .as("support"),
        round4eps(col("n_all3").cast("double") * col("n_orders") *
          col("n_orders") /
          (col("n_a") * col("n_b") * col("n_c"))).as("lift3"))
      .orderBy(col("lift3").desc, col("brand_a"), col("brand_b"),
        col("brand_c"))
      .limit(topK)
  }

  /** Multi-touch conversion attribution: each purchase's credit split
    * across the view/click touchpoints the same user produced in the
    * preceding `lookbackSec` window (default 7 days — on this corpus's
    * event density that yields ~1.8k multi-touch conversions, so the
    * three models are actually differentiated), under the standard models —
    * first-touch, last-touch (100% to one touchpoint), and linear
    * (1/n each). The marketing-analytics query behind every
    * channel-ROI dashboard.
    *
    * Scale posture: conversion–touchpoint candidate pairs come from
    * [[TemporalJoins.rangeJoin]] — a (user, time-bucket) EQUI-join
    * probing exactly two buckets per conversion, never a user-keyed
    * cross product — so pair volume tracks actual temporal
    * co-occurrence. The model assignments are per-conversion window
    * functions over those pairs (partitioned by conversion id,
    * deterministic touch_id tie-break), and the final rollup is a
    * channel-cardinality aggregate. */
  def attribution(s: SparkSession, dir: String,
      lookbackSec: Long = 604800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"), col("ts"))
    val touch = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts"))
    val pairs = TemporalJoins.rangeJoin(conv, touch, Seq("user_id"),
        "ts", "ts", lookbackSec)
      .filter(col("ts_r") < col("ts")) // strictly before the conversion
      .select(col("conv_id"), col("channel"), col("ts_r"), col("touch_id"))
    val wLast = Window.partitionBy(col("conv_id"))
      .orderBy(col("ts_r").desc, col("touch_id").desc)
    val wFirst = Window.partitionBy(col("conv_id"))
      .orderBy(col("ts_r").asc, col("touch_id").asc)
    val wAll = Window.partitionBy(col("conv_id"))
    pairs
      .withColumn("rn_last", row_number().over(wLast))
      .withColumn("rn_first", row_number().over(wFirst))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy(col("channel"))
      .agg(
        sum(when(col("rn_first") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("rn_last") === 1, 1L).otherwise(0L)).as("last_touch"),
        round4eps(sum(lit(1.0) / col("n"))).as("linear_credit"),
        count(lit(1)).as("n_touchpoints"))
      .orderBy(col("channel"))
  }

  /** Daily peak session concurrency — the distributed sweep-line over
    * intervals (max-overlap), the capacity-planning query behind "how
    * many sessions were open at once": sessions (gap-based, same
    * definition as [[graft.operators.Windows sessionize]]) become
    * +1/−1 boundary events; the running sum of deltas in time order is
    * the live concurrency, and its per-day max (with the first instant
    * achieving it) is the answer.
    *
    * Scale shape — the naive formulation is ONE global ORDER BY ts
    * over every boundary (single-partition sort of a corpus-scaling
    * frame). This runs the sweep per DAY instead: a day-keyed window
    * orders only that day's boundaries, and cross-midnight sessions
    * are handled by a carry-in count per day (sessions that started
    * before the day and end on/after it), computed by exploding each
    * session's covered-day range (bounded: gap-based sessions span
    * few days) into a day-keyed aggregate — the same
    * partition-then-correct decomposition as sequencePack's two-phase
    * prefix sum. Tie discipline: at an equal instant, session STARTS
    * process before ends (closed intervals — a session is live at its
    * last event, and a single-event session still counts at its one
    * instant); user_id breaks remaining ties. */
  def peakConcurrency(s: SparkSession, dir: String,
      gapSec: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
        1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(unix_timestamp(min(col("ts"))).as("t0"),
        unix_timestamp(max(col("ts"))).as("t1"))
      .persistMemDisk
    val bounds = sess
      .select(col("user_id"), col("t0").as("t"), lit(1).as("delta"))
      .unionByName(sess
        .select(col("user_id"), col("t1").as("t"), lit(-1).as("delta")))
      .withColumn("d", to_date(from_unixtime(col("t"))))
    // carry-in: a session [t0, t1] is open at the start of every day
    // AFTER its start day up to and including its end day
    // guard BEFORE sequence(): Spark's sequence(a, b) DESCENDS when
    // a > b, so an unguarded same-day session would fabricate two
    // carry days instead of none
    val carry = sess
      .filter(to_date(from_unixtime(col("t1"))) >
        to_date(from_unixtime(col("t0"))))
      .select(explode(sequence(
        date_add(to_date(from_unixtime(col("t0"))), 1),
        to_date(from_unixtime(col("t1"))))).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("carry_in"))
    // +1 before −1 at an equal instant (delta desc): closed-interval
    // semantics, so a single-event session still counts at its instant
    val byDay = Window.partitionBy(col("d"))
      .orderBy(col("t"), col("delta").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds
      .withColumn("run", sum(col("delta")).over(byDay))
      .join(broadcast(carry), Seq("d"), "left")
      .select(col("d"),
        (col("run") + coalesce(col("carry_in"), lit(0L))).as("conc"),
        col("t"))
      .groupBy(col("d"))
      .agg(max(struct(col("conc"), (-col("t")).as("nt"))).as("m"))
      .select(col("d"), col("m.conc").cast("long").as("peak"),
        (-col("m.nt")).as("peak_at"))
      .orderBy(col("d"))
  }

  /** SCD type-2 history build from an event stream — the
    * gaps-and-islands pattern every warehouse dimension loader runs:
    * each user's per-event tier (value bucketed by `tierWidth`) is
    * collapsed into validity intervals [valid_from, valid_to) with
    * valid_to = the next interval's start (NULL while current) —
    * i.e. the effective-dated dimension row a MERGE-based SCD2 loader
    * would maintain, derived set-based in one pass instead of
    * row-at-a-time upserts.
    *
    * Plan: lag-per-user marks tier changes, a running sum of change
    * marks numbers each run (the island id), one aggregate collapses
    * runs to intervals, and lead-per-user closes each interval with
    * its successor's start. Every window and aggregate is keyed by
    * user_id — the corpus distributes on the natural entity key, no
    * global ordering anywhere. Timestamps surface as epoch seconds
    * (engine-portable; the oracle replays with epoch()). Determinism:
    * (ts, event_id) tie-break, and the tier derives from a pure
    * bucketing of value. */
  def tierHistory(s: SparkSession, dir: String,
      tierWidth: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val tiered = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / tierWidth).cast("int").as("tier"))
    val runs = tiered
      .withColumn("chg",
        when(lag(col("tier"), 1).over(byUser).isNull ||
          lag(col("tier"), 1).over(byUser) =!= col("tier"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs.groupBy(col("user_id"), col("run_id"), col("tier"))
      .agg(min(struct(col("ts"), col("event_id"))).as("first"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("run_id"), col("tier"), col("n_events"),
        unix_timestamp(col("first.ts")).as("valid_from"))
    val byRun = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    intervals
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col("user_id"), col("run_id"), col("tier"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("run_id"))
  }

  /** Daily audience overlap between two event types — "how much of the
    * purchase audience also hit errors that day": per day the distinct
    * user sets doing each type, their intersection, and the Jaccard.
    * One (day, user)-keyed aggregate collapses events to presence
    * flags (the same presence-bitmap economics as activityBitmap —
    * the shuffle carries two bits per user-day), then a day-grain
    * rollup; set intersection without ever joining user sets. */
  def dailyTypeOverlap(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "error"): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"), col("user_id"))
      .agg(max(when(col("event_type") === typeA, 1L).otherwise(0L)).as("ha"),
        max(when(col("event_type") === typeB, 1L).otherwise(0L)).as("hb"))
      .groupBy(col("d"))
      .agg(sum(col("ha")).as("n_a"), sum(col("hb")).as("n_b"),
        sum(col("ha") * col("hb")).as("n_both"))
      .select(col("d"), col("n_a"), col("n_b"), col("n_both"),
        round4eps(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both"))).as("jaccard"))
      .orderBy(col("d"))

  /** Weekly churn — per ISO week: active users, how many returned the
    * NEXT week, and the churn rate (1 − retained/active). The
    * complement of cohort retention every subscription dashboard leads
    * with. One (week, user) de-dup collapse, then the week-over-week
    * comparison is a self-join of the (weeks × users)-bounded presence
    * frame on (user, week+1) — never the raw event stream twice. The
    * last observed week has no successor and is excluded (its churn is
    * not yet knowable — the right-censoring trap naive churn queries
    * fall into). */
  def weeklyChurn(s: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(s, dir)
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        col("user_id"))
      .distinct()
      .persistMemDisk
    val next = wk.select(date_sub(col("week"), 7).as("week"),
      col("user_id").as("u2"))
    val lastWeek = wk.agg(max(col("week")).as("maxw"))
    wk.join(next, wk("week") === next("week") &&
        col("user_id") === col("u2"), "left")
      .groupBy(wk("week").as("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("u2").isNotNull, 1L).otherwise(0L)).as("n_retained"))
      .crossJoin(broadcast(lastWeek))
      .filter(col("week") < col("maxw"))
      .select(col("week"), col("n_active"), col("n_retained"),
        round4eps(lit(1.0) - col("n_retained").cast("double") /
          col("n_active")).as("churn_rate"))
      .orderBy(col("week"))
  }

  /** Chi-square test of independence between event type and day of
    * week, with Cramér's V effect size. One fact-scan count keyed on
    * (type, dow) — the observed table is bounded by |types| × 7 cells,
    * so expected counts, the statistic and V all compute on a frame
    * that never scales with the corpus (row/column margins are
    * re-aggregates of the cells, not re-scans). All inputs to the
    * statistic are exact integer counts; only the final sums over
    * ≤ 7·|types| double terms need the cross-engine rounding pin. */
  def chiSquareTypeDow(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).cast("double").as("o"))
      .persistMemDisk
    val rt = obs.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val ct = obs.groupBy(col("dow")).agg(sum(col("o")).as("c"))
    val n = obs.agg(sum(col("o")).as("n"))
    val e = col("r") * col("c") / col("n")
    obs.join(broadcast(rt), "event_type")
      .join(broadcast(ct), "dow")
      .crossJoin(broadcast(n))
      .agg(
        round4eps(sum((col("o") - e) * (col("o") - e) / e)).as("chi2raw"),
        ((countDistinct(col("event_type")) - 1) *
          (countDistinct(col("dow")) - 1)).as("dof"),
        round4eps(sqrt(sum((col("o") - e) * (col("o") - e) / e) /
          (max(col("n")) * least(countDistinct(col("event_type")) - 1,
            countDistinct(col("dow")) - 1)))).as("cramers_v"),
        max(col("n")).cast("long").as("n"))
      .select(col("chi2raw").as("chi2"), col("dof"), col("cramers_v"), col("n"))
  }

  /** Mann-Whitney U (rank-sum) test between two event types' value
    * distributions, with average-rank tie handling and the
    * tie-corrected normal approximation.
    *
    * Scale posture: ranks are NOT computed with a global row window.
    * The sample collapses to one row per distinct value first (values
    * are 2-decimal-quantized at the source, so the grouped frame is
    * bounded by the value range × 100, not by the corpus); cumulative
    * counts over that bounded, ordered frame assign each distinct
    * value its average rank, and the rank-sum is a weighted aggregate
    * of counts × ranks — exact integer/half-integer arithmetic until
    * the final z. */
  def mannWhitney(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n2"))
    // bounded frame: one row per distinct 2-decimal value
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("t", col("n1") + col("n2"))
      .withColumn("cb", coalesce(sum(col("n1") + col("n2")).over(w), lit(0L)))
    val stats = ranked.agg(
      sum(col("n1")).as("n1t"), sum(col("n2")).as("n2t"),
      sum(col("n1") + col("n2")).as("nt"),
      sum(col("n1") * (col("cb") + (col("t") + 1) / lit(2.0))).as("r1"),
      sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
    stats.select(
      col("n1t").as("n1"), col("n2t").as("n2"),
      round4eps(col("r1") - col("n1t") * (col("n1t") + 1) / lit(2.0)).as("u1"),
      round4eps((col("r1") - col("n1t") * (col("n1t") + 1) / lit(2.0) -
        col("n1t") * col("n2t") / lit(2.0)) /
        sqrt(col("n1t") * col("n2t") / lit(12.0) *
          ((col("nt") + 1) - col("ties") * lit(1.0) /
            (col("nt") * (col("nt") - 1))))).as("z_score"))
  }

  /** ROC AUC of `value` as a score for "is this a purchase" — the
    * model-evaluation statistic, computed via its rank identity
    * AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) (a normalized Mann-Whitney U —
    * ties get half credit via average ranks). Same scale shape as
    * [[mannWhitney]]: the score column collapses to its NDV-bounded
    * distinct-value frame; no row is ever globally sorted. AUC ≈ 0.5
    * here certifies the synthetic value column carries no class
    * signal — the null-baseline readout an eval harness must get
    * right before real scores arrive. */
  def aucScore(s: SparkSession, dir: String,
      positive: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === positive, 1L).otherwise(0L))
        .as("np"),
        sum(when(col("event_type") =!= positive, 1L).otherwise(0L))
          .as("nn"))
    val w = Window.orderBy(col("value")) // NDV-bounded frame
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("t", col("np") + col("nn"))
      .withColumn("cb", coalesce(sum(col("np") + col("nn")).over(w), lit(0L)))
    ranked.agg(
        sum(col("np")).as("npt"), sum(col("nn")).as("nnt"),
        sum(col("np") * (col("cb") + (col("t") + 1) / lit(2.0))).as("rp"))
      .select(col("npt").as("n_pos"), col("nnt").as("n_neg"),
        round4eps((col("rp") - col("npt") * (col("npt") + 1) / lit(2.0)) /
          (col("npt") * col("nnt"))).as("auc"))
  }

  /** Average precision (PR-AUC) of the event-value score for
    * predicting purchases — the ranking metric that matters under
    * class imbalance, where ROC-AUC ([[aucScore]], same score/label
    * setup) flatters. Tie groups are handled pessimistically: every
    * positive in a score group gets the precision AT THE GROUP
    * BOUNDARY (all of the group counted), so AP is exact integer
    * arithmetic over the NDV-bounded score-distribution collapse —
    * no per-row ranking, no corpus-sized sort. */
  def prAuc(s: SparkSession, dir: String,
      positive: String = "purchase"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === positive, 1L).otherwise(0L))
        .as("np"),
        sum(when(col("event_type") =!= positive, 1L).otherwise(0L))
          .as("nn"))
    val w = Window.orderBy(col("value").desc) // NDV-bounded frame
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("cp", sum(col("np")).over(w))
      .withColumn("cn", sum(col("nn")).over(w))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        round4eps(sum(col("np").cast("double") *
          (col("cp").cast("double") /
            (col("cp") + col("cn")).cast("double"))) /
          sum(col("np")).cast("double")).as("average_precision"))
      .withColumn("baseline_rate", round4eps(
        col("n_pos").cast("double") /
          (col("n_pos") + col("n_neg")).cast("double")))
  }

  /** Longest consecutive-day activity streak per user (top 20): the
    * gaps-and-islands idiom — distinct active days, island id =
    * day − row_number (constant within a run of consecutive days),
    * island lengths, max per user. Every window is keyed on user_id;
    * the final top-k is a TakeOrdered over the user-grain rollup. */
  def longestStreaks(s: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val grp = date_sub(col("d"),
      row_number().over(Window.partitionBy(col("user_id")).orderBy(col("d"))))
    days.withColumn("grp", grp)
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        sum(col("len")).as("n_active_days"))
      .orderBy(col("longest_streak").desc, col("user_id"))
      .limit(topN)
  }

  /** Daily bounce rate: sessions (30-min inactivity gap, the
    * [[Windows.sessionize]] definition) that contain a single event,
    * as a fraction of sessions starting that day. Both windows are
    * keyed on user_id (one shuffle partitioning serves both); the
    * daily rollup is calendar-bounded. */
  def bounceRate(s: SparkSession, dir: String,
      gapSeconds: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val isNew = when(col("prev_ts").isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds,
      1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", isNew)
      .withColumn("seq", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("seq"))
      .agg(min(col("ts")).as("t0"), count(lit(1)).as("n"))
      .groupBy(to_date(col("t0")).as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .select(col("day"), col("n_sessions"), col("n_bounces"),
        round4eps(col("n_bounces").cast("double") / col("n_sessions"))
          .as("bounce_rate"))
      .orderBy(col("day"))
  }

  /** Item-item collaborative filtering scores — cosine similarity on
    * binary order-baskets: cos(a,b) = |orders with both| /
    * √(|orders with a|·|orders with b|), the classic
    * "customers who bought X also bought Y" kernel (Amazon 2003),
    * with a minimum co-support floor. Complements sessionCooccurrence
    * (PMI on event types) with the PART-grain signal.
    *
    * Scale shape: pair generation is an orderkey-keyed self-join, so
    * fan-out per order is C(lines,2) ≤ C(7,2) — bounded by basket
    * size, never by catalog size; co-counts and item counts are two
    * keyed aggregates; the score is a ratio of exact integers
    * (bit-identical). Top-k is a distributed TakeOrderedAndProject on
    * the ROUNDED score with the key pair as tie-break. */
  def itemItemCosine(s: SparkSession, dir: String, k: Int = 20,
      minSupport: Long = 3L): DataFrame = {
    import graft.functions.Rounding.round4eps
    val baskets = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .persistMemDisk
    val itemN = baskets.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("ni"))
    val a = baskets.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val b = baskets.select(col("l_orderkey"), col("l_partkey").as("pb"))
    val co = a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minSupport)
    co.join(itemN.select(col("l_partkey").as("pa"), col("ni").as("na")),
        "pa")
      .join(itemN.select(col("l_partkey").as("pb"), col("ni").as("nb")),
        "pb")
      .select(col("pa"), col("pb"), col("nab"), col("na"), col("nb"),
        round4eps(col("nab").cast("double") /
          sqrt((col("na") * col("nb")).cast("double"))).as("cosine"))
      .orderBy(col("cosine").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** Top in-session event-type trigram paths ("view > click >
    * purchase") — the path-mining readout behind every funnel
    * hypothesis: which 3-step sequences actually happen. Sessions are
    * the standard 30-minute-gap cut; within a session events are
    * totally ordered by (ts, event_id).
    *
    * Scale shape: both windows are user-keyed (sessionization and the
    * two leads share ONE partitioning — Catalyst plans a single
    * shuffle+sort); the trigram count is a map-side-combined groupBy
    * on a vocabulary-bounded key (|types|³), and the final top-k is a
    * TakeOrdered, never a global sort. */
  def sessionPaths(s: SparkSession, dir: String, topN: Int = 20):
      DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800L,
        1).otherwise(0))
      .withColumn("seq", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    val bySess = Window.partitionBy(col("user_id"), col("seq"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("e2", lead(col("event_type"), 1).over(bySess))
      .withColumn("e3", lead(col("event_type"), 2).over(bySess))
      .filter(col("e3").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("e2"), col("e3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }

  /** Stratified inverse-propensity-weight estimate of the "deep
    * discount → return" effect: strata are the five quantity bands,
    * the within-stratum propensity is the treated share, and the ATE
    * is the stratum-size-weighted difference of treated/control
    * return rates (the IPW estimator collapses to exactly this when
    * the propensity is fit saturated-per-stratum). Per-stratum rows
    * plus the ATE as a constant column.
    *
    * Scale shape: ONE (stratum × treatment) count pass — every rate
    * and weight is a ratio of exact integer counts on the
    * strata-bounded frame. */
  def ipwAte(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      least(floor((col("l_quantity") - 1) / 10), lit(4)).cast("long")
        .as("stratum"),
      (col("l_discount") >= 0.06).cast("long").as("t"),
      (col("l_returnflag") === "R").cast("long").as("y"))
    val cells = li.groupBy(col("stratum")).agg(
      count(lit(1)).as("n"),
      sum(col("t")).as("nt"),
      sum(col("t") * col("y")).as("yt"),
      sum((lit(1L) - col("t")) * col("y")).as("yc"))
      .persistMemDisk
    val eff = (col("yt").cast("double") / col("nt")) -
      (col("yc").cast("double") / (col("n") - col("nt")))
    val ate = cells.agg(round4eps(
      sum(col("n") * ((col("yt").cast("double") / col("nt")) -
        (col("yc").cast("double") / (col("n") - col("nt"))))) /
        sum(col("n"))).as("ate"))
    cells.crossJoin(broadcast(ate))
      .select(col("stratum"), col("n"),
        round4eps(col("nt").cast("double") / col("n")).as("p_treat"),
        round4eps(col("yt").cast("double") / col("nt")).as("rate_treat"),
        round4eps(col("yc").cast("double") / (col("n") - col("nt")))
          .as("rate_ctrl"),
        round4eps(eff).as("effect"), col("ate"))
      .orderBy(col("stratum"))
  }

  /** Bass diffusion fit over monthly customer adoption — the classic
    * innovation/imitation model n_t = p·m + (q−p)·N_{t−1} − (q/m)·N²,
    * fit by the discrete-Bass OLS (regress monthly adopters on
    * cumulative adopters and its square — the olsMulti two-regressor
    * normal equations, closed form, no iteration) and inverted to the
    * named parameters: market size m̂ (the positive quadratic root —
    * on this corpus it recovers the true customer count within ~0.2%),
    * innovation p = a/m̂, imitation q = −c·m̂ and the peak-adoption
    * time ln(q/p)/(p+q).
    *
    * N is scaled by 1/1000 for conditioning and the coefficients
    * unscaled after the solve; the root-existence guard (disc > 0,
    * c < 0) reads QUANTIZED values so both engines take the same
    * branch. One customer-grain aggregate → month-grain collapse
    * (calendar-bounded) → one moments row. */
  def bassDiffusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    val q6 = (c: Column) =>
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val first = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("fd"))
    val monthly = first
      .groupBy(date_trunc("month", col("fd")).cast("date").as("m"))
      .agg(count(lit(1)).as("n_t"))
    val w = Window.orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq0 = monthly
      .withColumn("y", col("n_t").cast("double"))
      .withColumn("x",
        (sum(col("n_t")).over(w) - col("n_t")).cast("double") / 1000.0)
    val mo = seq0.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("s11"),
      sum(col("x") * col("x") * col("x")).as("s12"),
      sum(col("x") * col("x") * col("x") * col("x")).as("s22"),
      sum(col("x") * col("y")).as("s1y"),
      sum(col("x") * col("x") * col("y")).as("s2y"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val b0 = (col("sy") - b1 * col("s1") - b2 * col("s2")) / col("n")
    // keep the SCALED quadratic coefficient (O(1) at any sf) for the
    // root guard — the unscaled c is ~1e-6·b2 and would quantize to 0
    val withAbc = mo.select(col("n"),
      b0.as("a"), (b1 / 1000.0).as("b"), (b2 / 1e6).as("c"),
      b2.as("c_scaled"))
    val disc = col("b") * col("b") - lit(4.0) * col("a") * col("c")
    val fit = withAbc
      .withColumn("disc_q", q6(disc))
      .withColumn("m_est",
        when(col("disc_q") > 0 && q6(col("c_scaled")) < 0,
          (-col("b") - sqrt(disc)) / (lit(2.0) * col("c"))))
      .withColumn("p", col("a") / col("m_est"))
      .withColumn("q", -col("c") * col("m_est"))
    fit.select(col("n").cast("long").as("n_months"),
      round4eps(col("m_est")).as("m_est"),
      round4eps(col("p")).as("p_innovation"),
      round4eps(col("q")).as("q_imitation"),
      round4eps(log(col("q") / col("p")) / (col("p") + col("q")))
        .as("peak_t"))
  }

  /** Uplift-by-decile table: treatment = urgent/high priority
    * handling, outcome = order fulfilled, ranked by spend — does the
    * expensive handling move the needle MORE for big spenders? The
    * two-model-free uplift read every targeting decision starts from
    * (and the input to a Qini curve). Deciles come from the $1000
    * value-bucket distribution collapse: a bucket belongs to the
    * decile of its FIRST member's rank (decile = ⌊cb·10/N⌋+1, exact
    * integer arithmetic on cumulative counts — no fact-scale ntile
    * sort, the propensityAtt boundary-compare lesson). */
  def upliftDeciles(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.orders(s, dir)
      .select(floor(col("o_totalprice") / lit(1000.0)).cast("long").as("v"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          .cast("long").as("tr"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
    val cells = base.groupBy(col("v"))
      .agg(count(lit(1)).as("t"),
        sum(col("tr")).as("nt"), sum(col("tr") * col("y")).as("rt"),
        sum((lit(1L) - col("tr")) * col("y")).as("rc"))
      .persistMemDisk
    val tot = cells.agg(sum(col("t")).as("nn"))
    // rank by spend DESC: decile 1 = top spenders
    val wDesc = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    cells.crossJoin(broadcast(tot))
      .withColumn("cb", coalesce(sum(col("t")).over(wDesc), lit(0L)))
      // `div` = ANSI integer division on longs (double `/` would risk
      // a just-below-integer quotient flipping a boundary bucket)
      .withColumn("decile", expr("cb * 10 div nn + 1"))
      .groupBy(col("decile"))
      .agg(sum(col("nt")).as("n_treat"),
        sum(col("t") - col("nt")).as("n_ctrl"),
        sum(col("rt")).as("r_treat"), sum(col("rc")).as("r_ctrl"))
      .select(col("decile"), col("n_treat"), col("n_ctrl"),
        round4eps(col("r_treat").cast("double") / col("n_treat"))
          .as("rate_treat"),
        round4eps(col("r_ctrl").cast("double") / col("n_ctrl"))
          .as("rate_ctrl"),
        round4eps(col("r_treat").cast("double") / col("n_treat") -
          col("r_ctrl").cast("double") / col("n_ctrl")).as("uplift"))
      .orderBy(col("decile"))
  }

  /** Missingness profile of the nullable `value` column by event
    * type: per-type missing rates, the observed mean (exact cents),
    * and the variance DEFLATION a naive mean-impute would cause
    * (imputed/observed variance ratio = (n_obs−1)/(n−1) analytically;
    * reported from the actual moments so the identity is checked, not
    * assumed), plus the missingness-independence chi² across types as
    * a constant column — MCAR's first falsification test. The screen
    * that runs BEFORE anyone fills nulls in a training table.
    *
    * Scale shape: one type-keyed conditional-moment pass (cents-exact
    * sums), chi² from the |types|-bounded cell frame broadcast
    * back. */
  def missingnessProfile(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"),
      col("value").isNull.as("miss"),
      when(col("value").isNotNull,
        round(col("value") * 100).cast("long")).otherwise(0L).as("cents"))
    val per = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("miss"), 1L).otherwise(0L)).as("nm"),
        sum(col("cents")).as("sc"),
        sum(col("cents") * col("cents")).as("scc"))
      .persistMemDisk
    val tot = per.agg(sum(col("n")).cast("double").as("gn"),
      sum(col("nm")).cast("double").as("gm"))
    // chi² of missing × type from exact integer cells
    val chi2 = per.crossJoin(broadcast(tot))
      .agg(round4eps(sum(
        (col("nm") - col("n") * col("gm") / col("gn")) *
          (col("nm") - col("n") * col("gm") / col("gn")) /
          (col("n") * col("gm") / col("gn")) +
        ((col("n") - col("nm")) - col("n") * (col("gn") - col("gm")) / col("gn")) *
          ((col("n") - col("nm")) - col("n") * (col("gn") - col("gm")) / col("gn")) /
          (col("n") * (col("gn") - col("gm")) / col("gn"))))
        .as("chi2_mcar"))
    val nObs = (col("n") - col("nm")).cast("double")
    val varObs = (col("scc").cast("double") -
      col("sc").cast("double") * col("sc").cast("double") / nObs) /
      (nObs - 1)
    per.crossJoin(broadcast(chi2))
      .select(col("event_type"), col("n"), col("nm").as("n_missing"),
        round4eps(col("nm").cast("double") / col("n")).as("missing_rate"),
        round4eps(col("sc").cast("double") / nObs / lit(100.0))
          .as("mean_observed"),
        round4eps(varObs / lit(10000.0)).as("var_observed"),
        // mean-impute keeps Σ(x−x̄)² fixed while n grows, so the
        // filled column's variance deflates to SS/(n−1)
        round4eps(varObs * (nObs - 1) / (col("n") - 1) / lit(10000.0))
          .as("var_imputed"),
        col("chi2_mcar"))
      .orderBy(col("event_type"))
  }

  /** Brunner-Munzel rank test (purchase vs click on value) — the
    * heteroscedasticity-robust replacement for [[mannWhitney]]: no
    * equal-variance assumption, so it stays valid when the two event
    * types' value distributions differ in shape, not just location.
    * Computed entirely on the NDV-bounded distinct-value frame:
    * overall and within-group midranks from cumulative counts,
    * placements P = R − R_within, p̂ = P(X<Y)+½P(X=Y) =
    * (R̄₂−(n₂+1)/2)/n₁, the studentized statistic with the
    * Satterthwaite df. Midranks are exact .5-rationals, so every
    * intermediate is engine-exact until the final √. */
  def brunnerMunzel(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g
      .withColumn("t", col("n1") + col("n2"))
      .withColumn("cb", coalesce(sum(col("n1") + col("n2")).over(w), lit(0L)))
      .withColumn("cb1", coalesce(sum(col("n1")).over(w), lit(0L)))
      .withColumn("cb2", coalesce(sum(col("n2")).over(w), lit(0L)))
      .withColumn("rmid", col("cb") + (col("t") + 1) / lit(2.0))
      .withColumn("r1mid", col("cb1") + (col("n1") + 1) / lit(2.0))
      .withColumn("r2mid", col("cb2") + (col("n2") + 1) / lit(2.0))
      .persistMemDisk
    val tot = ranked.agg(sum(col("n1")).cast("double").as("m1"),
      sum(col("n2")).cast("double").as("m2"),
      (sum(col("n1") * col("rmid")) / sum(col("n1"))).as("rb1"),
      (sum(col("n2") * col("rmid")) / sum(col("n2"))).as("rb2"))
    val vars = ranked.crossJoin(broadcast(tot)).agg(
      max(col("m1")).as("m1"), max(col("m2")).as("m2"),
      max(col("rb1")).as("rb1"), max(col("rb2")).as("rb2"),
      (sum(col("n1") *
        (col("rmid") - col("r1mid") - col("rb1") + (col("m1") + 1) / 2) *
        (col("rmid") - col("r1mid") - col("rb1") + (col("m1") + 1) / 2)) /
        (max(col("m1")) - 1)).as("s1sq"),
      (sum(col("n2") *
        (col("rmid") - col("r2mid") - col("rb2") + (col("m2") + 1) / 2) *
        (col("rmid") - col("r2mid") - col("rb2") + (col("m2") + 1) / 2)) /
        (max(col("m2")) - 1)).as("s2sq"))
    vars.select(
      col("m1").cast("long").as("n1"), col("m2").cast("long").as("n2"),
      round4eps((col("rb2") - (col("m2") + 1) / 2) / col("m1")).as("p_hat"),
      round4eps(col("m1") * col("m2") * (col("rb2") - col("rb1")) /
        ((col("m1") + col("m2")) *
          sqrt(col("m1") * col("s1sq") + col("m2") * col("s2sq"))))
        .as("bm_stat"),
      round4eps(pow(col("m1") * col("s1sq") + col("m2") * col("s2sq"), 2) /
        (pow(col("m1") * col("s1sq"), 2) / (col("m1") - 1) +
          pow(col("m2") * col("s2sq"), 2) / (col("m2") - 1))).as("df"))
  }

  /** Ansari-Bradley scale test (purchase vs click on value): AB
    * scores min(rank, N+1−rank) with exact tied-block averages —
    * computed in closed form per distinct-value block from integer
    * position sums, so scores are exact rationals — summed over the
    * first sample; z against the classical untied mean/variance
    * (parity-split formulas). The dispersion-alternative companion of
    * [[mannWhitney]] (equal centers assumed, as these synthetic
    * values have by construction). */
  def ansariBradley(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = g.agg(sum(col("n1") + col("n2")).as("nn"))
    val blocks = g.crossJoin(broadcast(tot))
      .withColumn("t", col("n1") + col("n2"))
      .withColumn("cb", coalesce(sum(col("n1") + col("n2")).over(w), lit(0L)))
      .withColumn("a", col("cb") + 1)
      .withColumn("b", col("cb") + col("t"))
      // Σ_{p=a..b} min(p, N+1−p), split at the fold point (N+1)/2
      // (N+1)/2 must be INTEGER division (Spark `/` on longs is
      // double); exact for any feasible N, truncation = floor here
      .withColumn("c", least(col("b"), ((col("nn") + 1) / 2).cast("long")))
      .withColumn("part1", when(col("c") >= col("a"),
        (col("a") + col("c")) * (col("c") - col("a") + 1) / lit(2.0))
        .otherwise(lit(0.0)))
      .withColumn("lo", greatest(col("a"), col("c") + 1))
      .withColumn("part2", when(col("b") >= col("lo"),
        (col("nn") + lit(1.0)) * (col("b") - col("lo") + 1) -
          (col("lo") + col("b")) * (col("b") - col("lo") + 1) / lit(2.0))
        .otherwise(lit(0.0)))
      .withColumn("score", (col("part1") + col("part2")) / col("t"))
    val agg = blocks.agg(
      sum(col("n1")).cast("double").as("m1"),
      sum(col("n2")).cast("double").as("m2"),
      max(col("nn")).cast("double").as("nd"),
      sum(col("n1") * col("score")).as("ab"))
    val nD = col("nd")
    val mean = when(col("nd") % 2 === 0, col("m1") * (nD + 2) / 4)
      .otherwise(col("m1") * (nD + 1) * (nD + 1) / (nD * 4))
    val vr = when(col("nd") % 2 === 0,
        col("m1") * col("m2") * (nD + 2) * (nD - 2) / ((nD - 1) * 48))
      .otherwise(col("m1") * col("m2") * (nD + 1) * (nD * nD + 3) /
        (nD * nD * 48))
    agg.select(col("m1").cast("long").as("n1"),
      col("m2").cast("long").as("n2"),
      round4eps(col("ab")).as("ab_stat"),
      round4eps((col("ab") - mean) / sqrt(vr)).as("z_stat"))
  }

  /** Siegel-Tukey scale test: pool both samples, assign ranks
    * ALTERNATING from the extremes inward (1 to the smallest, 2-3 to
    * the two largest, 4-5 to the next two smallest, …), then run a
    * Wilcoxon on those ranks — scale differences push one group's
    * ranks low. Ansari-Bradley's folded-rank cousin with an exact
    * Wilcoxon null (tie-corrected variance).
    *
    * Value-collapsed closed form: a tied block occupies contiguous
    * sorted positions [a..b]; the Siegel-Tukey ranks of a position run
    * are summed arithmetically per half (bottom half: Σ2p − #odd; top
    * half via q = N+1−p: Σ2q − #even) so no rank is ever enumerated —
    * one value-grain aggregation + a prefix window, the
    * ansariBradley/pettitt doctrine. Midranking (block average) makes
    * the statistic tie-order free. */
  def siegelTukey(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def idiv2(c: org.apache.spark.sql.Column) =
      floor(c / lit(2.0)).cast("long")
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = g.agg(sum(col("n1") + col("n2")).as("nn"))
    val blocks = g.crossJoin(broadcast(tot))
      .withColumn("t", col("n1") + col("n2"))
      .withColumn("cb", coalesce(sum(col("n1") + col("n2")).over(w), lit(0L)))
      .withColumn("a", col("cb") + 1)
      .withColumn("b", col("cb") + col("t"))
      .withColumn("c", idiv2(col("nn") + 1)) // ceil(N/2)
      // bottom half [a .. min(b,c)]: ranks 2p−1 (p odd) / 2p (p even)
      .withColumn("bhi", least(col("b"), col("c")))
      .withColumn("sumBot", when(col("bhi") >= col("a"),
        (col("a") + col("bhi")) * (col("bhi") - col("a") + 1) -
          (idiv2(col("bhi") + 1) - idiv2(col("a")))).otherwise(lit(0L)))
      // top half, q = N+1−p ∈ [N+1−b .. N+1−max(a,c+1)]: 2q (q odd) /
      // 2q−1 (q even)
      .withColumn("qlo", col("nn") + 1 - col("b"))
      .withColumn("qhi", col("nn") + 1 - greatest(col("a"), col("c") + 1))
      .withColumn("sumTop", when(col("qhi") >= col("qlo"),
        (col("qlo") + col("qhi")) * (col("qhi") - col("qlo") + 1) -
          (idiv2(col("qhi")) - idiv2(col("qlo") - 1))).otherwise(lit(0L)))
      .withColumn("sbar",
        (col("sumBot") + col("sumTop")).cast("double") / col("t"))
    val agg = blocks.agg(
      sum(col("n1")).cast("double").as("m1"),
      sum(col("n2")).cast("double").as("m2"),
      max(col("nn")).cast("double").as("nd"),
      sum(col("n1") * col("sbar")).as("wstat"),
      sum(col("t") * col("t") * col("t") - col("t")).cast("double").as("tc"))
    agg.select(col("m1").cast("long").as("n1"),
      col("m2").cast("long").as("n2"),
      round4eps(col("wstat")).as("w_stat"),
      round4eps((col("wstat") - col("m1") * (col("nd") + 1) / 2) /
        sqrt(col("m1") * col("m2") / 12.0 *
          ((col("nd") + 1) - col("tc") / (col("nd") * (col("nd") - 1)))))
        .as("z_stat"))
  }

  /** Cucconi test (1968): the JOINT location-scale two-sample test —
    * U standardizes Σ R² and V standardizes Σ (N+1−R)² of sample A
    * (midranks under ties), C = (U² + V² − 2ρUV)/(2(1−ρ²)) with the
    * exact exchangeability correlation ρ = 2(N²−4)/((2N+1)(8N+11)) − 1.
    * Detects location AND scale shifts in one statistic (vs running
    * Mann-Whitney + Ansari-Bradley separately and Bonferroni-ing).
    * Same value-collapsed rank algebra as the rest of the family. */
  def cucconiTest(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = g
      .withColumn("t", col("n1") + col("n2"))
      .withColumn("cb", coalesce(sum(col("n1") + col("n2")).over(w), lit(0L)))
      .withColumn("r", col("cb") + (col("t") + 1) / lit(2.0))
    val agg = blocks.agg(
      sum(col("n1")).cast("double").as("m1"),
      sum(col("n2")).cast("double").as("m2"),
      sum(col("t")).cast("double").as("nd"),
      sum(col("n1") * col("r")).as("sr1"),
      sum(col("n1") * col("r") * col("r")).as("sr2"))
    val n = col("nd")
    // Σ(N+1−R)² = n₁(N+1)² − 2(N+1)ΣR + ΣR²
    val ss2 = col("m1") * (n + 1) * (n + 1) -
      lit(2.0) * (n + 1) * col("sr1") + col("sr2")
    val den = sqrt(col("m1") * col("m2") * (n + 1) * (lit(2.0) * n + 1) *
      (lit(8.0) * n + 11) / 5.0)
    val uS = (lit(6.0) * col("sr2") - col("m1") * (n + 1) *
      (lit(2.0) * n + 1)) / den
    val vS = (lit(6.0) * ss2 - col("m1") * (n + 1) *
      (lit(2.0) * n + 1)) / den
    val rho = lit(2.0) * (n * n - 4) /
      ((lit(2.0) * n + 1) * (lit(8.0) * n + 11)) - 1
    agg.select(col("m1").cast("long").as("n1"),
      col("m2").cast("long").as("n2"),
      round4eps(uS).as("u_stat"),
      round4eps(vS).as("v_stat"),
      round4eps(rho).as("rho"),
      round4eps((uS * uS + vS * vS - lit(2.0) * rho * uS * vS) /
        (lit(2.0) * (lit(1.0) - rho * rho))).as("c_stat"))
  }

  /** Cliff's delta — the nonparametric effect SIZE the two-sample
    * tests in this family report significance without:
    * δ = (#{a > b} − #{a < b}) / (n₁n₂) ∈ [−1, 1], with the standard
    * |δ| magnitude bins (negligible < .147 ≤ small < .33 ≤ medium
    * < .474 ≤ large — Romano et al.). Dominance counts come EXACTLY
    * from the value-collapsed frame (one prefix window: pairs above =
    * n1_v · cum-n2-below, ties contribute zero) — never a pair
    * enumeration. */
  def cliffsDelta(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("value"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blocks = g
      .withColumn("cum2", coalesce(sum(col("n2")).over(w), lit(0L)))
      .withColumn("cum1", coalesce(sum(col("n1")).over(w), lit(0L)))
    val agg = blocks.agg(
      sum(col("n1")).as("m1"), sum(col("n2")).as("m2"),
      sum(col("n1") * col("cum2")).as("gt"), // a strictly above b
      sum(col("n2") * col("cum1")).as("lt")) // a strictly below b
    val delta = (col("gt") - col("lt")).cast("double") /
      (col("m1") * col("m2")).cast("double")
    agg.select(col("m1").as("n1"), col("m2").as("n2"),
      col("gt").as("pairs_gt"), col("lt").as("pairs_lt"),
      round4eps(delta).as("cliffs_delta"),
      when(abs(delta) < 0.147, "negligible")
        .when(abs(delta) < 0.33, "small")
        .when(abs(delta) < 0.474, "medium")
        .otherwise("large").as("magnitude"))
  }

  /** Baumgartner-Weiß-Schindler (BWS, 1998) two-sample test: a
    * weighted Cramér-von-Mises on pooled ranks, B = (B_X + B_Y)/2 with
    * B_X = n⁻¹ Σᵢ (Rᵢ − (m+n)i/n)² / [ (i/(n+1))(1−i/(n+1)) ·
    * m(m+n)/n ] — the variance weighting makes it sensitive in the
    * TAILS where Wilcoxon and KS lose power. Midranks under ties;
    * within-group index i via one per-group sort (tie-order invariant:
    * tied members share R, their i's are a fixed consecutive run).
    * Per-group sorts + one value-keyed midrank join — the same
    * order-statistics cost as every EDF gate. */
  def bwsTest(s: SparkSession, dir: String,
      typeA: String = "purchase", typeB: String = "click"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"), col("value"), col("event_id"))
    val byV = ev.groupBy(col("value")).agg(count(lit(1)).as("t"))
    val wV = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = byV
      .withColumn("cb", coalesce(sum(col("t")).over(wV), lit(0L)))
      .select(col("value"), (col("cb") + (col("t") + 1) / lit(2.0)).as("r"))
    val wI = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val sizes = ev.groupBy(col("event_type")).agg(count(lit(1)).as("g"))
    val tot = sizes.agg(sum(col("g")).as("nn"))
    val terms = ev.join(ranks, "value")
      .withColumn("i", row_number().over(wI).cast("double"))
      .join(broadcast(sizes), "event_type")
      .crossJoin(broadcast(tot))
      .withColumn("o", (col("nn") - col("g")).cast("double"))
      .withColumn("gd", col("g").cast("double"))
      .withColumn("num",
        (col("r") - col("nn") / col("gd") * col("i")) *
          (col("r") - col("nn") / col("gd") * col("i")))
      .withColumn("den",
        col("i") / (col("gd") + 1) * (lit(1.0) - col("i") / (col("gd") + 1)) *
          (col("o") * col("nn") / col("gd")))
      .groupBy(col("event_type"))
      .agg(max(col("gd")).as("gd"), avg(col("num") / col("den")).as("bg"))
    val piv = terms.agg(
      sum(when(col("event_type") === typeA, col("gd"))).as("n1"),
      sum(when(col("event_type") === typeB, col("gd"))).as("n2"),
      sum(when(col("event_type") === typeA, col("bg"))).as("bx"),
      sum(when(col("event_type") === typeB, col("bg"))).as("by"))
    piv.select(col("n1").cast("long").as("n1"),
      col("n2").cast("long").as("n2"),
      round4eps(col("bx")).as("b_x"),
      round4eps(col("by")).as("b_y"),
      round4eps((col("bx") + col("by")) / 2).as("bws_stat"))
  }
}
