package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Relational}

/** Semantics checks for the hypothesis-test / time-series gates
  * (chi-square, Mann-Whitney, ACF, streaks, bounce rate) against
  * independently-computed references on sf0.001. Values are
  * oracle-gated in the registry; these specs pin the STATISTICAL
  * definitions (tie handling, censoring, full-series mean) with a
  * from-scratch Scala recomputation.
  */
class HypothesisTestsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("mannWhitney matches a from-scratch rank-sum with average ties") {
    val rows = Tables.events(spark, dir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter(r => r._1 == "purchase" || r._1 == "click")
    val sorted = rows.sortBy(_._2)
    // average ranks with ties
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      ranks(sorted(i)._2) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val r1 = sorted.filter(_._1 == "purchase").map(r => ranks(r._2)).sum
    val n1 = sorted.count(_._1 == "purchase").toLong
    val u1want = r1 - n1 * (n1 + 1) / 2.0
    val got = Behavior.mannWhitney(spark, dir).head()
    assert(got.getAs[Long]("n1") == n1)
    assert(math.abs(got.getAs[Double]("u1") - u1want) < 1e-6)
  }

  test("chiSquare dof and margins are consistent") {
    val got = Behavior.chiSquareTypeDow(spark, dir).head()
    val nTypes = Tables.events(spark, dir)
      .select("event_type").distinct().count()
    // events span every weekday at this sf
    assert(got.getAs[Long]("dof") == (nTypes - 1) * 6)
    assert(got.getAs[Double]("chi2") >= 0.0)
    val v = got.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
    assert(got.getAs[Long]("n") == Tables.events(spark, dir).count())
  }

  test("revenueAcf is 1-bounded and uses the full-series mean") {
    val out = Relational.revenueAcf(spark, dir).collect()
    assert(out.length == 7)
    assert(out.forall(r => math.abs(r.getAs[Double]("acf")) <= 1.0))
    // reference for lag 1
    val daily = Tables.orders(spark, dir)
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")).as("d"))
      .agg(org.apache.spark.sql.functions.sum("o_totalprice").as("rev"))
      .orderBy("d").collect()
      .map(r => math.floor(r.getDouble(1) * 10000 + 0.5 + 1e-6) / 10000)
    val mu = daily.sum / daily.length
    val denom = daily.map(x => (x - mu) * (x - mu)).sum
    val num = daily.zip(daily.tail).map { case (a, b) => (a - mu) * (b - mu) }.sum
    val want = num / denom
    assert(math.abs(out.head.getAs[Double]("acf") - want) < 1e-3)
  }

  test("longestStreaks counts maximal consecutive-day runs") {
    val got = Behavior.longestStreaks(spark, dir, topN = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byUser = Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1)
    val want = byUser.map { case (u, rows) =>
      val days = rows.map(_._2).sorted
      var best = 1L; var cur = 1L
      days.zip(days.tail).foreach { case (a, b) =>
        if (b == a + 1) { cur += 1; best = math.max(best, cur) }
        else cur = 1
      }
      (u, best, days.length.toLong)
    }.toSet
    assert(got == want)
  }

  test("markovStationary: a probability distribution that is P-invariant") {
    val out = Behavior.markovStationary(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(math.abs(out.values.sum - 1.0) < 1e-3)
    assert(out.values.forall(p => p >= 0.0 && p <= 1.0))
    // fixed point: one more application of P moves nothing (within the
    // 1e-6 quantization the iteration itself uses)
    val p = Behavior.transitionMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("n_transitions")))
    val tot = p.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val next = out.keys.map { st =>
      st -> p.filter(_._2 == st)
        .map { case (c, _, n) => out(c) * n / tot(c) }.sum
    }.toMap
    out.foreach { case (st, v) => assert(math.abs(v - next(st)) < 1e-3) }
  }

  test("crossCorrDaily lag 0 equals the aligned-day Pearson correlation") {
    val out = Behavior.crossCorrDaily(spark, dir).collect()
    assert(out.length == 7)
    assert(out.forall(r => math.abs(r.getAs[Double]("xcorr")) <= 1.0))
    val lag0 = out.find(_.getInt(0) == 0).get
    // reference: join daily counts in Scala
    def daily(t: String) = Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === t)
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("d"))
      .count().collect()
      .map(r => (r.getDate(0).toString, r.getLong(1).toDouble)).toMap
    val (dx, dy) = (daily("purchase"), daily("error"))
    val common = dx.keySet.intersect(dy.keySet).toSeq
    val (xs, ys) = (common.map(dx), common.map(dy))
    val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val r = cov / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
      ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(lag0.getAs[Double]("xcorr") - r) < 1e-3)
    assert(lag0.getAs[Long]("n_days") == common.length)
  }

  test("holtForecast extrapolates linearly: forecast(h) = l + h*b") {
    val out = Relational.holtForecast(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    assert(out.length == 7)
    // second differences of a linear extrapolation are zero (up to the
    // 1e-4 output quantization)
    val diffs = out.map(_._2).sliding(2).map(p => p(1) - p(0)).toSeq
    diffs.sliding(2).foreach { p =>
      assert(math.abs(p(1) - p(0)) < 2e-4, s"not linear: $diffs")
    }
  }

  test("sessionCooccurrence: pair counts bounded by each type's sessions") {
    val out = Behavior.sessionCooccurrence(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      assert(r.getAs[Long]("n_sessions_both") > 0)
    }
  }

  test("rollingMedianRevenue: calendar window shortens at the series head") {
    val out = Relational.rollingMedianRevenue(spark, dir).collect()
    assert(out.nonEmpty)
    // the first day has only itself in [d-6, d]
    val first = out.minBy(_.getDate(0).toLocalDate.toEpochDay)
    assert(first.getAs[Long]("n_days") === 1L)
    // no window ever exceeds 7 calendar days
    assert(out.forall(_.getAs[Long]("n_days") <= 7L))
  }

  test("temporalSplit: splits partition events, embargo strictly between") {
    val out = Relational.temporalSplit(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n_events")).sum
    assert(total === Tables.events(spark, dir).count())
    val bySplit = out.groupBy(_.getString(0))
    for (r <- bySplit.getOrElse("train", Array.empty))
      assert(r.getAs[java.sql.Date]("last_day").toString < "2024-01-20")
    for (r <- bySplit.getOrElse("test", Array.empty))
      assert(r.getAs[java.sql.Date]("first_day").toString >= "2024-01-23")
    for (r <- bySplit.getOrElse("embargo", Array.empty)) {
      assert(r.getAs[java.sql.Date]("first_day").toString >= "2024-01-20")
      assert(r.getAs[java.sql.Date]("last_day").toString < "2024-01-23")
    }
  }

  test("funnelLatency: user counts agree with funnelStages, deltas positive") {
    val lat = Behavior.funnelLatency(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(lat.keySet === Set("view_to_click", "click_to_purchase"))
    lat.values.foreach { r =>
      assert(r.getAs[Long]("n_users") > 0)
      assert(r.getAs[Double]("p50_secs") > 0.0)
      assert(r.getAs[Double]("p90_secs") >= r.getAs[Double]("p50_secs"))
    }
    // earliest-path semantics shared with funnelStages: stage-2 user
    // count equals the funnel's click-stage count
    val stages = Behavior.funnelStages(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_users"))
      .toMap
    assert(lat("view_to_click").getAs[Long]("n_users") === stages("click"))
    assert(lat("click_to_purchase").getAs[Long]("n_users") === stages("purchase"))
  }

  test("sessionDurations: multi-event counts complement bounceRate's") {
    val dur = Behavior.sessionDurations(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("n_multi")).toMap
    val bou = Behavior.bounceRate(spark, dir).collect()
      .map(r => r.getDate(0).toString ->
        (r.getAs[Long]("n_sessions") - r.getAs[Long]("n_bounces"))).toMap
    // every day with a multi-event session agrees; days of pure bounces
    // are absent from the duration report
    dur.foreach { case (d, n) => assert(bou(d) === n) }
    assert(bou.filter(_._2 > 0).keySet === dur.keySet)
    // durations are positive for multi-event sessions
    Behavior.sessionDurations(spark, dir).collect().foreach { r =>
      assert(r.getAs[Double]("p90_secs") >= r.getAs[Double]("p50_secs"))
      assert(r.getAs[Double]("p50_secs") >= 0.0)
    }
  }

  test("returnRateWilson: bound shrinks toward zero and never exceeds phat") {
    val out = graft.operators.Joins.returnRateWilson(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rate, lb) = (r.getAs[Double]("return_rate"),
        r.getAs[Double]("wilson_lb"))
      assert(lb <= rate + 1e-9, s"wilson above phat: $lb > $rate")
      assert(lb >= 0.0 - 1e-9)
      assert(r.getAs[Long]("n_returned") <= r.getAs[Long]("n_lines"))
    }
  }

  test("diffInDiff: estimate equals the four-cell arithmetic identity") {
    val r = Behavior.diffInDiff(spark, dir).head()
    // recompute from daily means directly
    val daily = Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "view"))
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("d"))
      .count().collect()
      .map(x => (x.getString(0), x.getDate(1).toString, x.getLong(2)))
    def mean(t: String, post: Boolean) = {
      val v = daily.filter(x => x._1 == t &&
        (x._2 >= "2024-01-16") == post).map(_._3.toDouble)
      v.sum / v.length
    }
    val want = (mean("purchase", true) - mean("purchase", false)) -
      (mean("view", true) - mean("view", false))
    assert(math.abs(r.getAs[Double]("did_estimate") - want) < 1e-3)
    assert(r.getAs[Double]("se") > 0.0)
  }

  test("runsTest: runs bounded by sign count; z finite") {
    val r = Relational.runsTest(spark, dir).head()
    val (runs, n1, n2) = (r.getAs[Long]("n_runs"),
      r.getAs[Long]("n_above"), r.getAs[Long]("n_below"))
    assert(runs >= 1 && runs <= n1 + n2)
    // above/below counts of a median split differ by at most the ties
    assert(math.abs(n1 - n2) <= 2)
    assert(!r.getAs[Double]("z_score").isNaN)
  }

  test("negativeSample: reproducible, never a positive, exactly k per user") {
    val out = Relational.negativeSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // run twice: deterministic membership
    val again = Relational.negativeSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === again.toSeq)
    // no sampled negative was ever bought
    val bought = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall { case (c, _, p) => !bought((c, p)) })
    // per-customer counts never exceed k (k=3)
    assert(out.groupBy(_._1).values.forall(_.length <= 3))
  }

  test("jackknifeSE tracks the classical SE of the mean") {
    val r = Relational.jackknifeSE(spark, dir).head()
    assert(r.getAs[Long]("n_buckets") === 32L)
    val vals = Tables.orders(spark, dir).select("o_totalprice")
      .collect().map(_.getDouble(0))
    val m = vals.sum / vals.length
    val sd = math.sqrt(vals.map(v => (v - m) * (v - m)).sum / (vals.length - 1))
    val classical = sd / math.sqrt(vals.length.toDouble)
    val jk = r.getAs[Double]("jackknife_se")
    // same order: jackknife over equal-ish buckets ~ classical SE
    assert(jk > classical * 0.5 && jk < classical * 2.0,
      s"jk=$jk classical=$classical")
  }

  test("cohensD: sign matches the mean difference; pooled SD positive") {
    val r = Behavior.cohensD(spark, dir).head()
    val means = Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type")
        .isin("purchase", "click"))
      .groupBy("event_type")
      .avg("value").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    val d = r.getAs[Double]("cohens_d")
    assert(math.signum(d) ==
      math.signum(means("purchase") - means("click")) || d == 0.0)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
  }

  test("simpsonAudit: flip count bounded by group count") {
    val r = Relational.simpsonAudit(spark, dir).head()
    assert(r.getAs[Long]("n_flipped") <= r.getAs[Long]("n_groups"))
    val oc = r.getAs[Double]("overall_corr")
    assert(oc >= -1.0 && oc <= 1.0)
  }

  test("growthAccounting: the actives identity holds every week") {
    val rows = Behavior.growthAccounting(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // actives = new + retained + resurrected, by construction
      assert(r.getAs[Long]("n_active") ===
        r.getAs[Long]("new_users") + r.getAs[Long]("retained") +
          r.getAs[Long]("resurrected"))
      assert(r.getAs[Long]("churned") >= 0L)
    }
    // cross-check against weeklyChurn: churned(t) / actives(t-1)
    val weeks = rows.sortBy(_.getDate(0).toLocalDate.toEpochDay)
    weeks.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(1).getAs[Long]("churned") ===
          p(0).getAs[Long]("n_active") - p(1).getAs[Long]("retained"))
    }
  }

  test("stickiness: DAU never exceeds WAU; ratio in (0,1]") {
    val rows = Behavior.stickiness(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      val x = r.getAs[Double]("stickiness")
      assert(x > 0.0 && x <= 1.0 + 1e-9)
    }
  }

  test("iqrFences: counts consistent and fences ordered") {
    val rows = Relational.iqrFences(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("q1") <= r.getAs[Double]("q3"))
      assert(r.getAs[Long]("n_low") + r.getAs[Long]("n_high") <=
        r.getAs[Long]("n"))
    }
  }

  test("experiment trio: MDE positive, SRM conserves users, CUPED bounded") {
    val mde = Behavior.minDetectableEffect(spark, dir).head()
    assert(mde.getAs[Double]("mde_abs") > 0.0)
    assert(mde.getAs[Double]("pooled_sd") > 0.0)
    // MDE shrinks with more samples: rel > abs/mean consistency
    assert(mde.getAs[Double]("mde_rel") > 0.0)

    val srm = Behavior.sampleRatioCheck(spark, dir).head()
    assert(srm.getAs[Long]("n_a") + srm.getAs[Long]("n_b") ===
      Tables.events(spark, dir)
        .select("user_id").distinct().count())

    val cuped = Behavior.cupedAdjustment(spark, dir).head()
    val vr = cuped.getAs[Double]("var_reduction")
    // CUPED with the OLS theta can never increase variance
    assert(vr >= 0.0 - 1e-9 && vr <= 1.0)
    assert(cuped.getAs[Long]("n_users") > 0)
  }

  test("anovaTypes: F non-negative, eta_sq in [0,1], groups counted") {
    val r = Behavior.anovaTypes(spark, dir).head()
    assert(r.getAs[Long]("k") ===
      Tables.events(spark, dir).select("event_type").distinct().count())
    assert(r.getAs[Long]("n") === Tables.events(spark, dir).count())
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val e = r.getAs[Double]("eta_sq")
    assert(e >= 0.0 && e <= 1.0)
  }

  test("durbinWatson: statistic in [0,4]; relates to lag-1 autocorr") {
    val r = Relational.durbinWatson(spark, dir).head()
    val dw = r.getAs[Double]("dw")
    assert(dw >= 0.0 && dw <= 4.0)
    // DW ~ 2(1 - rho1): check against revenueAcf's lag-1 within tolerance
    val rho1 = Relational.revenueAcf(spark, dir).collect()
      .find(_.getInt(0) == 1).get.getAs[Double]("acf")
    assert(math.abs(dw - 2.0 * (1.0 - rho1)) < 0.25,
      s"dw=$dw vs 2(1-rho1)=${2 * (1 - rho1)}")
  }

  test("partialCorr: bounded; collapses to raw corr when confounder inert") {
    val r = Relational.partialCorr(spark, dir).head()
    val (raw, part) = (r.getAs[Double]("r_xy"),
      r.getAs[Double]("r_xy_given_z"))
    assert(math.abs(part) <= 1.0)
    assert(math.abs(raw) <= 1.0)
  }

  test("featureTable: lag features never reach forward") {
    val rows = Relational.featureTable(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_.getLong(0))
    byCust.values.foreach { ms =>
      val seq = ms.sortBy(_.getAs[Long]("month_idx"))
      seq.zipWithIndex.foreach { case (r, i) =>
        // lag1 equals the previous row's rev (or null at the head)
        if (i == 0) assert(r.isNullAt(r.fieldIndex("rev_lag1")))
        else assert(r.getAs[Double]("rev_lag1") ===
          seq(i - 1).getAs[Double]("rev"))
        // trailing mean covers at most 3 rows ending HERE
        val lo = math.max(0, i - 2)
        val want = seq.slice(lo, i + 1).map(_.getAs[Double]("rev"))
        val ma = want.sum / want.length
        assert(math.abs(r.getAs[Double]("rev_ma3") - ma) < 1e-3)
      }
    }
  }

  test("paretoShare: top-1% share never exceeds top-10% share") {
    val r = Relational.paretoShare(spark, dir).head()
    val (t10, t1) = (r.getAs[Double]("top10_share"),
      r.getAs[Double]("top1_share"))
    assert(t1 <= t10 + 1e-9)
    assert(t10 > 0.0 && t10 < 1.0)
    assert(r.getAs[Long]("n_customers") ===
      Tables.orders(spark, dir)
        .select("o_custkey").distinct().count())
  }

  test("woeIv: counts conserve lineitem; IV is the share-weighted WoE sum") {
    val rows = Relational.woeIv(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getAs[Long]("n_good") +
      r.getAs[Long]("n_bad")).sum
    assert(total === Tables.lineitem(spark, dir).count())
    // IV recomputed from the row-level counts
    val tg = rows.map(_.getAs[Long]("n_good")).sum.toDouble
    val tb = rows.map(_.getAs[Long]("n_bad")).sum.toDouble
    val iv = rows.map { r =>
      val (g, b) = (r.getAs[Long]("n_good") / tg, r.getAs[Long]("n_bad") / tb)
      (g - b) * math.log(g / b)
    }.sum
    assert(math.abs(rows.head.getAs[Double]("iv_total") - iv) < 1e-3)
    assert(iv >= 0.0) // IV is a sum of (p-q)ln(p/q) terms, each >= 0
  }

  test("entropyRate: conditioning can only reduce entropy") {
    val r = Behavior.entropyRate(spark, dir).head()
    val (cond, marg) = (r.getAs[Double]("cond_entropy"),
      r.getAs[Double]("marginal_entropy"))
    // H(next|cur) <= H(next), with equality iff memoryless
    assert(cond <= marg + 1e-9, s"cond=$cond marg=$marg")
    assert(cond >= 0.0)
    // marginal bounded by ln(#types)
    val k = Tables.events(spark, dir).select("event_type").distinct().count()
    assert(marg <= math.log(k.toDouble) + 1e-6)
    assert(r.getAs[Long]("n_transitions") > 0)
  }

  test("linesPerOrder: histogram conserves both orders and lineitems") {
    val rows = Relational.linesPerOrder(spark, dir).collect()
    assert(rows.nonEmpty)
    val orders = rows.map(_.getAs[Long]("n_orders")).sum
    assert(orders === Tables.lineitem(spark, dir)
      .select("l_orderkey").distinct().count())
    val lines = rows.map(r =>
      r.getAs[Long]("n_lines") * r.getAs[Long]("n_orders")).sum
    assert(lines === Tables.lineitem(spark, dir).count())
  }

  test("spearman/kendall: bounded, near-agreeing signs, exact pair counts") {
    val sp = Relational.spearmanCorr(spark, dir).head()
    val rho = sp.getAs[Double]("spearman_rho")
    assert(math.abs(rho) <= 1.0)
    assert(sp.getAs[Long]("n") === Tables.lineitem(spark, dir).count())
    val kd = Relational.kendallTau(spark, dir).head()
    val tau = kd.getAs[Double]("kendall_tau_b")
    assert(math.abs(tau) <= 1.0)
    // concordant+discordant never exceed all untied pairs
    val n = sp.getAs[Long]("n")
    assert(kd.getAs[Long]("n_concordant") + kd.getAs[Long]("n_discordant")
      <= n * (n - 1) / 2)
    // the two rank correlations agree in sign (or both ~0)
    assert(rho * tau >= -1e-4, s"rho=$rho tau=$tau disagree")
  }

  test("aucScore: AUC identity with Mann-Whitney U; bounded; conserves") {
    val r = Behavior.aucScore(spark, dir).head()
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") ===
      Tables.events(spark, dir).count())
    // from-scratch AUC: P(score_pos > score_neg) + 0.5 P(equal)
    val rows = Tables.events(spark, dir)
      .select("event_type", "value").collect()
      .map(x => (x.getString(0) == "purchase", x.getDouble(1)))
    val pos = rows.filter(_._1).map(_._2).sorted
    val neg = rows.filter(!_._1).map(_._2).sorted
    // count pairs via merge over sorted distinct values (exact)
    var wins = 0.0
    var j = 0; var eq = 0
    // O(P log N) reference with binary search
    def lowerBound(a: Array[Double], v: Double): Int = {
      var lo = 0; var hi = a.length
      while (lo < hi) { val m = (lo + hi) / 2; if (a(m) < v) lo = m + 1 else hi = m }
      lo
    }
    def upperBound(a: Array[Double], v: Double): Int = {
      var lo = 0; var hi = a.length
      while (lo < hi) { val m = (lo + hi) / 2; if (a(m) <= v) lo = m + 1 else hi = m }
      lo
    }
    pos.foreach { p =>
      val lt = lowerBound(neg, p)
      val le = upperBound(neg, p)
      wins += lt + 0.5 * (le - lt)
    }
    val want = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - want) < 1e-4, s"auc=$auc want=$want")
  }

  test("bounceRate: bounces never exceed sessions; rate in [0,1]") {
    val out = Behavior.bounceRate(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val rate = r.getAs[Double]("bounce_rate")
      r.getLong(2) <= r.getLong(1) && rate >= 0.0 && rate <= 1.0
    })
    // total sessions across days equals the sessionize count
    val totalSessions = out.map(_.getLong(1)).sum
    assert(totalSessions ==
      graft.operators.Windows.sessionize(spark, dir).count())
  }

  test("jarqueBera matches a from-scratch four-moment recomputation") {
    val xs = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag",
        "l_extendedprice * (1.0 - l_discount) / 50000.0 AS x")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1)
    val got = graft.operators.Stats.jarqueBera(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    xs.foreach { case (seg, rows) =>
      val v = rows.map(_._2); val n = v.length.toDouble
      val mu = v.sum / n
      val m2 = v.map(x => (x - mu) * (x - mu)).sum / n
      val m3 = v.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = v.map(x => math.pow(x - mu, 4)).sum / n
      val sk = m3 / math.pow(m2, 1.5)
      val ek = m4 / (m2 * m2) - 3.0
      val r = got(seg)
      assert(r.getAs[Long]("n") == v.length)
      assert(math.abs(r.getAs[Double]("skewness") - sk) < 1e-3)
      assert(math.abs(r.getAs[Double]("excess_kurtosis") - ek) < 1e-3)
      assert(math.abs(r.getAs[Double]("jb_stat") -
        n / 6.0 * (sk * sk + ek * ek / 4.0)) < 0.5) // n/6 amplifies 1e-4
    }
  }

  test("ljungBox Q equals n(n+2)*sum(rho_k^2/(n-k)) from revenueAcf") {
    val acf = Relational.revenueAcf(spark, dir).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    val nDays = Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")))
      .distinct().count().toDouble
    val want = nDays * (nDays + 2) *
      (1 to 7).map(k => acf(k) * acf(k) / (nDays - k)).sum
    val got = graft.operators.Stats.ljungBox(spark, dir).head()
    assert(got.getAs[Long]("n_days") == nDays.toLong)
    assert(got.getAs[Int]("df") == 7)
    assert(math.abs(got.getAs[Double]("q_stat") - want) < 0.01)
  }

  test("pacf lag-1 equals acf lag-1; all pacf values are 1-bounded") {
    val acf1 = Relational.revenueAcf(spark, dir).collect()
      .find(_.getAs[Int]("lag") == 1).get.getAs[Double]("acf")
    val got = graft.operators.Stats.pacfRevenue(spark, dir).head()
    assert(math.abs(got.getAs[Double]("pacf1") - acf1) < 1e-9)
    Seq("pacf1", "pacf2", "pacf3").foreach { c =>
      assert(math.abs(got.getAs[Double](c)) <= 1.0)
    }
  }

  test("kruskalWallis: two identical groups give H ~ 0; df = k-1") {
    val got = graft.operators.Stats.kruskalWallis(spark, dir).head()
    assert(got.getAs[Long]("df") ==
      Tables.nation(spark, dir).select("n_regionkey").distinct()
        .count() - 1)
    assert(got.getAs[Long]("n") ==
      Tables.orders(spark, dir).count())
    // H is non-negative and bounded by n-1 (attained only when every
    // group occupies a disjoint rank block)
    val h = got.getAs[Double]("h_stat")
    assert(h >= 0.0 && h < got.getAs[Long]("n").toDouble)
  }

  test("leveneBf: from-scratch Brown-Forsythe F on bucketed totals") {
    import org.apache.spark.sql.functions._
    val rows = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_regionkey"), floor(col("o_totalprice") / 1000).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2.toDouble).sorted }
    val zs = rows.toSeq.flatMap { case (g, v) =>
      val n = v.length
      val med = (v((n + 1) / 2 - 1) + v(n / 2)) / 2.0 // lower-mid + upper-mid
      v.map(x => (g, math.abs(x - med)))
    }
    val k = rows.size.toDouble; val n = zs.length.toDouble
    val zbarAll = zs.map(_._2).sum / n
    val byG = zs.groupBy(_._1).map { case (g, v) =>
      (v.length.toDouble, v.map(_._2).sum / v.length,
        v.map(_._2).map(z => z * z).sum - math.pow(v.map(_._2).sum, 2) / v.length)
    }
    val between = byG.map { case (ng, zg, _) =>
      ng * (zg - zbarAll) * (zg - zbarAll) }.sum / (k - 1)
    val within = byG.map(_._3).sum / (n - k)
    val got = graft.operators.Stats.leveneBf(spark, dir).head()
    assert(got.getAs[Long]("n") == n.toLong)
    assert(got.getAs[Long]("df_between") == (k - 1).toLong)
    assert(math.abs(got.getAs[Double]("f_stat") - between / within) < 1e-3)
  }
}
