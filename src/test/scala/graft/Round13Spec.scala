package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operator specs for the round-13 batch: regularity/complexity
  * screens (sample/permutation entropy), Watson U² circular EDF,
  * the Siegel-Tukey / Cucconi / BWS two-sample family, Yule's K,
  * Katz centrality, kernel MMD. Each test pins a semantic property
  * the DuckDB oracle cannot see (the oracle replays the same
  * arithmetic; these assert the arithmetic is the RIGHT one). */
class Round13Spec extends AnyFunSuite {
  private def s = TestSpark.spark
  private def d = TestSpark.sfDir

  test("sampleEntropy: A <= B (3-day match implies 2-day match), sampen >= 0") {
    val r = graft.operators.Stats.sampleEntropy(s, d).collect().head
    val b = r.getAs[Long]("b_count"); val a = r.getAs[Long]("a_count")
    assert(r.getAs[Long]("n_days") > 0L)
    assert(a <= b && a > 0L)
    assert(r.getAs[Double]("sampen") >= 0.0)
  }

  test("permEntropy: valid ordinal pattern, entropy within [0, ln 6]") {
    val r = graft.operators.Stats.permEntropy(s, d).collect().head
    val valid = Set(123, 132, 213, 231, 312, 321)
    assert(valid.contains(r.getAs[Int]("top_pattern")))
    val h = r.getAs[Double]("entropy")
    assert(h >= 0.0 && h <= math.log(6.0) + 1e-9)
    val nh = r.getAs[Double]("norm_entropy")
    assert(nh >= 0.0 && nh <= 1.0 + 1e-9)
    assert(r.getAs[Double]("top_p") >= 1.0 / 6.0 - 1e-9)
  }

  test("watsonU2: positive statistic, day-fraction mean in (0,1)") {
    val rows = graft.operators.Stats.watsonU2(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L)
      val mf = r.getAs[Double]("mean_frac")
      assert(mf > 0.0 && mf < 1.0)
      // U² = Σ(...)² + 1/12n − n(ū−½)² is strictly positive
      assert(r.getAs[Double]("u2_stat") > 0.0)
    }
  }

  // crafted two-sample fixtures: purchases mid-range (tight), clicks
  // at the extremes (spread) — a pure SCALE difference
  private lazy val scaleDir = TestSpark.eventsFixture(
    (1 to 8).map(i => (i.toLong, 1L, "click",
      java.lang.Double.valueOf(if (i <= 4) i else 96.0 + i), 1000L + i)) ++
    (9 to 16).map(i => (i.toLong, 1L, "purchase",
      java.lang.Double.valueOf(41.0 + i), 1000L + i)))

  test("siegelTukey: middle-clustered group takes the high alternating ranks") {
    val r = graft.operators.Behavior.siegelTukey(s, scaleDir).collect().head
    assert(r.getAs[Long]("n1") === 8L && r.getAs[Long]("n2") === 8L)
    // purchases sit mid-range -> high Siegel-Tukey ranks -> z > 0
    assert(r.getAs[Double]("z_stat") > 1.5)
    // rank-sum conservation: W_A + W_B = N(N+1)/2 (swap the groups)
    val rs = graft.operators.Behavior
      .siegelTukey(s, scaleDir, typeA = "click", typeB = "purchase")
      .collect().head
    assert(r.getAs[Double]("w_stat") + rs.getAs[Double]("w_stat")
      === 16.0 * 17.0 / 2.0)
  }

  test("cucconi: location shift drives U and V apart, C large; rho < 0") {
    val shift = TestSpark.eventsFixture(
      (1 to 10).map(i => (i.toLong, 1L, "click",
        java.lang.Double.valueOf(i.toDouble), 1000L + i)) ++
      (11 to 20).map(i => (i.toLong, 1L, "purchase",
        java.lang.Double.valueOf(90.0 + i), 1000L + i)))
    val r = graft.operators.Behavior.cucconiTest(s, shift).collect().head
    assert(r.getAs[Double]("rho") < 0.0)
    // purchases all above clicks: U > 0 (big ΣR²), V < 0
    assert(r.getAs[Double]("u_stat") > 0.0)
    assert(r.getAs[Double]("v_stat") < 0.0)
    assert(r.getAs[Double]("c_stat") > 3.0)
  }

  test("bwsTest: identical samples score near zero, shifted samples high") {
    val same = TestSpark.eventsFixture(
      (1 to 10).map(i => (i.toLong, 1L, "click",
        java.lang.Double.valueOf((i % 5).toDouble), 1000L + i)) ++
      (11 to 20).map(i => (i.toLong, 1L, "purchase",
        java.lang.Double.valueOf((i % 5).toDouble), 1000L + i)))
    val b0 = graft.operators.Behavior.bwsTest(s, same).collect().head
      .getAs[Double]("bws_stat")
    val shift = TestSpark.eventsFixture(
      (1 to 10).map(i => (i.toLong, 1L, "click",
        java.lang.Double.valueOf(i.toDouble), 1000L + i)) ++
      (11 to 20).map(i => (i.toLong, 1L, "purchase",
        java.lang.Double.valueOf(50.0 + i), 1000L + i)))
    val b1 = graft.operators.Behavior.bwsTest(s, shift).collect().head
      .getAs[Double]("bws_stat")
    assert(b0 > 0.0 && b1 > b0)
  }

  test("yuleK: exact on a hand-computed frequency profile") {
    val dir = TestSpark.documentsFixture(Seq(
      (1L, "a a a a b", "en", "web"),       // N=5, f={4,1}, m2=17
      (2L, "x y z w v u t s q p", "en", "books"))) // all distinct: K=0
    val rows = graft.operators.TextAnalysis.yuleK(s, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab"),
          r.getAs[Double]("yule_k")))).toMap
    assert(rows("web") === ((5L, 2L, 10000.0 * (17 - 5) / 25.0)))
    assert(rows("books") === ((10L, 10L, 0.0)))
  }

  test("katzCentrality: every score >= 1 (beta floor), degree-monotone mass") {
    val rows = graft.operators.Graph.katzCentrality(s, d).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("katz") >= 1.0))
    // at least one node accumulated neighbor mass
    assert(rows.exists(_.getAs[Double]("katz") > 1.0))
  }

  test("bleuPairs: same pair set as ROUGE, bounded by BP and precisions") {
    val bleu = graft.operators.TextAnalysis.bleuPairs(s, d).collect()
    val rouge = graft.operators.TextAnalysis.rougePairs(s, d).count()
    assert(bleu.length.toLong === rouge)
    bleu.foreach { r =>
      val bp = r.getAs[Double]("brevity_penalty")
      val b2 = r.getAs[Double]("bleu2")
      assert(bp > 0.0 && bp <= 1.0)
      assert(b2 >= 0.0 && b2 <= bp + 1e-9)
      val p1 = r.getAs[Double]("p1"); val p2 = r.getAs[Double]("p2")
      // geometric-mean bound (4dp slack for the independent roundings)
      if (b2 > 0) assert(b2 <= math.sqrt(p1 * p2) + 2e-4)
    }
  }

  test("hoeffdingD: revenue and order count are dependent (D > 0), D bounded") {
    val r = graft.operators.Dependence.hoeffdingD(s, d).collect().head
    val hd = r.getAs[Double]("hoeffding_d")
    assert(hd > 0.0)            // daily revenue tracks daily order count
    // 1/30 is the no-ties maximum; the tied y-axis (integer counts)
    // inflates the tie-convention D, so only the loose bound holds
    assert(hd < 1.0)
    assert(r.getAs[Long]("n_days") > 100L)
  }

  test("skellamFit: moment identities mu_up - mu_down = mean, sum = var") {
    val r = graft.operators.Stats.skellamFit(s, d).collect().head
    val mu1 = r.getAs[Double]("mu_up"); val mu2 = r.getAs[Double]("mu_down")
    assert(math.abs(mu1 - mu2 - r.getAs[Double]("mean_delta")) < 2e-4)
    assert(math.abs(mu1 + mu2 - r.getAs[Double]("var_delta")) < 2e-4)
    val zf = r.getAs[Double]("obs_zero_frac")
    assert(zf >= 0.0 && zf <= 1.0)
    assert(r.getAs[Double]("fit_log10_p0") < 0.0) // a probability
  }

  test("centroidClassifier: synthetic clusters separate by their means") {
    val rows = graft.operators.Similarity.centroidClassifier(s, d).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 500L)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n"))
    }
    // the label clusters overlap heavily by construction (the kNN gate
    // scores 0.14); centroids must still beat 10-class chance clearly
    val overall = rows.map(r => r.getAs[Long]("n_correct")).sum.toDouble / 500
    assert(overall > 0.25)
  }

  test("cliffsDelta: full separation scores ±1, identical samples 0") {
    val up = TestSpark.eventsFixture(
      (1 to 5).map(i => (i.toLong, 1L, "click",
        java.lang.Double.valueOf(i.toDouble), 1000L + i)) ++
      (6 to 10).map(i => (i.toLong, 1L, "purchase",
        java.lang.Double.valueOf(100.0 + i), 1000L + i)))
    val r = graft.operators.Behavior.cliffsDelta(s, up).collect().head
    assert(r.getAs[Double]("cliffs_delta") === 1.0)
    assert(r.getAs[String]("magnitude") === "large")
    val same = TestSpark.eventsFixture(
      (1 to 5).map(i => (i.toLong, 1L, "click",
        java.lang.Double.valueOf(i.toDouble), 1000L + i)) ++
      (6 to 10).map(i => (i.toLong, 1L, "purchase",
        java.lang.Double.valueOf((i - 5).toDouble), 1000L + i)))
    val r0 = graft.operators.Behavior.cliffsDelta(s, same).collect().head
    assert(r0.getAs[Double]("cliffs_delta") === 0.0)
    assert(r0.getAs[String]("magnitude") === "negligible")
  }

  test("seasonalKendall: exact S and variance on a crafted monotone panel") {
    // 3 years x 12 months, revenue strictly increasing by year within
    // every month (y-2019 orders per cell at fixed price): S_m = 3 per
    // month, var_m = 3*2*11/18, no ties
    val rows = for {
      y <- 2020 to 2022; m <- 1 to 12; k <- 1 to (y - 2019)
    } yield (1L, f"$y-$m%02d-15")
    val dir = TestSpark.ordersFixture(rows)
    val r = graft.operators.Stats.seasonalKendall(s, dir).collect().head
    assert(r.getAs[Long]("n_seasons") === 12L)
    assert(r.getAs[Long]("s_stat") === 36L)
    assert(math.abs(r.getAs[Double]("variance") - 12 * 3 * 2 * 11 / 18.0) < 1e-6)
    assert(r.getAs[Double]("z_stat") > 5.0)
  }

  test("seasonalSenSlope: exact median slope on the crafted monotone panel") {
    // same panel as the Kendall spec: revenue per (y,m) cell is
    // price(100)·(y−2019)/1e6 $M, so every within-month slope is one
    // of 0.0001 (1-year gaps, 24 of them at 4dp = 100/1e6) or 0.0001
    // (2-year gap: 200/2 = 100) — all slopes equal, median exact
    val rows = for {
      y <- 2020 to 2022; m <- 1 to 12; k <- 1 to (y - 2019)
    } yield (1L, f"$y-$m%02d-15")
    val dir = TestSpark.ordersFixture(rows)
    val r = graft.operators.Stats.seasonalSenSlope(s, dir).collect().head
    assert(r.getAs[Long]("n_slopes") === 36L) // 12 months x C(3,2)
    assert(r.getAs[Double]("sen_slope") === 0.0001)
    assert(r.getAs[Double]("min_month_slope") === 0.0001)
    assert(r.getAs[Double]("max_month_slope") === 0.0001)
  }

  test("tdigestQuantiles: exact median on uncompressed data, tight ranks at scale") {
    val sp = s
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // 1..101 — far below the compression budget: every point its own
    // centroid, so the midpoint-rule estimate is the exact median
    val tiny = (1 to 101).map(_.toDouble).toDF("v")
    val q = tiny.agg(graft.functions.TDigestFunctions
        .tdigestQuantiles(col("v"), Seq(0.5)).as("tq"))
      .collect().head.getSeq[Double](0)
    assert(math.abs(q.head - 51.0) < 1e-9)
    // 100k skewed values across partitions: rank error of the p50/p99
    // estimates must stay inside the sketch's band
    val big = sp.range(1, 100001).select(
      (col("id") % 1000 * col("id") % 997).cast("double").as("v"))
      .repartition(8)
    val r = big.agg(graft.functions.TDigestFunctions
        .tdigestQuantiles(col("v"), Seq(0.5, 0.99)).as("tq"),
      expr("percentile(v, 0.47)").as("lo50"),
      expr("percentile(v, 0.53)").as("hi50"),
      expr("percentile(v, 0.985)").as("lo99"),
      expr("percentile(v, 0.995)").as("hi99")).collect().head
    val tq = r.getSeq[Double](r.fieldIndex("tq"))
    assert(tq(0) >= r.getAs[Double]("lo50") && tq(0) <= r.getAs[Double]("hi50"))
    assert(tq(1) >= r.getAs[Double]("lo99") && tq(1) <= r.getAs[Double]("hi99"))
  }

  test("mmdDrift: zero for identical populations, positive under separation") {
    def vec(x: Float) = Array(x, 0f, 0f, 0f)
    val same = TestSpark.embeddingsFixture(
      (1 to 6).map(i => (i.toLong, vec(i.toFloat / 10), if (i <= 3) 0 else 1)))
    // labels 0/1 hold DIFFERENT vectors here; rebuild so multisets match
    val sameEq = TestSpark.embeddingsFixture(
      Seq((1L, vec(0.1f), 0), (2L, vec(0.2f), 0), (3L, vec(0.3f), 0),
        (4L, vec(0.1f), 1), (5L, vec(0.2f), 1), (6L, vec(0.3f), 1)))
    val m0 = graft.operators.Similarity.mmdDrift(s, sameEq).collect().head
    assert(m0.getAs[Long]("n_a") === 3L && m0.getAs[Long]("n_b") === 3L)
    assert(math.abs(m0.getAs[Double]("mmd2")) < 1e-9)
    val apart = TestSpark.embeddingsFixture(
      Seq((1L, vec(5f), 0), (2L, vec(5.1f), 0), (3L, vec(4.9f), 0),
        (4L, vec(-5f), 1), (5L, vec(-5.1f), 1), (6L, vec(-4.9f), 1)))
    val m1 = graft.operators.Similarity.mmdDrift(s, apart).collect().head
    assert(m1.getAs[Double]("mmd2") > 0.5)
    assert(same.nonEmpty) // fixture helper exercised
  }
}
