package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

/** Semantics checks for the closed-form model-fit gates (multiple
  * OLS, Theil index, CUSUM, Mahalanobis) against from-scratch Scala
  * recomputations on sf0.001. Values are oracle-gated in the
  * registry; these pin the STATISTICAL definitions (normal equations,
  * mean-log identity, prefix normalization, sample covariance).
  */
class StatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("olsMulti matches a from-scratch normal-equation solve") {
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag", "CAST(l_quantity AS DOUBLE)",
        "CAST(l_discount AS DOUBLE)",
        "l_extendedprice * (1.0 - l_discount)")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
      .filter(_._1 == "R")
    // unscaled normal equations on centered predictors
    val n = rows.length.toDouble
    val (mx1, mx2, my) = (rows.map(_._2).sum / n, rows.map(_._3).sum / n,
      rows.map(_._4).sum / n)
    var (c11, c12, c22, c1y, c2y) = (0.0, 0.0, 0.0, 0.0, 0.0)
    rows.foreach { case (_, x1, x2, y) =>
      val (d1, d2, dy) = (x1 - mx1, x2 - mx2, y - my)
      c11 += d1 * d1; c12 += d1 * d2; c22 += d2 * d2
      c1y += d1 * dy; c2y += d2 * dy
    }
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val b0 = my - b1 * mx1 - b2 * mx2
    val got = Stats.olsMulti(spark, dir).filter("seg = 'R'").head()
    assert(got.getAs[Long]("n") == rows.length)
    assert(math.abs(got.getAs[Double]("b_quantity") - b1) < 1e-2)
    assert(math.abs(got.getAs[Double]("b_discount") - b2) < 1.0)
    assert(math.abs(got.getAs[Double]("b0") - b0) < 1e-2)
    // discount enters revenue multiplicatively: the fitted slope must
    // be negative and near -avg(extendedprice)
    assert(b2 < 0.0)
  }

  test("theilIndex matches the direct definition per region") {
    val custRegion = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .join(Tables.region(spark, dir),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .selectExpr("c_custkey", "r_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rev = Tables.orders(spark, dir)
      .selectExpr("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val byRegion = rev.toSeq.groupBy { case (k, _) => custRegion(k) }
    val got = Stats.theilIndex(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    byRegion.foreach { case (region, xs) =>
      val n = xs.length.toDouble
      val mu = xs.map(_._2).sum / n
      val want = xs.map { case (_, x) =>
        (x / (n * mu)) * math.log(x / mu) }.sum
      val row = got(region)
      assert(row.getAs[Long]("n_cust") == xs.length)
      assert(math.abs(row.getAs[Double]("theil_t") - want) < 1e-3,
        s"$region: got ${row.getAs[Double]("theil_t")} want $want")
      // Theil T is non-negative (Jensen)
      assert(row.getAs[Double]("theil_t") >= 0.0)
    }
  }

  test("cusumRevenue extremum matches a from-scratch prefix scan") {
    val daily = Tables.orders(spark, dir)
      .groupBy(org.apache.spark.sql.functions
        .to_date(org.apache.spark.sql.functions.col("o_orderdate"))
        .as("d"))
      .agg(org.apache.spark.sql.functions
        .sum("o_totalprice").as("rev"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1)))
      .sortBy(_._1)
    val n = daily.length.toDouble
    val mu = daily.map(_._2).sum / n
    val sigma = math.sqrt(daily.map(x => (x._2 - mu) * (x._2 - mu)).sum / n)
    var acc = 0.0
    val cs = daily.map { case (d, r) => acc += r - mu
      (d, math.abs(acc) / (sigma * math.sqrt(n))) }
    val wantTop = cs.maxBy(_._2)
    val got = Stats.cusumRevenue(spark, dir).head()
    assert(got.getDate(0).toString == wantTop._1)
    assert(math.abs(got.getAs[Double]("abs_cusum") - wantTop._2) < 1e-3)
  }

  test("mahalanobis top outlier matches a from-scratch 2x2 solve") {
    val prof = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("o_totalprice").as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toDouble, r.getDouble(2)))
    val n = prof.length.toDouble
    val m1 = prof.map(_._2).sum / n
    val m2 = prof.map(_._3).sum / n
    var (c11, c12, c22) = (0.0, 0.0, 0.0)
    prof.foreach { case (_, f1, f2) =>
      c11 += (f1 - m1) * (f1 - m1); c12 += (f1 - m1) * (f2 - m2)
      c22 += (f2 - m2) * (f2 - m2) }
    c11 /= (n - 1); c12 /= (n - 1); c22 /= (n - 1)
    val det = c11 * c22 - c12 * c12
    val d2s = prof.map { case (k, f1, f2) =>
      val (d1, d2) = (f1 - m1, f2 - m2)
      (k, (c22 * d1 * d1 - 2 * c12 * d1 * d2 + c11 * d2 * d2) / det) }
    val want = d2s.maxBy(x => (x._2, -x._1))
    val got = Stats.mahalanobisOutliers(spark, dir).head()
    assert(got.getAs[Long]("custkey") == want._1)
    assert(math.abs(got.getAs[Double]("mahalanobis_d2") - want._2) < 1e-3)
  }

  test("isotonic minimax fit equals a from-scratch PAVA sweep") {
    val got = Stats.isotonicReturnRate(spark, dir).collect()
      .map(r => (r.getAs[Double]("d"), r.getAs[Long]("n"),
        r.getAs[Double]("rate"), r.getAs[Double]("iso_fit")))
      .sortBy(_._1)
    // classic pool-adjacent-violators on (rate, weight)
    case class Block(var sum: Double, var w: Double, var pts: Int)
    val stack = scala.collection.mutable.ArrayBuffer[Block]()
    got.foreach { case (_, n, rate, _) =>
      stack += Block(rate * n, n.toDouble, 1)
      while (stack.length >= 2 && {
        val a = stack(stack.length - 2); val b = stack.last
        a.sum / a.w >= b.sum / b.w
      }) {
        val b = stack.remove(stack.length - 1)
        stack.last.sum += b.sum; stack.last.w += b.w
        stack.last.pts += b.pts
      }
    }
    val expanded = stack.toSeq.flatMap(b =>
      Seq.fill(b.pts)(b.sum / b.w))
    assert(expanded.length == got.length)
    got.zip(expanded).foreach { case ((d, _, _, fit), want) =>
      assert(math.abs(fit - want) < 1e-3, s"d=$d fit=$fit want=$want")
    }
    // monotone non-decreasing
    got.map(_._4).toSeq.sliding(2).foreach { w =>
      assert(w.head <= w.last + 1e-9)
    }
  }

  test("haar level-1 coefficients reconstruct the monthly pairs") {
    import org.apache.spark.sql.functions._
    val monthly = Tables.orders(spark, dir)
      .groupBy((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate"))).as("m"))
      .agg(sum("o_totalprice").as("v"))
      .orderBy("m").collect().map(_.getDouble(1)).take(64)
    val got = Stats.haarWavelet(spark, dir).collect()
    val l1 = got.filter(_.getInt(0) == 1)
      .map(r => (r.getAs[Long]("i"),
        r.getAs[Double]("approx"), r.getAs[Double]("detail")))
      .sortBy(_._1)
    assert(l1.length == monthly.length / 2)
    l1.foreach { case (i, a, d) =>
      val even = monthly(2 * i.toInt); val odd = monthly(2 * i.toInt + 1)
      assert(math.abs(a + d - even) < 1e-2, s"i=$i even")
      assert(math.abs(a - d - odd) < 1e-2, s"i=$i odd")
    }
    assert(got.count(_.getInt(0) == 2) == l1.length / 2)
    assert(got.count(_.getInt(0) == 3) == l1.length / 4)
  }

  test("sax symbols respect the breakpoint cuts and z is standardized") {
    val rows = Stats.saxSymbols(spark, dir).collect()
      .map(r => (r.getAs[Double]("z"), r.getString(2)))
    rows.foreach { case (z, sym) =>
      val want = if (z < -0.6745) "a" else if (z < 0.0) "b"
        else if (z < 0.6745) "c" else "d"
      // rounded z sitting exactly on a cut may disagree with the raw
      // cut decision; allow the neighbour symbol there
      assert(sym == want ||
        math.abs(z + 0.6745) < 1e-3 || math.abs(z) < 1e-3 ||
        math.abs(z - 0.6745) < 1e-3, s"z=$z sym=$sym")
    }
    val zs = rows.map(_._1)
    assert(math.abs(zs.sum / zs.length) < 1e-3)
    assert(rows.map(_._2).distinct.sorted.sameElements(
      rows.map(_._2).distinct.sorted.distinct))
  }

  test("bootstrapCi brackets the point estimate with 32 replicates") {
    val r = Stats.bootstrapCi(spark, dir).head()
    assert(r.getAs[Long]("n_reps") == 32L)
    val (lo, mid, hi) = (r.getAs[Double]("ci_lo"),
      r.getAs[Double]("boot_mean"), r.getAs[Double]("ci_hi"))
    assert(lo <= mid && mid <= hi)
    // the interval is tight around the plain mean at this SF
    val plain = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum("o_totalprice").as("x"))
      .agg(org.apache.spark.sql.functions.avg("x")).head().getDouble(0)
    assert(lo < plain && plain < hi,
      s"plain=$plain outside [$lo, $hi]")
  }

  test("DtwKernel matches a from-scratch full-matrix DP") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def ref(a: Array[Double], b: Array[Double]): Double = {
      val d = Array.fill(a.length + 1, b.length + 1)(1e18)
      d(0)(0) = 0.0
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { _ =>
      val a = Array.fill(rnd.nextInt(30) + 1)(rnd.nextDouble() * 100)
      val b = Array.fill(rnd.nextInt(30) + 1)(rnd.nextDouble() * 100)
      val got = graft.functions.DtwKernel.dtw(
        new GenericArrayData(a), new GenericArrayData(b))
      assert(math.abs(got - ref(a, b)) < 1e-9)
      // identity and symmetry
      assert(graft.functions.DtwKernel.dtw(
        new GenericArrayData(a), new GenericArrayData(a)) == 0.0)
      val sym = graft.functions.DtwKernel.dtw(
        new GenericArrayData(b), new GenericArrayData(a))
      assert(math.abs(got - sym) < 1e-9)
    }
    // phase shift scores closer than Euclidean: a sine vs its lag
    val x = Array.tabulate(40)(i => math.sin(i / 4.0))
    val y = Array.tabulate(40)(i => math.sin((i - 3) / 4.0))
    val dtw = graft.functions.DtwKernel.dtw(
      new GenericArrayData(x), new GenericArrayData(y))
    val eu = x.zip(y).map { case (p, q) => math.abs(p - q) }.sum
    assert(dtw < eu)
  }

  test("regionDtw emits all 10 region pairs with zero self-distance semantics") {
    val rows = Stats.regionDtw(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Double]("dtw") >= 0.0)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("holtWinters emits a 12-month seasonal forecast") {
    val rows = Stats.holtWinters(spark, dir).collect()
    assert(rows.length == 12)
    assert(rows.map(_.getInt(0)).sorted.sameElements(1 to 12))
    val fs = rows.map(_.getAs[Double]("forecast"))
    assert(fs.forall(_ > 0.0))
    // the seasonal component must actually differentiate months:
    // a flat (Holt-only) model would make consecutive deltas constant
    val deltas = fs.sliding(2).map(w => w(1) - w(0)).toSeq
    assert(deltas.distinct.length > 1)
  }

  test("conformal interval covers ~90% of the held-out half") {
    val r = Stats.conformalOls(spark, dir).head()
    val total = Tables.lineitem(spark, dir).count()
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == total)
    // md5 split is ~50/50
    val frac = r.getAs[Long]("n_cal").toDouble / total
    assert(frac > 0.45 && frac < 0.55)
    assert(r.getAs[Double]("width_rev") > 0.0)
    val cov = r.getAs[Double]("coverage")
    assert(cov > 0.85 && cov < 0.95, s"coverage=$cov")
  }

  test("exactMedianBisect equals the sort-based exact median") {
    val want = Tables.lineitem(spark, dir)
      .selectExpr("percentile(l_extendedprice, 0.5)").head().getDouble(0)
    val got = Stats.exactMedianBisect(spark, dir).head()
    assert(math.abs(got.getAs[Double]("median") - want) < 1e-3,
      s"got ${got.getAs[Double]("median")} want $want")
    assert(got.getAs[Long]("n") ==
      Tables.lineitem(spark, dir).count())
  }

  test("itemItemCosine scores reconcile with raw co-counts") {
    val rows = graft.operators.Behavior.itemItemCosine(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getAs[Long]("nab"), r.getAs[Long]("na"),
        r.getAs[Long]("nb"))
      assert(nab >= 3 && nab <= math.min(na, nb))
      val want = nab.toDouble / math.sqrt(na.toDouble * nb)
      assert(math.abs(r.getAs[Double]("cosine") - want) < 1e-3)
      assert(r.getAs[Double]("cosine") <= 1.0)
    }
  }

  test("decisionStump picks the impurity-minimizing threshold") {
    val rows = Tables.lineitem(spark, dir)
      .selectExpr("CAST(l_quantity AS LONG)", "l_returnflag = 'R'")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val levels = rows.groupBy(_._1).map { case (q, xs) =>
      (q, xs.length.toLong, xs.count(_._2).toLong) }.toSeq.sortBy(_._1)
    val tn = levels.map(_._2).sum.toDouble
    val tr = levels.map(_._3).sum.toDouble
    def gini(r: Double, n: Double) =
      1.0 - (r / n) * (r / n) - ((n - r) / n) * ((n - r) / n)
    var (nl, rl) = (0.0, 0.0)
    val cands = levels.init.map { case (q, n, r) =>
      nl += n; rl += r
      (q, (nl * gini(rl, nl) + (tn - nl) * gini(tr - rl, tn - nl)) / tn)
    }
    val want = cands.minBy(c => (c._2, c._1))
    val got = Stats.decisionStump(spark, dir).head()
    assert(got.getAs[Long]("split_q") == want._1)
    assert(math.abs(got.getAs[Double]("gini_split") - want._2) < 1e-3)
    assert(got.getAs[Double]("gain") >= -1e-9)
  }

  test("overdispersion index is exact from integer daily counts") {
    val daily = Tables.events(spark, dir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS d")
      .collect().map(r => (r.getString(0), r.get(1).toString))
      .groupBy(identity).map(_._2.length)
    // recompute one type's index from scratch
    val perType = Tables.events(spark, dir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS d").collect()
      .map(r => (r.getString(0), r.get(1).toString))
      .groupBy(_._1).map { case (t, xs) =>
        val counts = xs.groupBy(_._2).map(_._2.length.toDouble).toSeq
        val m = counts.sum / counts.length
        val v = counts.map(c => c * c).sum / counts.length - m * m
        (t, v / m)
      }
    val got = Stats.overdispersion(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("dispersion_index"))
      .toMap
    perType.foreach { case (t, want) =>
      assert(math.abs(got(t) - want) < 1e-3, s"$t: ${got(t)} vs $want")
    }
  }

  test("ksTest matches a from-scratch ECDF scan on the same grid") {
    val rows = Tables.orders(spark, dir)
      .selectExpr("CAST(floor(o_totalprice/100) AS LONG)",
        "o_orderpriority = '1-URGENT'").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val buckets = rows.groupBy(_._1).map { case (b, xs) =>
      (b, xs.count(_._2).toLong, xs.count(!_._2).toLong) }
      .toSeq.sortBy(_._1)
    val t1 = buckets.map(_._2).sum.toDouble
    val t2 = buckets.map(_._3).sum.toDouble
    var (c1, c2, best) = (0L, 0L, 0.0)
    buckets.foreach { case (_, a, b) =>
      c1 += a; c2 += b
      best = math.max(best, math.abs(c1 / t1 - c2 / t2))
    }
    val got = Stats.ksTest(spark, dir).head()
    assert(math.abs(got.getAs[Double]("ks_d") - best) < 1e-3)
    assert(got.getAs[Long]("n_urgent") == t1.toLong)
  }

  test("mutualInfo is bounded by the marginal entropies") {
    val r = Stats.mutualInfo(spark, dir).head()
    val (mi, hx, hy) = (r.getAs[Double]("mi_nats"),
      r.getAs[Double]("h_x"), r.getAs[Double]("h_y"))
    assert(mi >= -1e-9)
    assert(mi <= math.min(hx, hy) + 1e-9)
    assert(hx > 0 && hy > 0)
  }

  test("cramersV is in [0,1] and consistent with its chi2") {
    val r = Stats.cramersV(spark, dir).head()
    val (n, dof, chi2, v) = (r.getAs[Long]("n"), r.getAs[Long]("dof"),
      r.getAs[Double]("chi2"), r.getAs[Double]("cramers_v"))
    assert(dof == 24 * 2) // 25 brands x 3 flags
    assert(v >= 0 && v <= 1)
    // V^2 * n * (min(r,c)-1) == chi2  (min dim = 3 flags)
    assert(math.abs(v * v * n * 2 - chi2) < chi2 * 0.01 + 1.0)
  }

  test("psiDrift contributions are non-negative and sum to the total") {
    val rows = Stats.psiDrift(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach(r =>
      assert(r.getAs[Double]("psi_contrib") >= -1e-9))
    val total = rows.head.getAs[Double]("psi_total")
    val sum = rows.map(_.getAs[Double]("psi_contrib")).sum
    assert(math.abs(total - sum) < 1e-3)
  }

  test("liftTable capture reaches 1 and rates reconcile with lift") {
    val rows = Stats.liftTable(spark, dir).collect()
    assert(rows.length == 10)
    // ordered from the top score bin down; final capture = 100%
    assert(math.abs(rows.last.getAs[Double]("cum_capture") - 1.0) < 1e-9)
    val tn = rows.map(_.getAs[Long]("n")).sum.toDouble
    val tr = rows.map(_.getAs[Long]("returns")).sum.toDouble
    rows.foreach { r =>
      val want = (r.getAs[Long]("returns").toDouble /
        r.getAs[Long]("n")) / (tr / tn)
      assert(math.abs(r.getAs[Double]("lift") - want) < 1e-3)
    }
  }

  test("calibration: bins conserve lineitem; ECE is the support-" +
    "weighted gap; Brier within [0,1]") {
    val rows = Stats.calibration(spark, dir).collect()
    val nLi = Tables.lineitem(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nLi)
    val ece = rows.head.getAs[Double]("ece")
    val wantEce = rows.map(r =>
      r.getAs[Long]("n") * math.abs(r.getAs[Double]("obs_rate") -
        r.getAs[Double]("mean_score"))).sum / nLi
    assert(math.abs(ece - wantEce) < 1e-3)
    val brier = rows.head.getAs[Double]("brier")
    assert(brier >= 0.0 && brier <= 1.0)
    // each bin's mean score IS the bin's discount level
    rows.foreach(r => assert(math.abs(r.getAs[Double]("mean_score") -
      r.getAs[Long]("bin") / 100.0) < 1e-9))
  }

  test("mcnemar: cells conserve the corpus; chi2 matches the " +
    "continuity-corrected closed form") {
    val r = Stats.mcnemar(spark, dir).head()
    val n = r.getAs[Long]("n")
    assert(n == Tables.documents(spark, dir).count())
    val b = r.getAs[Long]("a_only").toDouble
    val c = r.getAs[Long]("b_only").toDouble
    assert(r.getAs[Long]("both_pos") + b + c <= n)
    assert(math.abs(r.getAs[Double]("chi2_cc") -
      (math.abs(b - c) - 1) * (math.abs(b - c) - 1) / (b + c)) < 1e-3)
  }

  test("oddsRatio: cells conserve lineitem; OR matches the Haldane " +
    "cells; CI brackets the point estimate") {
    val r = Stats.oddsRatio(spark, dir).head()
    val Seq(a, b, c, d) = Seq("n_exp_ret", "n_exp_ok", "n_base_ret",
      "n_base_ok").map(r.getAs[Long](_).toDouble)
    assert((a + b + c + d).toLong == Tables.lineitem(spark, dir).count())
    val or = (a + 0.5) * (d + 0.5) / ((b + 0.5) * (c + 0.5))
    assert(math.abs(r.getAs[Double]("odds_ratio") - or) < 1e-3)
    assert(r.getAs[Double]("ci_low") <= r.getAs[Double]("odds_ratio"))
    assert(r.getAs[Double]("ci_high") >= r.getAs[Double]("odds_ratio"))
  }

  test("thresholdMetrics: confusion conserves; F1 is the harmonic " +
    "mean; MCC bounded") {
    val r = Stats.thresholdMetrics(spark, dir).head()
    val tp = r.getAs[Long]("tp"); val fp = r.getAs[Long]("fp")
    val fn = r.getAs[Long]("fn"); val tn = r.getAs[Long]("tn")
    assert(tp + fp + fn + tn == Tables.lineitem(spark, dir).count())
    val p = r.getAs[Double]("precision"); val rc = r.getAs[Double]("recall")
    assert(math.abs(r.getAs[Double]("f1") - 2 * p * rc / (p + rc)) < 1e-3)
    val mcc = r.getAs[Double]("mcc")
    assert(mcc >= -1.0 && mcc <= 1.0)
  }

  test("kfoldAssign: 5 folds, shares sum to 1, sizes conserve, " +
    "assignment is deterministic across runs") {
    val rows = Stats.kfoldAssign(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("fold")).toSet == (0L to 4L).toSet)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.lineitem(spark, dir).count())
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-2)
    val again = Stats.kfoldAssign(spark, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("spectralPower: power = cos_sum^2 + sin_sum^2; a constant " +
    "series has ~zero power at every probed period") {
    val rows = Stats.spectralPower(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("period")).toSeq == Seq(7L, 30L))
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sum"); val sn = r.getAs[Double]("sin_sum")
      assert(math.abs(r.getAs[Double]("power") - (c * c + sn * sn)) <
        math.abs(r.getAs[Double]("power")) * 1e-3 + 0.01)
    }
  }

  test("forecastAccuracy: MASE/MAE match a from-scratch seasonal-" +
    "naive walk over the daily counts") {
    import org.apache.spark.sql.functions._
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("d")).collect().map(_.getLong(1))
    val f = daily.drop(7).zip(daily.dropRight(7)).map {
      case (x, x7) => math.abs(x - x7).toDouble }
    val nv = daily.drop(1).zip(daily.dropRight(1)).map {
      case (x, x1) => math.abs(x - x1).toDouble }
    val mae = f.sum / f.length
    val got = Stats.forecastAccuracy(spark, dir).head()
    assert(got.getAs[Long]("n_scored") == f.length)
    assert(math.abs(got.getAs[Double]("mae") - mae) < 1e-3)
    assert(math.abs(got.getAs[Double]("mase") -
      mae / (nv.sum / nv.length)) < 1e-3)
  }

  test("hhiConcentration: HHI within [1/n, 1]; top share bounded by " +
    "HHI's sqrt and by 1") {
    val rows = graft.operators.Relational.hhiConcentration(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers").toDouble
      val hhi = r.getAs[Double]("hhi")
      val top = r.getAs[Double]("top_share")
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6)
      assert(top <= 1.0 && top >= 0.0)
      // max share cannot exceed sqrt(HHI); both bound concentration
      assert(top <= math.sqrt(hhi) + 1e-6)
    }
  }

  test("mannKendall: S matches a from-scratch pair walk over the " +
    "quantized daily series") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 1e-6) / 10000
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .orderBy(col("d")).collect().map(r => r4(r.getDouble(1)))
    var sWant = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      sWant += math.signum(daily(j) - daily(i)).toLong
    val got = Stats.mannKendall(spark, dir).head()
    assert(got.getAs[Long]("n_days") == daily.length)
    assert(got.getAs[Long]("s_stat") == sWant)
  }

  test("grubbsDaily: G matches a from-scratch studentized max per " +
    "region") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 1e-6) / 10000
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), to_date(col("o_orderdate")))
      .agg(sum(col("o_totalprice")).as("rev"))
      .collect().map(r => (r.getString(0), r4(r.getDouble(2) / 1e6)))
      .groupBy(_._1)
    val got = Stats.grubbsDaily(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    daily.foreach { case (region, vs) =>
      val xs = vs.map(_._2); val n = xs.length.toDouble
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      val g = xs.map(x => math.abs(x - mu) / sd).max
      val r = got(region)
      assert(r.getAs[Long]("n_days") == xs.length)
      assert(math.abs(r.getAs[Double]("g_stat") - g) < 1e-3)
    }
  }

  test("hillTail: alpha matches the log-ratio identity; tail counts " +
    "conserve") {
    import org.apache.spark.sql.functions._
    val xs = Tables.orders(spark, dir).select("o_totalprice")
      .collect().map(_.getDouble(0))
    val tail = xs.filter(_ > 300000.0)
    val got = Stats.hillTail(spark, dir).head()
    assert(got.getAs[Long]("n_total") == xs.length)
    assert(got.getAs[Long]("n_tail") == tail.length)
    val want = tail.length / tail.map(x => math.log(x / 300000.0)).sum
    assert(math.abs(got.getAs[Double]("alpha") - want) < 1e-3)
  }

  test("partCoverage: never-ordered counts conserve against a " +
    "from-scratch key-set difference") {
    import org.apache.spark.sql.functions._
    val orderedKeys = Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().collect()
      .map(_.getLong(0)).toSet
    val parts = Tables.part(spark, dir).select("p_partkey", "p_brand")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val wantNever = parts.filterNot(p => orderedKeys(p._1))
      .groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val got = graft.operators.Joins.partCoverage(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_parts")).sum == parts.length)
    got.foreach { r =>
      assert(r.getAs[Long]("n_never") ==
        wantNever.getOrElse(r.getAs[String]("brand"), 0L))
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0)
    }
  }

  test("madOutliers: median/MAD match a from-scratch robust " +
    "recomputation per type") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1)
    def med(v: Seq[Long]): Double = {
      val s = v.sorted; val n = s.length
      (s((n + 1) / 2 - 1) + s(n / 2)) / 2.0
    }
    val got = Stats.madOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    daily.foreach { case (t, vs) =>
      val xs = vs.map(_._2).toSeq
      val m = med(xs)
      val mad = med(xs.map(x => math.abs(2 * x - (2 * m).toLong))) / 2.0
      val r = got(t)
      assert(r.getAs[Long]("n_days") == xs.length)
      assert(math.abs(r.getAs[Double]("median_daily") - m) < 1e-9)
      assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-9)
    }
  }

  test("hurstRS: three points, positive mean R/S, H within (0,1) " +
    "for a real series") {
    val rows = Stats.hurstRS(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("size")).toSeq == Seq(16L, 32L, 64L))
    rows.foreach(r => assert(r.getAs[Double]("mean_rs") > 0.0))
    // R/S grows with block size for any non-degenerate series
    val rs = rows.map(_.getAs[Double]("mean_rs"))
    assert(rs(0) < rs(2))
    val h = rows.head.getAs[Double]("hurst")
    assert(h > 0.0 && h < 1.0)
  }

  test("changepoint: the split statistic matches a from-scratch " +
    "scan over the quantized daily series") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 1e-6) / 10000
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .orderBy(col("d")).collect().map(r => r4(r.getDouble(1) / 1e6))
    val n = daily.length.toDouble
    val tot = daily.sum
    var best = -1.0; var ps = 0.0
    for (k <- 1 until daily.length) {
      ps += daily(k - 1)
      val stat = math.sqrt(k * (n - k) / n) *
        math.abs(ps / k - (tot - ps) / (n - k))
      if (stat > best) best = stat
    }
    val got = Stats.changepoint(spark, dir).head()
    assert(math.abs(got.getAs[Double]("shift_stat") - best) < 1e-3)
    assert(got.getAs[Double]("mean_before") > 0.0)
  }

  test("priceIndex: Fisher is the geometric mean; Laspeyres and " +
    "Paasche bracket it; common parts positive") {
    val r = graft.operators.Joins.priceIndex(spark, dir).head()
    assert(r.getAs[Long]("n_common_parts") > 0)
    val l = r.getAs[Double]("laspeyres"); val p = r.getAs[Double]("paasche")
    val f = r.getAs[Double]("fisher")
    assert(math.abs(f - math.sqrt(l * p)) < 1e-3)
    assert(f >= math.min(l, p) - 1e-9 && f <= math.max(l, p) + 1e-9)
    assert(r.getAs[Int]("year_base") < r.getAs[Int]("year_now"))
  }

  test("gumbelMaxima: method-of-moments identities hold; the return " +
    "level exceeds the mean block max") {
    import org.apache.spark.sql.functions._
    val maxima = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .groupBy(date_trunc("month", col("d")))
      .agg(max(round(col("rev") / 1e6, 4)).as("mx"))
      .collect().map(_.getDouble(1))
    val got = Stats.gumbelMaxima(spark, dir).head()
    assert(got.getAs[Long]("n_blocks") == maxima.length)
    val n = maxima.length.toDouble
    val mu0 = maxima.sum / n
    val sd = math.sqrt(maxima.map(x => (x - mu0) * (x - mu0)).sum / (n - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    assert(math.abs(got.getAs[Double]("gumbel_beta") - beta) < 1e-2)
    // the 12-month return level sits above the mean of block maxima
    assert(got.getAs[Double]("return_level_12m") > mu0)
  }

  test("seasonalStrength: both strengths in [0,1]; a weekly-cycled " +
    "event stream shows nonzero seasonal strength") {
    val r = graft.operators.Relational.seasonalStrength(spark, dir).head()
    val ts = r.getAs[Double]("trend_strength")
    val ss = r.getAs[Double]("seasonal_strength")
    assert(ts >= 0.0 && ts <= 1.0)
    assert(ss >= 0.0 && ss <= 1.0)
    assert(r.getAs[Long]("n_days") > 0)
  }

  test("xyzClasses: part counts conserve the catalog of ordered parts") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Relational.xyzClasses(spark, dir).collect()
    val totalParts = Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == totalParts)
    assert(rows.map(_.getAs[String]("xyz_class")).toSet
      .subsetOf(Set("X", "Y", "Z")))
  }

  test("revenueBridge: the waterfall identity holds exactly — " +
    "components sum to delta revenue") {
    val r = graft.operators.Joins.revenueBridge(spark, dir).head()
    val parts = Seq("price_effect", "volume_effect", "cross_effect",
      "new_parts", "churned_parts").map(r.getAs[Double](_)).sum
    assert(math.abs(parts - r.getAs[Double]("delta_revenue")) < 0.01)
  }

  test("leadTime: percentiles ordered, counts conserve the joined " +
    "fact table") {
    val rows = graft.operators.Joins.leadTime(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_lines")).sum ==
      Tables.lineitem(spark, dir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days"))
      assert(r.getAs[Double]("mean_days") > 0.0)
    }
  }

  test("dupeInvoices: every pair shares the dollar amount within the " +
    "date window; no self-pairs") {
    val rows = graft.operators.Joins.dupeInvoices(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("order_a") < r.getAs[Long]("order_b"))
      assert(r.getAs[Int]("days_apart") <= 30)
    }
  }

  test("jamesStein: posteriors sit between the raw rate and the " +
    "pooled mean; smaller brands shrink more per unit of gap") {
    val rows = graft.operators.Joins.jamesStein(spark, dir, topN = 1000)
      .collect()
    // pooled mean from the same cells
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val mu = rows.map(_.getAs[Long]("returns")).sum / n
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_rate")
      val post = r.getAs[Double]("posterior_rate")
      val lo = math.min(raw, mu) - 1e-3
      val hi = math.max(raw, mu) + 1e-3
      assert(post >= lo && post <= hi) // shrinkage never overshoots
    }
  }

  test("cramerVonMises: nonnegative; zero when the two samples are " +
    "the same distribution (self-split sanity)") {
    val r = Stats.cramerVonMises(spark, dir).head()
    assert(r.getAs[Double]("cvm_t") >= 0.0)
    assert(r.getAs[Long]("n_urgent") + r.getAs[Long]("n_rest") ==
      Tables.orders(spark, dir).count())
  }

  test("energyDistance: the energy statistic is nonnegative and the " +
    "within/cross terms match a from-scratch bucket-pair walk") {
    import org.apache.spark.sql.functions._
    val cells = Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / 1000).cast("long").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("u"))
      .groupBy("v")
      .agg(sum(col("u")).as("n1"), sum(lit(1L) - col("u")).as("n2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var sxy = 0.0; var t1 = 0.0; var t2 = 0.0
    cells.foreach { c => t1 += c._2; t2 += c._3 }
    for (a <- cells; b <- cells)
      sxy += a._2 * b._3 * math.abs(a._1 - b._1)
    val r = Stats.energyDistance(spark, dir).head()
    assert(math.abs(r.getAs[Double]("e_cross") - sxy / (t1 * t2)) < 1e-3)
    assert(r.getAs[Double]("energy_stat") >= -1e-9)
  }

  test("rakingIpf: calibrated weights reproduce both target margins " +
    "to within the q6 trajectory tolerance") {
    import org.apache.spark.sql.functions._
    val rows = Stats.rakingIpf(spark, dir).collect()
    assert(rows.nonEmpty)
    // after the final COLUMN sweep, column margins match exactly;
    // row margins are within one IPF step of theirs — check both
    // margins are positive and each weight is positive
    rows.foreach { r =>
      assert(r.getAs[Double]("w_calibrated") > 0.0)
      assert(r.getAs[Double]("rel_weight") > 0.0)
    }
    // total calibrated mass equals the early-era sample size (IPF
    // preserves the grand total after each full sweep, up to q6)
    val calTotal = rows.map(_.getAs[Double]("w_calibrated")).sum
    val earlyN = rows.map(_.getAs[Long]("n_early")).sum.toDouble
    assert(math.abs(calTotal - earlyN) / earlyN < 0.01)
  }

  test("wilcoxonSignedRank: W+ + W- equals n(n+1)/2 (the rank-sum " +
    "identity)") {
    val r = Stats.wilcoxonSignedRank(spark, dir).head()
    val n = r.getAs[Long]("n_pairs").toDouble
    assert(n > 0)
    assert(math.abs(r.getAs[Double]("w_plus") +
      r.getAs[Double]("w_minus") - n * (n + 1) / 2) < 1e-6)
  }

  test("friedman: chi2 bounded by n(k-1); rank means average to " +
    "(k+1)/2 overall") {
    val r = Stats.friedmanRegions(spark, dir).head()
    val n = r.getAs[Long]("n_blocks").toDouble
    val k = r.getAs[Long]("k").toDouble
    val chi2 = r.getAs[Double]("chi2_f")
    assert(chi2 >= 0.0 && chi2 <= n * (k - 1) + 1e-6)
  }

  test("tukeyHsd: 10 region pairs; q is symmetric-positive and zero " +
    "iff means are equal") {
    val rows = Stats.tukeyHsd(spark, dir).collect()
    assert(rows.length == 10) // C(5,2)
    rows.foreach { r =>
      val q = r.getAs[Double]("q_stat")
      assert(q >= 0.0)
      if (math.abs(r.getAs[Double]("mean_diff")) > 1e-9) assert(q > 0.0)
    }
  }

  test("lorenzKnee: the knee dominates both ABC boundary points " +
    "and shares are consistent") {
    val r = graft.operators.Relational.lorenzKnee(spark, dir).head()
    assert(r.getAs[Double]("rev_share") > r.getAs[Double]("pop_share"))
    assert(math.abs(r.getAs[Double]("max_gap") -
      (r.getAs[Double]("rev_share") - r.getAs[Double]("pop_share")))
      < 2e-4)
    assert(r.getAs[Long]("knee_rank") > 0)
  }

  test("atkinson: index within [0,1); equals 1 - EDE ratio") {
    val r = graft.operators.Relational.atkinsonIndex(spark, dir).head()
    val a = r.getAs[Double]("atkinson")
    assert(a >= 0.0 && a < 1.0)
    assert(math.abs(a - (1.0 - r.getAs[Double]("ede_ratio_base")))
      < 1e-3)
  }

  test("abcXyzMatrix: cells conserve the ordered-part catalog and " +
    "revenue shares sum to ~1") {
    val rows = graft.operators.Relational.abcXyzMatrix(spark, dir)
      .collect()
    val totalParts = Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == totalParts)
    assert(math.abs(rows.map(_.getAs[Double]("rev_share")).sum - 1.0)
      < 0.01)
  }

  test("realizedVolatility: vol matches a from-scratch log-return " +
    "std; annualization is sqrt(365)") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 1e-6) / 10000
    val revs = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("rev"))
      .orderBy(col("d")).collect().map(r => r4(r.getDouble(1) / 1e6))
    val rets = revs.drop(1).zip(revs.dropRight(1))
      .map { case (a, b) => math.log(a / b) }
    val n = rets.length.toDouble
    val mu = rets.sum / n
    val sd = math.sqrt(rets.map(r => r * r).sum / n - mu * mu)
    val got = Stats.realizedVolatility(spark, dir).head()
    assert(got.getAs[Long]("n_returns") == rets.length)
    assert(math.abs(got.getAs[Double]("daily_vol") - sd) < 1e-3)
    assert(math.abs(got.getAs[Double]("annualized_vol") -
      sd * math.sqrt(365.0)) < 1e-2)
  }

  test("maxDrawdown: trough never exceeds peak; drawdown in [0,1)") {
    val r = Stats.maxDrawdown(spark, dir).head()
    assert(r.getAs[Double]("trough_rev") <= r.getAs[Double]("peak_rev"))
    val dd = r.getAs[Double]("max_drawdown")
    assert(dd >= 0.0 && dd < 1.0)
  }

  test("varCvar: CVaR is at least as bad as VaR; tail is nonempty") {
    val r = Stats.varCvar(spark, dir).head()
    assert(r.getAs[Long]("n_changes") > 0)
    assert(r.getAs[Double]("cvar_5pct") <=
      r.getAs[Long]("var_5pct").toDouble + 10000) // bucket width slack
  }

  test("neymanAllocation: both allocations sum to the total sample; " +
    "Neyman overweights the high-variance strata") {
    val rows = Stats.neymanAllocation(spark, dir).collect()
    assert(math.abs(rows.map(_.getAs[Double]("neyman_n")).sum - 1000.0)
      < 0.1)
    assert(math.abs(rows.map(_.getAs[Double]("proportional_n")).sum -
      1000.0) < 0.1)
    rows.foreach(r => assert(r.getAs[Double]("neyman_n") > 0.0))
  }

  test("monthIndex: indices normalize to mean 1 across months") {
    val rows = Stats.monthIndex(spark, dir).collect()
    assert(rows.length == 12)
    val mean = rows.map(_.getAs[Double]("seasonal_index")).sum / 12
    assert(math.abs(mean - 1.0) < 0.01)
  }

  test("paybackPeriod: cumulative LTV is reached at or after the " +
    "payback month; months positive") {
    val rows = graft.operators.Behavior.paybackPeriod(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pm = r.getAs[java.lang.Long]("payback_months")
      if (pm != null) {
        assert(pm >= 1L)
        assert(r.getAs[Double]("ltv_to_date") >= 30000.0)
      }
    }
  }

  test("brandSwitching: shares bounded; every transition brand " +
    "exists in the catalog") {
    val rows = graft.operators.Joins.brandSwitching(spark, dir).collect()
    assert(rows.nonEmpty)
    val brands = Tables.part(spark, dir).select("p_brand").distinct()
      .collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(brands(r.getAs[String]("from_brand")))
      assert(brands(r.getAs[String]("to_brand")))
      val sh = r.getAs[Double]("share")
      assert(sh > 0.0 && sh <= 1.0)
      assert(r.getAs[Boolean]("loyal") ==
        (r.getAs[String]("from_brand") == r.getAs[String]("to_brand")))
    }
  }

  test("adoptionVelocity: every reported part has >= 10 orders and " +
    "nonnegative, sorted velocities") {
    val rows = graft.operators.Joins.adoptionVelocity(spark, dir)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orders") >= 10L)
      assert(r.getAs[Long]("days_to_10th") >= 0L)
    }
    val vs = rows.map(_.getAs[Long]("days_to_10th"))
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
  }

  test("crossElasticity: both slopes finite over a full month panel") {
    val r = graft.operators.Joins.crossElasticity(spark, dir).head()
    assert(r.getAs[Long]("n_months") > 12)
    assert(!r.getAs[Double]("cross_elasticity").isNaN)
    assert(!r.getAs[Double]("own_elasticity").isNaN)
  }

  test("rankVolatility: stay rate bounded; mean change bounded by " +
    "max jump") {
    val r = graft.operators.Joins.rankVolatility(spark, dir).head()
    assert(r.getAs[Long]("n_pairs") > 0)
    val sr = r.getAs[Double]("stay_rate")
    assert(sr >= 0.0 && sr <= 1.0)
    assert(r.getAs[Double]("mean_abs_change") <=
      r.getAs[Long]("max_jump").toDouble)
  }

  test("rankAgreement: Spearman within [-1,1]; overlap within [0,1]; " +
    "rho matches a from-scratch rank walk") {
    import org.apache.spark.sql.functions._
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 1e-6) / 10000
    val pp = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("q"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("r"))
      .collect().map(x => (x.getLong(0), r4(x.getDouble(1)),
        r4(x.getDouble(2))))
    val byQ = pp.sortBy(p => (-p._2, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    val byR = pp.sortBy(p => (-p._3, p._1)).zipWithIndex
      .map { case (p, i) => p._1 -> (i + 1L) }.toMap
    val n = pp.length.toDouble
    val sd2 = pp.map(p => math.pow(byQ(p._1) - byR(p._1), 2)).sum
    val want = 1.0 - 6.0 * sd2 / (n * (n * n - 1))
    val got = graft.operators.Joins.rankAgreement(spark, dir).head()
    assert(got.getAs[Long]("n_parts") == pp.length)
    assert(math.abs(got.getAs[Double]("spearman_rho") - want) < 1e-3)
    val ov = got.getAs[Double]("top100_overlap")
    assert(ov >= 0.0 && ov <= 1.0)
  }

  test("cmgr: CMGR never exceeds the arithmetic mean growth (AM-GM)") {
    val r = graft.operators.Relational.cmgr(spark, dir).head()
    assert(r.getAs[Long]("n_months") > 1)
    assert(r.getAs[Double]("cmgr") <=
      r.getAs[Double]("mean_growth") + 2e-4)
  }

  test("growthDecomposition: the log identity holds exactly — " +
    "terms sum to total log growth") {
    val r = graft.operators.Relational.growthDecomposition(spark, dir)
      .head()
    val parts = Seq("customer_term", "frequency_term", "value_term")
      .map(r.getAs[Double](_)).sum
    assert(math.abs(parts - r.getAs[Double]("log_revenue_growth"))
      < 5e-4)
  }

  test("brandBeta: betas finite, shares positive, output ranked " +
    "descending") {
    val rows = graft.operators.Joins.brandBeta(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[Double]("beta").isNaN)
      assert(r.getAs[Double]("mean_share") > 0.0)
    }
    val bs = rows.map(_.getAs[Double]("beta"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a >= b })
  }

  test("linePosition: positions conserve the fact table and rates " +
    "are bounded") {
    val rows = graft.operators.Joins.linePosition(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_lines")).sum ==
      Tables.lineitem(spark, dir).count())
    rows.foreach { r =>
      val rr = r.getAs[Double]("return_rate")
      assert(rr >= 0.0 && rr <= 1.0)
      assert(r.getAs[Double]("mean_quantity") > 0.0)
    }
  }

  test("reconcile: every order carries lines in this dataset and " +
    "order counts conserve") {
    val rows = graft.operators.Joins.reconcile(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, dir).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_with_lines") <= r.getAs[Long]("n_orders"))
      assert(r.getAs[Double]("net_to_header_ratio") > 0.0)
    }
  }

  test("priceTierMix: shares sum to 1 per year; four tiers present " +
    "in the anchor year") {
    val rows = graft.operators.Joins.priceTierMix(spark, dir).collect()
    val byYr = rows.groupBy(_.getAs[Int]("yr"))
    byYr.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("rev_share")).sum - 1.0)
        < 0.01)
    }
    val y0 = byYr.keys.min
    assert(byYr(y0).map(_.getAs[String]("tier")).toSet.size == 4)
  }

  test("peakDays: every reported day is a strict local max with " +
    "positive prominence") {
    val rows = Stats.peakDays(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("prominence") > 0.0))
    // revenues are ranked descending
    val revs = rows.map(_.getAs[Double]("rev"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("aqpRevenue: HT estimate within a few se of exact, sample ~10%") {
    val rows = Stats.aqpRevenue(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows").toDouble
      val ns = r.getAs[Long]("n_sampled").toDouble
      assert(ns / n > 0.05 && ns / n < 0.15) // deterministic ~10% hash sample
      val exact = r.getAs[Double]("exact_musd")
      val est = r.getAs[Double]("est_musd")
      val se = r.getAs[Double]("se_musd")
      assert(se > 0.0)
      assert(math.abs(exact - est) < 6.0 * se) // sanity, not the 2-se gate
    }
  }

  test("brierDecomp: Murphy identity holds exactly") {
    val r = Stats.brierDecomp(spark, dir).collect().head
    assert(math.abs(r.getAs[Double]("identity_gap")) < 1e-9)
    assert(r.getAs[Double]("brier") >= 0.0)
    assert(r.getAs[Double]("reliability") >= 0.0)
    assert(r.getAs[Double]("resolution") >= 0.0)
    val u = r.getAs[Double]("uncertainty")
    assert(u >= 0.0 && u <= 0.25 + 1e-9)
  }

  test("holmByFdr: Holm is stricter than BH-style BY at every rank") {
    val rows = Stats.holmByFdr(spark, dir).collect()
    assert(rows.length == 25)
    // rejected_holm is a prefix property: once false, never true again
    val flags = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Boolean]("rejected_holm"))
    val firstFalse = flags.indexWhere(!_)
    if (firstFalse >= 0) assert(flags.drop(firstFalse).forall(!_))
    rows.foreach { r =>
      assert(r.getAs[Double]("holm_crit") > 0.0)
      assert(r.getAs[Double]("by_crit") > 0.0)
    }
  }

  test("tostEquivalence: z bounds are symmetric around delta") {
    val r = Stats.tostEquivalence(spark, dir).collect().head
    val zl = r.getAs[Double]("z_lower")
    val zu = r.getAs[Double]("z_upper")
    val d = r.getAs[Double]("diff")
    val se = r.getAs[Double]("se")
    val delta = r.getAs[Double]("delta")
    assert(se > 0.0 && delta > 0.0)
    // zl + zu = 2*delta/se
    assert(math.abs((zl + zu) - 2.0 * delta / se) < 1e-2)
    assert(r.getAs[Boolean]("equivalent") == (zl > 1.645 && zu > 1.645))
  }

  test("ndvEstimate: estimators bracket sanity") {
    val r = Stats.ndvEstimate(spark, dir).collect().head
    val exact = r.getAs[Long]("exact_ndv")
    val ds = r.getAs[Long]("sample_ndv")
    assert(ds <= exact)
    assert(r.getAs[Double]("gee_est") >= ds.toDouble)
    assert(r.getAs[Double]("chao_est") >= ds.toDouble)
    assert(r.getAs[Double]("rel_err_gee") >= 0.0)
  }

  test("vif: VIFs >= 1, det(R) in (0,1]") {
    val r = Stats.vif(spark, dir).collect().head
    Seq("vif_quantity", "vif_discount", "vif_tax").foreach { c =>
      assert(r.getAs[Double](c) >= 1.0 - 1e-3)
    }
    val det = r.getAs[Double]("det_r")
    assert(det > 0.0 && det <= 1.0 + 1e-9)
  }

  test("varModel: finite coefficients, stability verdict consistent") {
    val r = Stats.varModel(spark, dir).collect().head
    Seq("b_rev_rev", "b_rev_cnt", "b_cnt_rev", "b_cnt_cnt").foreach { c =>
      assert(!r.getAs[Double](c).isNaN)
    }
    val rad = r.getAs[Double]("spectral_radius")
    assert(rad >= 0.0)
    assert(r.getAs[Boolean]("stable") == (rad < 1.0))
  }

  test("ecmModel: half-life defined iff gamma is a correction") {
    val r = Stats.ecmModel(spark, dir).collect().head
    val g = r.getAs[Double]("gamma")
    val hl = r.getAs[Double]("half_life_days")
    if (g > -1.0 && g < 0.0) assert(hl > 0.0) else assert(hl == -1.0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
  }

  test("boxCox: exactly one best lambda, loglik finite on the grid") {
    val rows = Stats.boxCox(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.count(_.getAs[Boolean]("best")) >= 1)
    rows.foreach(r => assert(!r.getAs[Double]("loglik").isNaN))
    // lambda=1 is a linear shift: its loglik never strictly beats all others
    val best = rows.filter(_.getAs[Boolean]("best")).map(_.getAs[Double]("loglik")).head
    rows.foreach(r => assert(r.getAs[Double]("loglik") <= best))
  }

  test("blandAltman: limits bracket the bias, outside share small") {
    val r = Stats.blandAltman(spark, dir).collect().head
    val bias = r.getAs[Double]("bias")
    assert(r.getAs[Double]("loa_low") <= bias)
    assert(r.getAs[Double]("loa_high") >= bias)
    val out = r.getAs[Double]("pct_outside")
    assert(out >= 0.0 && out < 0.25) // ~5% under normality, generous band
  }

  test("forecastBacktest: four models on identical origins, MAE >= |bias|") {
    val rows = Stats.forecastBacktest(spark, dir).collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("n_origins")).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("mae") >= math.abs(r.getAs[Double]("bias")) - 1e-3)
      assert(r.getAs[Double]("mae") >= 0.0)
    }
  }

  test("hillNumbers: q0 >= q1 >= q2 (Hill ordering), evenness in (0,1]") {
    val rows = Stats.hillNumbers(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val q0 = r.getAs[Long]("q0_richness").toDouble
      val q1 = r.getAs[Double]("q1_exp_shannon")
      val q2 = r.getAs[Double]("q2_inv_simpson")
      assert(q0 >= q1 - 1e-9 && q1 >= q2 - 1e-9)
      val ev = r.getAs[Double]("evenness")
      assert(ev > 0.0 && ev <= 1.0 + 1e-9)
    }
  }

  test("lilliefors: D in (0,1), sqrt-n scaling consistent") {
    val r = Stats.lilliefors(spark, dir).collect().head
    val d = r.getAs[Double]("ks_d")
    assert(d > 0.0 && d < 1.0)
    val n = r.getAs[Long]("n_days").toDouble
    assert(math.abs(r.getAs[Double]("sqrt_n_d") - d * math.sqrt(n)) < 2e-2)
    assert(r.getAs[Boolean]("reject_normality") ==
      (d > r.getAs[Double]("crit_5pct")))
  }
}
