package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Behavior, Graph, Inventory, Multimodal, Similarity, Stats, Survival, TextAnalysis}

/** Property tests for the round-11 operator batches (the DuckDB
  * oracles are the exact gate; these pin the mathematical invariants
  * that must hold at ANY scale factor). */
class R11BatchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("kpssTest: positive long-run variance, finite statistic") {
    val r = Stats.kpssTest(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("lrv") > 0.0)
    assert(!r.head.getAs[Double]("kpss_stat").isNaN)
  }

  test("archLm: LM statistic is n*R^2, hence in [0, n]") {
    val r = Stats.archLm(spark, dir).collect().head
    val lm = r.getAs[Double]("lm_stat")
    assert(lm >= 0.0 && lm <= r.getAs[Long]("n_obs").toDouble)
  }

  test("spectralEntropy: normalized entropy in [0, 1]") {
    val r = Stats.spectralEntropy(spark, dir).collect().head
    val norm = r.getAs[Double]("normalized")
    assert(norm >= 0.0 && norm <= 1.0 + 1e-9)
  }

  test("kalmanLevel: one row per day, gain converges into (0, 1)") {
    val rows = Stats.kalmanLevel(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Double]("gain")
      assert(k > 0.0 && k < 1.0)
    }
    // steady-state gain: the last two steps agree at 4dp
    val gains = rows.map(_.getAs[Double]("gain"))
    assert(math.abs(gains.last - gains(gains.length - 2)) < 1e-9)
  }

  test("thetaForecast: horizon table consistent with level + drift") {
    val rows = graft.operators.Indicators.thetaForecast(spark, dir).collect()
    assert(rows.length == 14)
    val r1 = rows.head
    val expect = r1.getAs[Double]("level") +
      r1.getAs[Double]("drift") / 2.0 * (1.0 + (1.0 / 0.3 - 1.0))
    assert(math.abs(r1.getAs[Double]("forecast") - expect) < 1e-2)
  }

  test("cochranArmitage / mantelHaenszel / hausman: finite statistics") {
    assert(!Stats.cochranArmitage(spark, dir).collect()
      .head.getAs[Double]("trend_z").isNaN)
    val mh = Stats.mantelHaenszel(spark, dir).collect().head
    assert(mh.getAs[Double]("or_mh") > 0.0)
    assert(mh.getAs[Long]("n_strata") == 5L)
    val h = Stats.hausmanTest(spark, dir).collect().head
    assert(!h.getAs[Double]("hausman_stat").isNaN)
  }

  test("dunnPosthoc: all region pairs once, z antisymmetric with rank order") {
    val rows = Stats.dunnPosthoc(spark, dir).collect()
    assert(rows.length == 10) // C(5,2)
    rows.foreach(r => assert(r.getAs[Int]("g1") < r.getAs[Int]("g2")))
  }

  test("andersonDarling2: non-negative statistic, counts partition orders") {
    val r = Stats.andersonDarling2(spark, dir).collect().head
    assert(r.getAs[Double]("a2_stat") >= 0.0)
    val total = r.getAs[Long]("n_fulfilled") + r.getAs[Long]("n_open")
    assert(total == Tables.orders(spark, dir).count())
  }

  test("fleissKappa: bounded agreement, p_e in (0, 1)") {
    val r = TextAnalysis.fleissKappa(spark, dir).collect().head
    assert(r.getAs[Double]("kappa") <= 1.0 + 1e-9)
    val pe = r.getAs[Double]("p_e")
    assert(pe > 0.0 && pe < 1.0)
  }

  test("richClub: phi in [0, 1], monotone node shrinkage") {
    val rows = Graph.richClub(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val phi = r.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9)
    }
    val nRich = rows.map(_.getAs[Long]("n_rich"))
    assert(nRich.zip(nRich.tail).forall { case (a, b) => a >= b })
  }

  test("jlDistortion: min <= avg <= max, ratios near 1") {
    val r = Similarity.jlDistortion(spark, dir).collect().head
    val (mn, av, mx) = (r.getAs[Double]("min_ratio"),
      r.getAs[Double]("avg_ratio"), r.getAs[Double]("max_ratio"))
    assert(mn <= av && av <= mx)
    assert(av > 0.5 && av < 1.5) // JL concentration on 64->16 dims
  }

  test("competingRisks: CIFs monotone, sum bounded by 1 - S") {
    val rows = Survival.competingRisks(spark, dir).collect()
    assert(rows.nonEmpty)
    val c1 = rows.map(_.getAs[Double]("cif_complete"))
    val c2 = rows.map(_.getAs[Double]("cif_abandon"))
    assert(c1.zip(c1.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(c2.zip(c2.tail).forall { case (a, b) => b >= a - 1e-9 })
    rows.foreach { r =>
      assert(r.getAs[Double]("cif_complete") + r.getAs[Double]("cif_abandon")
        <= 1.0 - r.getAs[Double]("s_overall") + 1e-3)
    }
  }

  test("negbinFit: r positive exactly when overdispersed") {
    Inventory.negbinFit(spark, dir).collect().foreach { r =>
      val over = r.getAs[Boolean]("overdispersed")
      val nbR = r.getAs[Double]("nb_r")
      assert(if (over) nbR > 0.0 else nbR == 0.0)
    }
  }

  test("youdenJ: rates in [0,1], J consistent") {
    val r = Stats.youdenJ(spark, dir).collect().head
    val (tpr, fpr, j) = (r.getAs[Double]("tpr"), r.getAs[Double]("fpr"),
      r.getAs[Double]("youden_j"))
    assert(tpr >= 0 && tpr <= 1 && fpr >= 0 && fpr <= 1)
    assert(math.abs(j - (tpr - fpr)) < 1e-3)
  }

  test("qnScale: rank within pair count, non-negative scale") {
    val r = Stats.qnScale(spark, dir).collect().head
    val n = r.getAs[Long]("n_orders")
    assert(r.getAs[Long]("k_rank") <= n * (n - 1) / 2)
    assert(r.getAs[Double]("qn_scale_k") >= 0.0)
  }

  test("upliftDeciles: 10 deciles partitioning every order") {
    val rows = Behavior.upliftDeciles(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSet == (1L to 10L).toSet)
    val total = rows.map(r =>
      r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl")).sum
    assert(total == Tables.orders(spark, dir).count())
  }

  test("imageNearDups: edited variants are caught, threshold respected") {
    val pairs = Multimodal.imageNearDups(spark, dir).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 12))
    // the planted base->variant pairs (id, id+1e9) dominate recall:
    // most bases must find their own edit through the bands
    val basesWithVariant = pairs.filter(r =>
      r.getAs[Long]("media_b") == r.getAs[Long]("media_a") + 1000000000L)
    val nBases = Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0).count()
    assert(basesWithVariant.length >= nBases / 2)
  }

  test("matrixProfile: non-negative distances, one row per eligible day") {
    val rows = Stats.matrixProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("mp_dist") >= 0.0))
  }

  test("pettitt: change day inside the observed calendar") {
    val r = Stats.pettittTest(spark, dir).collect().head
    assert(r.getAs[Long]("n_days") > 0)
    assert(math.abs(r.getAs[Long]("u_stat")) > 0)
  }

  test("classicalDecomp: 7 weekday indices that re-center to zero") {
    val rows = Stats.classicalDecomp(spark, dir).collect()
    assert(rows.length == 7)
    val sum = rows.map(_.getAs[Double]("seasonal_idx")).sum
    assert(math.abs(sum) < 1e-2)
  }
}
