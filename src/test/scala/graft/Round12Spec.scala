package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Operator specs for the round-12 batch: block-design trend tests,
  * circular/variance-ratio screens, robust two-sample tests,
  * distribution fits, queueing, ROUGE-L, char-LM cross-entropy, edge
  * support, stratified AQP. Each test pins an internal consistency
  * property the DuckDB oracle cannot see (the oracle replays the same
  * arithmetic; these assert the arithmetic is the RIGHT one). */
class Round12Spec extends AnyFunSuite {
  private def s = TestSpark.spark
  private def d = TestSpark.sfDir

  test("pageTrend: 5 blocks x 4 ordered treatments, L within rank bounds") {
    val r = graft.operators.Stats.pageTrend(s, d).collect().head
    assert(r.getAs[Long]("n_blocks") === 5L)
    assert(r.getAs[Long]("k_treatments") === 4L)
    val l = r.getAs[Long]("l_stat")
    // per block, Σ j·r_j over permutations of {1..4} lies in [20, 30]
    assert(l >= 5 * 20 && l <= 5 * 30)
  }

  test("quadeTest: A > B >= 0 and F finite non-negative") {
    val r = graft.operators.Stats.quadeTest(s, d).collect().head
    val a = r.getAs[Double]("a_stat"); val b = r.getAs[Double]("b_stat")
    assert(a > b && b >= 0.0)
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("jonckheere: n equals the order count; z finite") {
    val r = graft.operators.Stats.jonckheere(s, d).collect().head
    val n = graft.Tables.orders(s, d).count()
    assert(r.getAs[Long]("n") === n)
    assert(!r.getAs[Double]("z_stat").isNaN)
    // J is bounded by the total number of cross-group pairs
    assert(r.getAs[Double]("j_stat") >= 0.0 &&
      r.getAs[Double]("j_stat") <= n.toDouble * n / 2)
  }

  test("rayleighHours: r_bar in [0,1], mean_hour in [0,24)") {
    val rows = graft.operators.Stats.rayleighHours(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rb = r.getAs[Double]("r_bar")
      assert(rb >= 0.0 && rb <= 1.0)
      val h = r.getAs[Double]("mean_hour")
      assert(h >= 0.0 && h < 24.0)
      assert(math.abs(r.getAs[Double]("rayleigh_z") -
        r.getAs[Long]("n") * rb * rb) < 0.05)
    }
  }

  test("varianceRatio: vr positive, q=5") {
    val r = graft.operators.Stats.varianceRatio(s, d).collect().head
    assert(r.getAs[Int]("q") === 5)
    assert(r.getAs[Double]("vr") > 0.0)
  }

  test("brunnerMunzel: p_hat in [0,1], df positive") {
    val r = graft.operators.Behavior.brunnerMunzel(s, d).collect().head
    val p = r.getAs[Double]("p_hat")
    assert(p >= 0.0 && p <= 1.0)
    assert(r.getAs[Double]("df") > 0.0)
  }

  test("ansariBradley: AB statistic within score-sum bounds") {
    val r = graft.operators.Behavior.ansariBradley(s, d).collect().head
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val nn = (n1 + n2).toDouble
    val ab = r.getAs[Double]("ab_stat")
    // every AB score lies in [1, (N+1)/2]
    assert(ab >= n1 && ab <= n1 * (nn + 1) / 2)
  }

  test("gammaFit: shapes positive and MoM/MLE agree within 2x") {
    val rows = graft.operators.Stats.gammaFit(s, d).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val mom = r.getAs[Double]("shape_mom")
      val mle = r.getAs[Double]("shape_mle")
      assert(mom > 0 && mle > 0)
      assert(mle / mom < 2.0 && mom / mle < 2.0)
    }
  }

  test("lognormalFit: median < implied mean (sigma > 0)") {
    val rows = graft.operators.Stats.lognormalFit(s, d).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("median_fit") < r.getAs[Double]("mean_fit"))
      assert(r.getAs[Double]("sigma_log") > 0.0)
    }
  }

  test("dagostinoK2: K2 equals z1^2 + z2^2") {
    val rows = graft.operators.Stats.dagostinoK2(s, d).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val z1 = r.getAs[Double]("z_skew"); val z2 = r.getAs[Double]("z_kurt")
      assert(math.abs(r.getAs[Double]("k2_stat") - (z1 * z1 + z2 * z2))
        < 0.01)
    }
  }

  test("erlangB: blocking decreases with servers; carried <= offered") {
    val rows = graft.operators.Inventory.erlangB(s, d).collect()
    assert(rows.length >= 2)
    val pb = rows.map(_.getAs[Double]("p_block"))
    assert(pb.zip(pb.tail).forall { case (x, y) => y <= x + 1e-9 })
    rows.foreach { r =>
      assert(r.getAs[Double]("carried_load") <=
        r.getAs[Double]("offered_load") + 1e-9)
    }
  }

  test("mg1Wait: stable queue (rho < 1) with positive wait") {
    val r = graft.operators.Inventory.mg1Wait(s, d).collect().head
    val rho = r.getAs[Double]("rho")
    assert(rho > 0.0 && rho < 1.0)
    assert(r.getAs[Double]("wq_days") > 0.0)
    assert(math.abs(r.getAs[Double]("w_days") -
      (r.getAs[Double]("wq_days") + r.getAs[Double]("es_days"))) < 1e-3)
  }

  test("rougeLPairs: lcs bounded by min window length; F in [0,1]") {
    val rows = graft.operators.TextAnalysis.rougeLPairs(s, d)
      .limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lcs = r.getAs[Long]("lcs")
      assert(lcs <= math.min(r.getAs[Long]("len_a"), r.getAs[Long]("len_b")))
      val f = r.getAs[Double]("rougel_f")
      assert(f >= 0.0 && f <= 1.0 + 1e-9)
    }
  }

  test("LcsLength kernel: known subsequence") {
    val sp = TestSpark.spark
    import sp.implicits._
    val df = Seq((Seq("a", "b", "c", "d", "e"), Seq("x", "b", "d", "e", "y")))
      .toDF("a", "b")
    val lcs = df.select(graft.functions.GramOverlapFunctions
      .lcsLength(col("a"), col("b"))).collect().head.getLong(0)
    assert(lcs === 3L) // b, d, e
  }

  test("charCrossEntropy: one row per source, xent positive, ppl = 2^xent") {
    val rows = graft.operators.TextAnalysis.charCrossEntropy(s, d).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val x = r.getAs[Double]("xent_bits")
      assert(x > 0.0)
      assert(math.abs(r.getAs[Double]("ppl") - math.pow(2.0, x)) < 0.01)
    }
  }

  test("edgeSupport: truss flags consistent with support") {
    val rows = graft.operators.Graph.edgeSupport(s, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sup = r.getAs[Long]("support")
      assert(sup >= 0)
      assert(r.getAs[Boolean]("in_3truss") === (sup >= 1))
      assert(r.getAs[Boolean]("in_4truss") === (sup >= 2))
    }
  }

  test("filterFunnel: monotone attrition, stage 0 is the whole corpus") {
    val rows = graft.operators.TextAnalysis.filterFunnel(s, d).collect()
      .sortBy(_.getAs[Int]("stage_no"))
    assert(rows.length === 6)
    assert(rows.head.getAs[String]("stage") === "all")
    assert(rows.head.getAs[Double]("doc_retention") === 1.0)
    val docs = rows.map(_.getAs[Long]("n_docs"))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a })
    assert(docs.head === graft.Tables.documents(s, d).count())
    // the funnel must actually bite somewhere on the real corpus
    assert(docs.last < docs.head)
  }

  test("orderedAgg: listagg is sorted+deduped; mode has the max count") {
    val rows = graft.operators.Relational.orderedAgg(s, d).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val st = r.getAs[String]("statuses").split(",").toSeq
      assert(st === st.sorted && st.distinct === st)
      // the deterministic mode must be a maximal-count quantity
      val flag = r.getAs[String]("l_returnflag")
      val counts = graft.Tables.lineitem(s, d)
        .filter(col("l_returnflag") === flag)
        .groupBy(col("l_quantity")).count().collect()
        .map(x => x.getAs[Double]("l_quantity") -> x.getAs[Long]("count"))
        .toMap
      val m = r.getAs[Double]("qty_mode")
      assert(counts(m) === counts.values.max)
    }
  }

  test("welchAnova: F positive, df2 within group-size bounds") {
    val r = graft.operators.Stats.welchAnova(s, d).collect().head
    assert(r.getAs[Long]("k_groups") === 5L)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val df2 = r.getAs[Double]("df2")
    // Welch df2 is bounded by the total residual df
    assert(df2 > 0.0 &&
      df2 <= graft.Tables.orders(s, d).count().toDouble)
  }

  test("cuzickTrend: agrees in sign with Jonckheere on the same ordered data") {
    val cz = graft.operators.Stats.cuzickTrend(s, d).collect().head
    val jt = graft.operators.Stats.jonckheere(s, d).collect().head
    assert(cz.getAs[Long]("n") === jt.getAs[Long]("n"))
    val zc = cz.getAs[Double]("z_stat"); val zj = jt.getAs[Double]("z_stat")
    // both test the SAME ordered alternative on the same buckets:
    // they must agree in direction (or both be ~null)
    assert(zc * zj >= 0.0 || (math.abs(zc) < 0.5 && math.abs(zj) < 0.5))
  }

  test("aqpStratified: combined estimate equals the stratum sum") {
    val rows = graft.operators.Stats.aqpStratified(s, d).collect()
    assert(rows.length === 3)
    val sumEst = rows.map(_.getAs[Double]("est_musd")).sum
    val comb = rows.head.getAs[Double]("combined_est_musd")
    assert(math.abs(sumEst - comb) < 0.01)
    // stratified rates actually differ per flag
    assert(rows.map(r => r.getAs[Long]("n_sampled").toDouble /
      r.getAs[Long]("n_rows")).distinct.length === 3)
  }
}
