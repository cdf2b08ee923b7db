package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Relational, Similarity, TextAnalysis}

/** Specs for the regression/moment/bool-bit/decimal aggregates, BFS,
  * Zipf fit, regex profile, and centroid-separation operators. */
class StatsGraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("regrAgg: slope/intercept reproduce the closed-form least squares") {
    val rows = Relational.regrAgg(spark, dir).collect()
    assert(rows.nonEmpty)
    // closed form on one event type, computed driver-side
    val et = rows.head.getAs[String]("event_type")
    val pts = Tables.events(spark, dir)
      .filter(col("event_type") === et && col("value").isNotNull)
      .select(unix_timestamp(col("ts")).cast("double"), col("value"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = pts.length.toDouble
    val mx = pts.map(_._1).sum / n
    val my = pts.map(_._2).sum / n
    val sxy = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sxx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    val want = sxy / sxx * 1e6
    val got = rows.find(_.getAs[String]("event_type") == et).get
      .getAs[Double]("slope_us")
    assert(math.abs(got - want) < 1e-2, s"slope_us $got vs $want")
    assert(rows.forall(_.getAs[Long]("n_pairs") > 0))
  }

  test("skewKurt: symmetric two-point distribution has skew 0, kurt -2") {
    val fx = TestSpark.eventsFixture((1L to 8L).map { i =>
      (i, i % 2, "t", java.lang.Double.valueOf(if (i % 2 == 0) 1.0 else -1.0),
        1700000000000000000L + i * 1000000000L)
    })
    val r = Relational.skewKurt(spark, fx).collect()
    assert(r.length == 1)
    assert(math.abs(r.head.getAs[Double]("skew")) < 1e-9)
    assert(math.abs(r.head.getAs[Double]("kurt") - (-2.0)) < 1e-9)
    assert(r.head.getAs[Long]("n_valued") == 8L)
  }

  test("flagsAgg: xor checksum is order-independent and self-inverse") {
    val rows = Relational.flagsAgg(spark, dir).collect()
    assert(rows.nonEmpty)
    // xor of all per-group xors == xor over the whole table
    val whole = Tables.lineitem(spark, dir)
      .agg(bit_xor(col("l_orderkey"))).collect()(0).getLong(0)
    val folded = rows.map(_.getAs[Long]("key_xor")).reduce(_ ^ _)
    assert(folded == whole)
    assert(rows.forall(_.getAs[Boolean]("all_pos_qty")))
  }

  test("decimalSums: decimal sum equals exact cents arithmetic") {
    val rows = Relational.decimalSums(spark, dir).collect()
    val exact = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_returnflag")).agg(sum(col("cents")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val got = BigDecimal(r.getAs[Double]("sum_price")) * 100
      assert(got.toLong == exact(r.getAs[String]("l_returnflag")))
    }
  }

  test("bfsHops: dist 0 exactly on seeds; every dist-h node has a dist-(h-1) neighbor") {
    val d = Graph.bfsHops(spark, dir, maxHops = 2).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    assert(d.nonEmpty)
    d.foreach { case (n, h) => if (n % 100 == 0) assert(h == 0) }
    assert(d.filter(_._2 == 0).keys.forall(_ % 100 == 0))
    // reconstruct edges and check layer consistency
    val cs = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (cs ++ cs.map(_.swap)).groupMap(_._1)(_._2)
    d.foreach { case (n, h) =>
      if (h > 0)
        assert(adj.getOrElse(n, Array.empty[Long]).exists(m => d.get(m).contains(h - 1)),
          s"node $n at dist $h lacks a dist-${h - 1} neighbor")
    }
  }

  test("benfordProfile: exact digit counts, log-law expectations, chi2 >= 0") {
    val rows = Relational.benfordProfile(spark, dir).collect()
      .map(r => r.getAs[Int]("digit") -> r).toMap
    // brute-force digit histogram over the same table
    val prices = Tables.orders(spark, dir)
      .select(org.apache.spark.sql.functions.col("o_totalprice"))
      .collect().map(_.getDouble(0)).filter(_ > 0)
    val want = prices.map(p => math.floor(p).toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.keySet === want.keySet)
    rows.foreach { case (d, r) =>
      assert(r.getAs[Long]("n") === want(d))
      val expFrac = math.log(1.0 + 1.0 / d) / math.log(10.0)
      assert(r.getAs[Double]("exp_frac") ===
        math.floor(expFrac * 10000 + 0.5 + 1e-6) / 10000)
      assert(r.getAs[Double]("chi2_term") >= 0.0)
    }
  }

  test("skyline: sort-sweep result equals brute-force dominance") {
    val parts = Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val want = parts.filter { case (_, sz, pr) =>
      !parts.exists { case (_, sz2, pr2) =>
        sz2 >= sz && pr2 <= pr && (sz2 > sz || pr2 < pr)
      }
    }.map(_._1).toSet
    val got = Relational.skyline(spark, dir).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("analyzeStats: per-column rows reproduce directly computed aggregates") {
    val rows = Relational.analyzeStats(spark, dir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.keySet === Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    val qs = Tables.lineitem(spark, dir)
      .select(org.apache.spark.sql.functions.col("l_quantity"))
      .collect().map(_.getDouble(0))
    val r = rows("l_quantity")
    assert(r.getAs[Long]("n_values") === qs.length.toLong)
    assert(r.getAs[Long]("n_nulls") === 0L)
    assert(r.getAs[Long]("ndv") === qs.distinct.length.toLong)
    assert(r.getAs[Double]("min_val") === math.floor(qs.min * 10000 + 0.5 + 1e-6) / 10000)
    assert(r.getAs[Double]("max_val") === math.floor(qs.max * 10000 + 0.5 + 1e-6) / 10000)
    val mean = qs.sum / qs.length
    assert(math.abs(r.getAs[Double]("mean_val") - mean) < 1e-3)
  }

  test("logisticGd: matches a driver-side replay of the quantized GD loop") {
    val r = Relational.logisticGd(spark, dir).collect()(0)
    val data = Tables.orders(spark, dir)
      .select(col("o_totalprice"), col("o_orderpriority")).collect()
      .map(row => (row.getDouble(0),
        if (Set("1-URGENT", "2-HIGH")(row.getString(1))) 1.0 else 0.0))
    def q6(v: Double) = math.floor(v * 1e6 + 0.5 + 1e-6) / 1e6
    val mu = q6(data.map(_._1).sum / data.length)
    val sg = q6(math.sqrt(
      data.map(p => math.pow(p._1 - mu, 2)).sum / data.length))
    val xy = data.map { case (t, y) => ((t - mu) / sg, y) }
    var (w, b) = (0.0, 0.0)
    for (_ <- 1 to 3) {
      val gs = xy.map { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(w * x + b))); ((p - y) * x, p - y)
      }
      val (w2, b2) = (q6(w - 0.5 * gs.map(_._1).sum / gs.length),
        q6(b - 0.5 * gs.map(_._2).sum / gs.length))
      w = w2; b = b2
    }
    // driver-side sums accumulate in a different order than Spark's
    // partial aggregation — agreement is up to the 1e-6 quantization
    assert(math.abs(r.getAs[Double]("w") - w) < 1e-5, s"w ${r.getAs[Double]("w")} vs $w")
    assert(math.abs(r.getAs[Double]("b") - b) < 1e-5)
    assert(r.getAs[Double]("log_loss") > 0 && r.getAs[Double]("log_loss") < 0.6932)
    assert(r.getAs[Long]("n") === data.length.toLong)
  }

  test("equiDepthHist: 8 near-equal buckets, ordered non-overlapping ranges") {
    val rows = Relational.equiDepthHist(spark, dir).collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq === (1 to 8))
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.orders(spark, dir).count())
    // equi-depth: every bucket within 5% of the ideal share (ties and
    // interpolation can nudge rows across a boundary, never far)
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      assert(math.abs(n - total / 8.0) <= total * 0.05, s"bucket $r")
    }
    // ranges ordered and non-overlapping
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
    }
  }

  test("zipfSlope: slope negative on natural-ish text, r2 in [0,1]") {
    val r = TextAnalysis.zipfSlope(spark, dir).collect()(0)
    assert(r.getAs[Double]("zipf_slope") < 0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0 && r2 <= 1)
    assert(r.getAs[Long]("n_tokens") > 10)
  }

  test("regexStats: crafted doc counts digits/caps/sentence marks exactly") {
    val fx = TestSpark.documentsFixture(Seq(
      (1L, "Al saw 12 cats and 7 dogs. Did Bo? Yes!", "en", "web")))
    val r = TextAnalysis.regexStats(spark, fx).collect()(0)
    assert(r.getAs[Long]("n_digit_runs") == 2)   // 12, 7
    assert(r.getAs[Long]("n_cap_words") == 4)    // Al, Did, Bo, Yes
    assert(r.getAs[Long]("n_sentence_marks") == 3) // . ? !
  }

  test("centroidCosine: identical labels' centroids have cosine 1") {
    val v1 = Array.tabulate(8)(i => (i + 1).toFloat)
    val v2 = v1.map(_ * 2) // same direction, different norm
    val fx = TestSpark.embeddingsFixture(Seq(
      (1L, v1, 0), (2L, v1, 0), (3L, v2, 1), (4L, v2, 1)))
    val r = Similarity.centroidCosine(spark, fx).collect()
    assert(r.length == 1)
    assert(math.abs(r.head.getAs[Double]("centroid_cosine") - 1.0) < 1e-4)
  }

  test("classifierEval: AUC in [0,1], counts cover the corpus, F1 consistent") {
    val r = Relational.classifierEval(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val auc = row.getAs[Double]("auc_binned")
    assert(auc >= 0.0 && auc <= 1.0)
    assert(row.getAs[Long]("n_pos") + row.getAs[Long]("n_neg") ==
      Tables.orders(spark, dir).count())
    val p = row.getAs[Double]("precision"); val rec = row.getAs[Double]("recall")
    val f1 = row.getAs[Double]("f1")
    // F1 is the harmonic mean of P and R (4-decimal rounding slack)
    assert(math.abs(f1 - 2 * p * rec / (p + rec)) < 1e-3)
  }

  test("classifierEval: a narrower bin width only refines the AUC") {
    val coarse = Relational.classifierEval(spark, dir, binWidth = 100000.0)
      .collect().head.getAs[Double]("auc_binned")
    val fine = Relational.classifierEval(spark, dir, binWidth = 100.0)
      .collect().head.getAs[Double]("auc_binned")
    // same underlying ranking: binned estimates agree within bucket noise
    assert(math.abs(coarse - fine) < 0.05, s"coarse $coarse vs fine $fine")
  }

  test("kAnonymityProfile: group sizes sum to the customer count") {
    val rows = Relational.kAnonymityProfile(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("group_size")).sum ==
      Tables.customer(spark, dir).count())
    assert(rows.forall { r =>
      r.getAs[Boolean]("k_anonymous") == (r.getAs[Long]("group_size") >= 5)
    })
  }

  test("joinSizeEstimate: CM estimate is an upper bound within the error guarantee") {
    val row = Relational.joinSizeEstimate(spark, dir).collect().head
    val exact = row.getAs[Long]("exact_rows")
    val est = row.getAs[Long]("cms_estimate")
    // CM inner-product: exact <= est <= exact + e*|A|*|B|/width (w.h.p.)
    assert(est >= exact)
    val a = Tables.lineitem(spark, dir).count()
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").count()
    val bound = exact + (math.E * a * b / 16384.0).toLong
    assert(est <= bound, s"est $est above bound $bound")
  }

  test("linkPrediction: scores rare shared suppliers above hubs") {
    val rows = Graph.linkPrediction(spark, dir, topN = 1000).collect()
    assert(rows.nonEmpty)
    // adamic-adar >= common_neighbors / ln(maxDeg) and every pair ordered
    assert(rows.forall { r =>
      r.getAs[Long]("cust_a") < r.getAs[Long]("cust_b") &&
        r.getAs[Double]("adamic_adar") > 0.0
    })
  }

  test("assortativity: bipartite trade graph is disassortative") {
    val r = Graph.assortativity(spark, dir).head()
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
    // customer↔supplier structure: high-degree hubs attach to
    // low-degree counterparts, so the correlation must be negative
    assert(a < 0.0)
    assert(r.getAs[Long]("n_edges") > 0)
  }

  test("closenessCentrality matches a from-scratch BFS per seed") {
    val got = Graph.closenessCentrality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference BFS over collected edges
    val cs = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = (cs ++ cs.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val want = Seq(1L, 2L, 3L, 4L, 5L).map { k =>
      val seed = k * 2
      var dist = Map(seed -> 0)
      var frontier = Set(seed)
      (1 to 4).foreach { h =>
        val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .diff(dist.keySet)
        dist = dist ++ next.map(_ -> h)
        frontier = next
      }
      val reached = dist.filter(_._2 > 0)
      (k, reached.size.toLong, reached.values.map(_.toLong).sum)
    }.toSet
    assert(got === want)
  }

  test("quantAgreement: fp winner equals the brute top-1; sims close") {
    val got = graft.operators.Similarity.quantAgreement(spark, dir).collect()
    assert(got.nonEmpty)
    val brute = graft.operators.Similarity.knnBrute(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    got.foreach { r =>
      assert(r.getAs[Long]("fp_top1") === brute(r.getAs[Long]("query_id")))
      // int8 cosine stays within quantization error of fp cosine
      assert(math.abs(r.getAs[Double]("fp_sim") -
        r.getAs[Double]("q8_sim")) < 0.05)
    }
  }

  test("matryoshkaAgreement: full-dim winner equals the exact brute top-1") {
    val got = graft.operators.Similarity.matryoshkaAgreement(spark, dir)
      .collect()
    assert(got.nonEmpty)
    val brute = graft.operators.Similarity.knnBrute(spark, dir)
      .filter(org.apache.spark.sql.functions.col("rank") === 1)
      .collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .toMap
    got.foreach { r =>
      assert(r.getAs[Long]("full_top1") === brute(r.getAs[Long]("query_id")))
      assert(r.getAs[Boolean]("agree") ===
        (r.getAs[Long]("full_top1") == r.getAs[Long]("trunc_top1")))
    }
  }

  test("regionModularity: bounded in [-1,1]; edges conserve lineitem pairs") {
    val r = Graph.regionModularity(spark, dir).head()
    val q = r.getAs[Double]("modularity")
    assert(q >= -1.0 && q <= 1.0)
    assert(r.getAs[Long]("n_edges") > 0)
  }

  test("tradeReciprocity: ratio is n_recip/n_edges in [0,1]") {
    val r = Graph.tradeReciprocity(spark, dir).head()
    val (e, rec, ratio) = (r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_recip"), r.getAs[Double]("reciprocity"))
    assert(rec <= e)
    assert(math.abs(ratio - rec.toDouble / e) < 1e-3)
  }
}
