package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** PageRank invariants on the sf0.001 trade graph. */
class GraphSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("pageRank: mass conserved, strictly positive, one row per node") {
    val rows = Graph.pageRank(spark, TestSpark.sfDir, iters = 3).collect()
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.forall(_ > 0))
    // undirected graph has no dangling nodes → total rank stays 1
    // (up to the 4-decimal output rounding across n nodes)
    assert(math.abs(ranks.sum - 1.0) < rows.length * 1e-4)
    assert(rows.map(_.getAs[Long]("node")).distinct.length === rows.length)
    // both parity namespaces present (even = customer, odd = supplier)
    assert(rows.exists(_.getAs[Long]("node") % 2 == 0))
    assert(rows.exists(_.getAs[Long]("node") % 2 == 1))
  }

  test("personalizedPageRank: mass conserved, concentrated on the seed set") {
    val rows = Graph.personalizedPageRank(spark, TestSpark.sfDir, iters = 3).collect()
    val m = rows.map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    // teleport returns to seeds and the graph has no dangling nodes:
    // total mass stays 1 (up to output rounding)
    assert(math.abs(m.values.sum - 1.0) < rows.size * 1e-4)
    assert(m.values.forall(_ >= 0.0))
    val seeds = m.filter { case (n, _) => n % 100 == 0 }
    assert(seeds.nonEmpty && seeds.values.forall(_ > 0.0))
    // versus uniform PageRank, the seed set must hold MORE mass
    val uni = Graph.pageRank(spark, TestSpark.sfDir, iters = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    assert(seeds.values.sum > seeds.keys.map(uni).sum,
      "personalization must concentrate mass on the seeds")
  }

  test("hits: L1-normalized per role, positive, deterministic") {
    val rows = Graph.hits(spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("key"),
        r.getAs[Double]("score")))
    val byRole = rows.groupBy(_._1)
    assert(byRole.keySet === Set("hub", "authority"))
    byRole.foreach { case (role, rs) =>
      assert(rs.forall(_._3 >= 0.0))
      assert(math.abs(rs.map(_._3).sum - 1.0) < rs.size * 1e-4,
        s"$role scores must stay L1-normalized")
    }
    // authorities live in the supplier key space, hubs in the customer's
    val again = Graph.hits(spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("key"),
        r.getAs[Double]("score")))
    assert(rows.toSeq === again.toSeq, "fixed-round HITS must be deterministic")
  }

  test("kCoreOnEdges: K4 plus a pendant chain peels to exactly the K4") {
    val s = spark
    import s.implicits._
    // K4 on 1..4 (3-core), chain 4-5-6 (peels away at k=3)
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val und = (k4 ++ Seq((4L, 5L), (5L, 6L)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val got = Graph.kCoreOnEdges(und, k = 3, rounds = 4).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: the single-task peel and the distributed iteration " +
      "agree exactly (same fixed-round simultaneous-removal semantics)") {
    val s = spark
    import s.implicits._
    // K4 core + pendant chain + a triangle that survives k=2 only
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val extra = Seq((4L, 5L), (5L, 6L), (7L, 8L), (8L, 9L), (9L, 7L))
    val und = (k4 ++ extra)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    for ((k, rounds) <- Seq((2, 1), (2, 3), (3, 2), (3, 4))) {
      def m(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
      assert(m(Graph.kCoreOnEdges(und, k, rounds)) ===
        m(Graph.kCoreDistributed(und, k, rounds)),
        s"paths diverge at k=$k rounds=$rounds")
    }
  }

  test("kCoreOnEdges: a chain fully peels to the empty core") {
    val s = spark
    import s.implicits._
    val und = Seq((1L, 2L), (2L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    assert(Graph.kCoreOnEdges(und, k = 2, rounds = 3).count() === 0)
  }

  test("lpaCommunities matches an in-memory sync-LPA reference on a crafted graph") {
    val s = spark
    import s.implicits._
    // two triangles bridged by one edge: LPA must keep them distinct
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
        (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("a", "b")
    val got = Graph.lpaOnEdges(spark, und, iters = 4).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community")).toMap
    // reference: synchronous plurality with min-label tie-break
    val adj = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
        (3L, 4L))
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 4) {
      lab = adj.map { case (v, ns) =>
        val counts = ns.groupBy(lab).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got === lab)
    assert(got.values.toSet.size >= 2, "bridged triangles must not collapse")
  }

  test("broadcast ceiling: over-threshold graphs take hash joins, same results") {
    val s = spark
    import s.implicits._
    // ring of 60 with chords: nontrivial structure for LPA and k-core
    val ring = (0L until 60L).map(i => (i, (i + 1) % 60))
    val chords = (0L until 60L by 5).map(i => (i, (i + 7) % 60))
    val und = (ring ++ chords)
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("a", "b")
    def lpa() = Graph.lpaOnEdges(spark, und, iters = 4).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community")).toMap
    def core() = Graph.kCoreOnEdges(und, k = 2, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    def ranks() = Graph.pageRank(spark, TestSpark.sfDir, iters = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    val (lpaB, coreB, prB) = (lpa(), core(), ranks())
    // drop the broadcast-path caches: a reused InMemoryRelation embeds
    // its ORIGINAL (hinted) plan and would trip the plan-shape check
    spark.sharedState.cacheManager.clearCache()
    spark.conf.set("spark.graft.graph.broadcastMaxNodes", "0")
    // kill every OTHER broadcast source so a BroadcastHashJoin in the
    // plan could only come from a forced hint that should be gone
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // r15: the small-graph gate routes these public entry points
      // through the single-task kernels, so the hash-path plan-shape
      // checks must drive the Distributed implementations directly —
      // which also asserts kernel ≡ distributed-hash equality.
      val lpaH = Graph.lpaDistributed(spark, und, iters = 4)
      assert(!lpaH.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "label-vector join must not force a broadcast past the ceiling")
      assert(lpaH.collect()
        .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community"))
        .toMap === lpaB)
      val coreH = Graph.kCoreDistributed(und, k = 2, rounds = 3)
      assert(!coreH.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "survivor-set joins must not force a broadcast past the ceiling")
      assert(coreH.collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg"))
        .toMap === coreB)
      import org.apache.spark.sql.functions.col
      val cs = Graph.tradeParityEdges(spark, TestSpark.sfDir)
      val sfEdges = cs.unionByName(
        cs.select(col("b").as("a"), col("a").as("b")))
      val prH = Graph.pageRankDistributed(spark, sfEdges, 3, 0.85)
        .collect().map(r => r.getAs[Long]("node") ->
          (math.floor(r.getAs[Double]("rank") * 10000 + 0.5 + 1e-6) / 10000))
        .toMap
      assert(prH === prB, "pageRank hash path must match the kernel path")
    } finally {
      spark.conf.unset("spark.graft.graph.broadcastMaxNodes")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("lpaCommunities: every label is a member node, deterministic across runs") {
    val a = Graph.lpaCommunities(spark, TestSpark.sfDir).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community"))
    val b = Graph.lpaCommunities(spark, TestSpark.sfDir).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community"))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq)
    val nodes = a.map(_._1).toSet
    assert(a.forall { case (_, label) => nodes(label) })
  }

  test("r15 single-task kernels ≡ distributed iterations on the " +
      "sf0.001 trade graph (every fixed-point family)") {
    import org.apache.spark.sql.functions.col
    val s = spark
    val dir = TestSpark.sfDir
    val cs = Graph.tradeParityEdges(s, dir)
    val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    def dm(df: org.apache.spark.sql.DataFrame, k: String, v: String) =
      df.collect().map(r => r.getAs[Long](k) -> r.getAs[Double](v)).toMap
    def close(a: Map[Long, Double], b: Map[Long, Double], what: String,
        tol: Double = 1e-9): Unit = {
      assert(a.keySet === b.keySet, s"$what: node sets diverge")
      a.foreach { case (n, va) =>
        assert(math.abs(va - b(n)) <= tol, s"$what: node $n $va vs ${b(n)}")
      }
    }
    // pagerank / ppr / katz: raw vectors within FP-reorder tolerance
    close(dm(Graph.prKernel(edges, 3, 0.85, personalized = false),
        "node", "rank"),
      dm(Graph.pageRankDistributed(s, edges, 3, 0.85), "node", "rank"),
      "pageRank")
    close(dm(Graph.prKernel(edges, 3, 0.85, personalized = true),
        "node", "rank"),
      dm(Graph.pprDistributed(s, edges, 3, 0.85), "node", "rank"),
      "personalized pageRank")
    close(dm(Graph.katzKernel(edges, 3, 0.05), "node", "x"),
      dm(Graph.katzDistributed(s, edges, 3, 0.05), "node", "x"), "katz")
    // hits: per-iteration q6 quantization → at most one 1e-6 grid step
    val he = Graph.tradePairs(s, dir)
      .select(col("cust").as("c"), col("supp").as("p"))
    def hm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("key")) ->
        r.getAs[Double]("score")).toMap
    val (hK, hD) = (hm(Graph.hitsKernel(he, 2)), hm(Graph.hitsDistributed(s, he, 2)))
    assert(hK.keySet === hD.keySet)
    hK.foreach { case (k, v) =>
      assert(math.abs(v - hD(k)) <= 1.1e-6, s"hits $k: $v vs ${hD(k)}") }
    // integer families: exact equality
    def im(df: org.apache.spark.sql.DataFrame, k: String, v: String) =
      df.collect().map(r => r.getAs[Long](k) -> r.getAs[Int](v)).toMap
    assert(im(Graph.bfsKernel(edges, 3), "node", "dist") ===
      im(Graph.bfsHopsDistributed(s, edges, 3), "node", "dist"), "bfsHops")
    def sm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("node")) ->
        r.getAs[Int]("dist")).toMap
    val seeds = Seq(1L, 2L, 3L, 4L, 5L).map(_ * 2)
    assert(sm(Graph.seededBfsKernel(edges, seeds, 4)) ===
      sm(Graph.seededBfsDistributed(s, edges, seeds, 4)), "seededBfs")
    assert(Graph.lpaKernel(edges, 4).collect()
        .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community")).toMap
      === Graph.lpaDistributed(s, edges, 4).collect()
        .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("community")).toMap,
      "lpa")
  }

  test("triangleCounts equals the brute-force 3-clique enumeration") {
    val dir = TestSpark.sfDir
    val got = Graph.triangleCounts(spark, dir).collect()
      .map(r => r.getAs[Long]("supplier") -> r.getAs[Long]("n_triangles")).toMap
    // brute force: materialize the same projected edge set, enumerate
    // all vertex triples driver-side (sf0.001 graph is tiny)
    import org.apache.spark.sql.functions._
    val ps = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 48)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val edges = ps.as("x").join(ps.as("y"), "l_partkey")
      .filter(col("x.l_suppkey") < col("y.l_suppkey"))
      .select(col("x.l_suppkey"), col("y.l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expect = scala.collection.mutable.Map.empty[Long, Long]
    for {
      (a, ia) <- verts.zipWithIndex
      b <- verts.drop(ia + 1) if edges((a, b))
      c <- verts.dropWhile(_ <= b) if edges((b, c)) && edges((a, c))
    } expect(a) = expect.getOrElse(a, 0L) + 1L
    assert(got === expect.toMap)
    assert(got.values.sum > 0, "fixture graph should contain triangles")
  }
}
