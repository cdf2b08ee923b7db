package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.Rounding.round4eps

/** Iterative graph analytics on Spark DataFrames. Connected components
  * live in [[Dedup.nearDupClusters]]; this adds PageRank — the
  * canonical "iterate a keyed join + aggregate to a fixed point"
  * workload, and the shape (beside CC) that distinguishes a dataflow
  * engine from a one-shot query engine.
  *
  * Scale posture: each iteration is one join keyed on the edge source
  * + one aggregate keyed on the edge target — both hash-partitioned on
  * node id, so a 100 TB edge list distributes evenly (skewed hub nodes
  * are bounded by the aggregate's map-side partials). The edge list
  * and out-degrees are computed once and persisted; iteration count is
  * fixed (no driver-side convergence collect in the hot path).
  */
object Graph {

  // ---- shared graph projections (r13 verdict Next #6) ---------------
  //
  // The consolidated audit of the iteration harness found ONE shared
  // constant across the graph gates: every operator rebuilt its edge
  // projection from the fact join per invocation (~1 s of each 2–3 s
  // gate at sf0.1 — ten rebuilds of the DISTINCT customer–supplier
  // pair frame, three of the co-supplier projection). Both are now
  // built once per (session, dir, filter), persisted and materialized
  // eagerly; operators derive their edge shape (parity ids, directed
  // c→p, flipped union) as cheap projections over the cache. The
  // cached frames are node-pair-cardinality (dimension-bounded:
  // customers × suppliers — MB-scale at any corpus size), and live for
  // the session like gatePipeline's fixture memo; per-operator
  // iteration persists (withDeg, per-round vectors) keep their
  // caller-owned lifecycle unchanged.
  // Keyed by sessionUUID (a String — no strong reference to the
  // SparkSession through the KEY) in a bounded LRU across sessions:
  // the cached DataFrame VALUES strongly reference their session, so a
  // WeakHashMap keyed by the session itself could never collect an
  // entry, and under the Thrift endpoint's per-connection clones the
  // cache grew one pinned session graph per dead connection (r14
  // ADVICE). Evicting the eldest session unpersists its frames, making
  // the dead session's lineage collectible; an ACTIVE session that
  // gets evicted under pressure merely re-arms (persist + count) on
  // its next graph-gate call, the same path as post-clearCache.
  private val MaxCachedSessions = 8
  private type PairMap = java.util.concurrent.ConcurrentHashMap[
    (String, String, Option[Double]), DataFrame]
  private val pairCache =
    new java.util.LinkedHashMap[String, PairMap](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, PairMap]): Boolean = {
        val evict = size() > MaxCachedSessions
        if (evict) e.getValue.values().forEach { df =>
          try { df.unpersist(blocking = false); () }
          catch { case _: Throwable => () } // session may be stopped
        }
        evict
      }
    }

  /** Test hook: number of sessions currently holding cached graph
    * projections (bounded by MaxCachedSessions). */
  private[graft] def cachedSessionCount: Int =
    pairCache.synchronized(pairCache.size())

  // sessionUUID is Scala-private[sql] but public at the bytecode level
  // (the stable per-clone identity the Thrift endpoint hands each
  // connection); reflection reads it without depending on the
  // classic-session internal API surface
  private def sessionKey(s: SparkSession): String =
    try s.getClass.getMethod("sessionUUID").invoke(s).asInstanceOf[String]
    catch { case _: Throwable => "session-id-" + System.identityHashCode(s) }

  private def cached(s: SparkSession, key: (String, String, Option[Double]))(
      build: => DataFrame): DataFrame = {
    val inner = pairCache.synchronized {
      pairCache.computeIfAbsent(sessionKey(s), _ => new PairMap)
    }
    val df = inner.computeIfAbsent(key, _ => build)
    // RE-ARM on every call: the harness (and any hygiene-minded
    // caller) clearCache()s between queries, which silently strips the
    // memoized frame's persist registration — without this check every
    // later graph gate recomputed the fact join uncached in BOTH its
    // warmup and measured runs (caught at ×100: bfs 13.8 s solo →
    // 50-57 s after another graph gate, cascading to stage-
    // materialization failures under memory churn).
    if (df.storageLevel == StorageLevel.NONE) {
      df.persistMemDisk
      df.count() // materialize eagerly, once per re-arm
    }
    df
  }

  /** DISTINCT (cust, supp) trade pairs, optionally quantity-
    * sparsified — the shared prefix of the trade-graph family. */
  private[graft] def tradePairs(s: SparkSession, dir: String,
      minQuantity: Option[Double] = None): DataFrame =
    cached(s, (dir, "trade", minQuantity)) {
      val li0 = Tables.lineitem(s, dir)
      val li = minQuantity.fold(li0)(q => li0.filter(col("l_quantity") >= q))
      li.select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
        .distinct()
    }

  /** Parity-namespaced directed half (customer 2k → supplier 2k+1) of
    * the cached pair frame; callers union the flip for undirected. */
  private[graft] def tradeParityEdges(s: SparkSession, dir: String,
      minQuantity: Option[Double] = None): DataFrame =
    tradePairs(s, dir, minQuantity)
      .select((col("cust") * 2).as("a"), (col("supp") * 2 + 1).as("b"))

  /** Low→high-oriented distinct co-supplier edges (suppliers sharing a
    * part, quantity-sparsified) — the triangles-family projection. */
  private[graft] def coSupplierEdges(s: SparkSession, dir: String,
      minQty: Double): DataFrame =
    cached(s, (dir, "cosupp", Some(minQty))) {
      val ps = Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= minQty)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      ps.as("x").join(ps.as("y"), "l_partkey")
        .filter(col("x.l_suppkey") < col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("a"), col("y.l_suppkey").as("b"))
        .distinct()
    }

  /** Checkpointing for iterative loops, mode-switched on deployment:
    *
    *  - **Cluster** (SPARK_GRAFT_CHECKPOINT_DIR set to a DFS path):
    *    reliable `checkpoint()` — `localCheckpoint` pins blocks in
    *    executor storage that are NOT recomputable, so an executor
    *    loss mid-iteration kills the job; a reliable checkpoint of the
    *    (node-cardinality, tiny relative to edges) per-round vector
    *    survives it. The input is persisted first: an unpersisted
    *    reliable checkpoint runs a SECOND write job that recomputes
    *    the whole round (RDD.checkpoint semantics) — persist makes the
    *    write job a cache read, halving per-round cost.
    *  - **Single JVM** (env unset — the local gate): `localCheckpoint`,
    *    which materializes once into local storage blocks. No
    *    executor-loss exposure exists in one JVM, and skipping the
    *    file round-trip removes the dominant fixed cost per round.
    *
    * Either way the per-round vector is coalesced to a few partitions
    * first (node vectors are orders of magnitude smaller than the edge
    * list — at 32 tasks/round the scheduling overhead exceeds the
    * compute), and the caller unpersists superseded rounds. */
  private[graft] def reliableDir: Option[String] = sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")

  private[graft] def ensureCheckpointDir(s: SparkSession): Unit =
    if (s.sparkContext.getCheckpointDir.isEmpty)
      s.sparkContext.setCheckpointDir(reliableDir.getOrElse {
        val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt")
        // single-JVM scratch: reclaim on exit (checkpoint files are
        // otherwise never deleted — unbounded disk growth over a
        // 100+-query harness run)
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(tmp.toFile)
        }))
        tmp.toString
      })

  /** Cut lineage on a small (node-cardinality) per-round vector; see
    * [[ensureCheckpointDir]]. Returns the checkpointed frame; free it
    * with `unpersist()` once the next round is materialized. With
    * `eager = false` the next action on the result materializes the
    * cut (one job total) — local mode only. */
  private[graft] def cutLineage(s: SparkSession, df: DataFrame,
                                eager: Boolean = true): DataFrame = {
    val parts = math.max(1, s.sparkContext.defaultParallelism / 8)
    val small = df.coalesce(parts)
    if (reliableDir.isDefined) {
      val cached = small.persistMemDisk
      val out = cached.checkpoint()
      cached.unpersist(blocking = false)
      out
    } else small.localCheckpoint(eager)
  }

  /** Node-count ceiling below which the per-round node vector (ranks /
    * labels / survivors) is force-broadcast into the edge join. A
    * forced `broadcast()` hint is obeyed REGARDLESS of size and AQE
    * cannot override it — past this ceiling the same joins run
    * hash-partitioned on node id instead (one extra exchange per
    * round, no driver collect). 10 M nodes ≈ 160 MB of (long, double)
    * rows — comfortably under the 8 GB broadcast hard limit and a
    * typical driver heap. Tunable per session via
    * `spark.graft.graph.broadcastMaxNodes`; specs set it to 0 to force
    * the hash path. Measured (README scale table): the UNHINTED path
    * was faster than the forced broadcast at both 10× and 100×
    * (AQE still broadcasts the stages where it pays, with runtime
    * stats instead of a blanket hint) — so production deployments may
    * prefer ceiling 0 outright; the conditional default preserves the
    * no-AQE/no-stats behavior while capping the blast radius. */
  private[graft] def broadcastMaxNodes(s: SparkSession): Long =
    s.conf.getOption("spark.graft.graph.broadcastMaxNodes")
      .map(_.toLong).getOrElse(10000000L)

  /** The size-conditional hint: broadcast only when the measured node
    * count cleared [[broadcastMaxNodes]]. */
  private[graft] def hintSmall(df: DataFrame, isSmall: Boolean): DataFrame =
    if (isSmall) broadcast(df) else df

  /** PageRank over the customer–supplier trade graph (an edge per
    * distinct (customer, supplier) order relationship, traversed both
    * ways so the graph is undirected and free of dangling nodes).
    * Fixed `iters` power iterations with damping 0.85:
    * r'(v) = (1-d)/N + d · Σ_{u~v} r(u)/deg(u).
    * Node ids are LONGS namespaced by parity (customer k → 2k,
    * supplier k → 2k+1): customer and supplier keys share the integer
    * space, and an 8-byte key shuffles and hashes far cheaper than a
    * string — at 100 TB the iteration shuffles dominate, so key width
    * is the lever. */
  def pageRank(s: SparkSession, dir: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    val ranks =
      if (smallGraph(edges)) prKernel(edges, iters, damping,
        personalized = false)
      else pageRankDistributed(s, edges, iters, damping)
    ranks.select(col("node"), round4eps(col("rank")).as("rank"))
  }

  /** Distributed power iteration — the 100 TB path (see the
    * small-graph kernel note at [[smallGraph]]). Returns raw ranks. */
  private[graft] def pageRankDistributed(s: SparkSession, edges: DataFrame,
      iters: Int, damping: Double): DataFrame = {
    ensureCheckpointDir(s)
    val withDeg = edges
      .join(edges.groupBy(col("a")).agg(count(lit(1)).as("outdeg")), "a")
      .persistMemDisk
    // undirected ⇒ every node appears as a source; outdeg ≥ 1 always
    val nodes = withDeg.select(col("a").as("node")).distinct()
      .persistMemDisk
    // ONE scalar off the persisted node frame decides broadcast-vs-hash
    // for every round (and doubles as the PageRank N term)
    val nNodes = nodes.count()
    val small = nNodes <= broadcastMaxNodes(s)
    // The rank vector is node-cardinality (the dimension side of this
    // graph: customers + suppliers), orders of magnitude smaller than
    // the edge list — while it fits the broadcast ceiling, broadcast it
    // so each iteration streams the edges once with NO edge shuffle or
    // sort. Past the ceiling the joins run hash-partitioned on node id:
    // the edge list is pre-repartitioned on its join key ONCE and
    // persisted, so each round shuffles only the node vector.
    // (hash path: the repartitioned copy reads the cached withDeg once;
    // both stay persisted — MEMORY_AND_DISK spills, caller clears)
    val iterEdges = if (small) withDeg
      else withDeg.repartition(col("a")).persistMemDisk
    var ranks = nodes.select(col("node"), lit(1.0 / nNodes).as("rank"))
    var prevRound: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = iterEdges.join(hintSmall(ranks, small), col("a") === col("node"))
        .groupBy(col("b")).agg(sum(col("rank") / col("outdeg")).as("mass"))
      ranks = nodes
        .join(hintSmall(contrib, small), col("node") === col("b"), "left")
        .select(col("node"),
          lit((1 - damping) / nNodes) +
            lit(damping) * coalesce(col("mass"), lit(0.0)) as "rank")
      // Cut lineage EVERY OTHER round: without any cut the final plan
      // nests `iters` broadcast-join trees (optimizer time grows with
      // the plan, and each broadcast subtree re-plans the whole
      // prefix); cutting every round doubles the job count for no
      // benefit — a 2-round lineage of broadcast joins is still tiny.
      // Skip the last round (the caller's action materializes it) and
      // free the superseded cut — its blocks fed only rounds since.
      if (i % 2 == 0 && i < iters) {
        ranks = cutLineage(s, ranks)
        if (prevRound != null) prevRound.unpersist(blocking = false)
        prevRound = ranks
      }
    }
    ranks
  }

  /** Personalized PageRank (Haveliwala 2002; the recommender /
    * trust-propagation variant): teleport mass returns to a SEED SET
    * (nodes with id % 100 == 0 — the same seed rule as [[bfsHops]])
    * instead of spreading uniformly, so ranks measure proximity to the
    * seeds —
    *   r'(v) = (1−d)·1[v ∈ S]/|S| + d · Σ_{u~v} r(u)/deg(u).
    * Identical per-round dataflow, broadcast ceiling, and lineage-cut
    * cadence as [[pageRank]]; unreached nodes surface with rank 0
    * (they are part of the answer: "no proximity"). */
  def personalizedPageRank(s: SparkSession, dir: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    val ranks =
      if (smallGraph(edges)) prKernel(edges, iters, damping,
        personalized = true)
      else pprDistributed(s, edges, iters, damping)
    ranks.select(col("node"), round4eps(col("rank")).as("rank"))
  }

  private[graft] def pprDistributed(s: SparkSession, edges: DataFrame,
      iters: Int, damping: Double): DataFrame = {
    ensureCheckpointDir(s)
    val withDeg = edges
      .join(edges.groupBy(col("a")).agg(count(lit(1)).as("outdeg")), "a")
      .persistMemDisk
    val nodes = withDeg.select(col("a").as("node")).distinct()
      .persistMemDisk
    val small = nodes.count() <= broadcastMaxNodes(s)
    val seed = col("node") % 100 === 0
    val nSeeds = nodes.filter(seed).count()
    require(nSeeds > 0, "personalized PageRank needs a non-empty seed set")
    val iterEdges = if (small) withDeg
      else withDeg.repartition(col("a")).persistMemDisk
    var ranks = nodes.select(col("node"),
      when(seed, lit(1.0 / nSeeds)).otherwise(lit(0.0)).as("rank"))
    var prevRound: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = iterEdges.join(hintSmall(ranks, small), col("a") === col("node"))
        .groupBy(col("b")).agg(sum(col("rank") / col("outdeg")).as("mass"))
      ranks = nodes
        .join(hintSmall(contrib, small), col("node") === col("b"), "left")
        .select(col("node"),
          when(seed, lit((1 - damping) / nSeeds)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("mass"), lit(0.0)) as "rank")
      if (i % 2 == 0 && i < iters) {
        ranks = cutLineage(s, ranks)
        if (prevRound != null) prevRound.unpersist(blocking = false)
        prevRound = ranks
      }
    }
    ranks
  }

  /** Triangle counting — the canonical two-join graph kernel — over the
    * co-supplier graph (suppliers sharing a high-quantity part are
    * connected; the quantity filter keeps the projected graph sparse,
    * which is also the realistic shape: bipartite→unipartite
    * projections are only usable with a selectivity guard). Each
    * triangle a<b<c is counted once, at its anchor (minimum) vertex.
    *
    * Scale posture: edges are oriented low→high id, so the join
    * enumerates each wedge exactly once (no /6 dedup blowup); both
    * joins are equi-joins keyed on a vertex id — hash-partitioned,
    * skew-bounded by the orientation trick (a high-degree vertex's
    * wedges split between its lower and higher neighbors). This is the
    * standard MapReduce/Cohen algorithm shape. */
  def triangleCounts(s: SparkSession, dir: String,
                     minQty: Double = 48.0): DataFrame = {
    val e = coSupplierEdges(s, dir, minQty)
    val wedges = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), "b")
    wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .groupBy(col("a")).agg(count(lit(1)).as("n_triangles"))
      .select(col("a").as("supplier"), col("n_triangles"))
  }

  /** Local clustering coefficient per supplier over the co-supplier
    * graph (same selectivity-guarded projection as [[triangleCounts]]):
    * c(v) = 2·t(v) / (d(v)·(d(v)−1)) — how close a node's
    * neighborhood is to a clique, THE local-density feature next to
    * raw degree. Triangles are enumerated once on low→high-oriented
    * edges (Cohen's shape) and then credited to all THREE corners via
    * an in-row explode; degrees are one aggregate over the undirected
    * edge list. Nodes of degree < 2 are excluded (coefficient
    * undefined). */
  def clusteringCoefficients(s: SparkSession, dir: String,
      minQty: Double = 48.0): DataFrame = {
    val e = coSupplierEdges(s, dir, minQty)
    val tri = e.select(col("a"), col("b"))
      .join(e.select(col("a").as("b"), col("b").as("c")), "b")
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    deg.filter(col("d") >= 2)
      .join(perNode, Seq("node"), "left")
      .select(col("node").as("supplier"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("n_triangles"),
        round4eps(lit(2.0) * coalesce(col("t"), lit(0L)) /
          (col("d") * (col("d") - 1))).as("clustering_coef"))
      .orderBy(col("supplier"))
  }

  /** Multi-source BFS: shortest hop distance from the seed set over the
    * customer–supplier trade graph (same parity-namespaced long ids as
    * pageRank; seeds = nodes with id % 100 == 0). Frontier expansion:
    * each round joins ONLY the previous frontier against the edge list
    * (never the full visited set), anti-joins out already-settled
    * nodes, and checkpoints the two small node-sets — so a round costs
    * one edge-keyed hash join over frontier-sized input plus one
    * anti-join, the textbook distributed-BFS plan. Rounds are bounded
    * by maxHops (settled distances are final — BFS layers are optimal
    * on unweighted graphs, no re-relaxation needed). */
  def bfsHops(s: SparkSession, dir: String, maxHops: Int = 3): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val e0 = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    if (smallGraph(e0)) bfsKernel(e0, maxHops)
    else bfsHopsDistributed(s, e0, maxHops)
  }

  private[graft] def bfsHopsDistributed(s: SparkSession, e0: DataFrame,
      maxHops: Int): DataFrame = {
    ensureCheckpointDir(s)
    val edges = e0.persistMemDisk
    var dist = cutLineage(s, edges.select(col("a").as("node")).distinct()
      .filter(col("node") % 100 === 0)
      .withColumn("dist", lit(0)))
    var lastCut = dist
    var frontier = dist.select(col("node"))
    var h = 1
    while (h <= maxHops) {
      val next = frontier.join(edges, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
      dist = dist.unionByName(next)
      // Cut lineage every OTHER round, deriving the next frontier from
      // the union by its dist label instead of materializing it
      // separately: between cuts the plan is at most two rounds of
      // frontier-sized joins over the cached edge list — recomputing
      // that beats paying a materialization job per round. The
      // superseded cut fed only the rounds since, now materialized —
      // free it; storage stays flat at one node-set at any depth.
      if (h % 2 == 0 && h < maxHops) {
        dist = cutLineage(s, dist)
        lastCut.unpersist(blocking = false)
        lastCut = dist
      }
      frontier = dist.filter(col("dist") === h).select(col("node"))
      h += 1
    }
    edges.unpersist(blocking = false)
    dist
  }

  /** Synchronous label propagation communities (Raghavan, Albert &
    * Kumara, 2007) over the customer–supplier trade graph, sparsified
    * by the same high-quantity guard as [[triangles]] (the dense
    * bipartite graph collapses to a monolith in two rounds; the
    * sparsified projection carries real community structure —
    * measured: 129 communities vs 2 unsparsified at sf0.01). Labels
    * init to the node id; each round every node adopts its neighbors'
    * plurality label, ties to the SMALLEST label — fully deterministic,
    * so a fixed round count is an oracle-replayable gate (async LPA's
    * visit-order dependence is not).
    *
    * Per round: one edge join against the broadcast label vector + one
    * (node, label)-keyed count + one node-keyed argmax — the argmax is
    * max(struct(count, -label)), a partial-merged aggregate, never a
    * window. Same broadcast rationale and every-other-round lineage
    * cuts as [[pageRank]]; a node set past the broadcast limit flips
    * the join to hash-partitioned on node id, same shape. */
  def lpaCommunities(s: SparkSession, dir: String, iters: Int = 4,
      minQuantity: Double = 48): DataFrame = {
    val cs = tradeParityEdges(s, dir, Some(minQuantity))
    lpaOnEdges(s, cs.unionByName(cs.select(col("b").as("a"), col("a").as("b"))),
      iters)
  }

  /** Bounded k-core peel (Seidman 1983; the distributed formulation is
    * Montresor et al. 2013's iterated degree-filter) over the same
    * sparsified customer–supplier trade graph as [[lpaCommunities]]:
    * each round drops every node with degree < k and all its edges,
    * for a fixed `rounds` passes. The fixed round count makes the
    * result oracle-replayable (run-to-convergence is the production
    * mode — same loop with an empty-delta stop; convergence is
    * guaranteed since the alive set shrinks monotonically). Output is
    * each surviving node's degree within the peeled subgraph — the
    * standard density screen for graph-shaped training data.
    *
    * Scale posture: a round is one degree aggregate keyed on the edge
    * source plus a two-sided semi-filter of the edge list against the
    * (node-cardinality, broadcastable) survivor set — edges are only
    * ever streamed, never self-joined. Each round's edge frame is
    * persisted so the final action computes every round once (the
    * survivor broadcasts are tiny; a node set past the broadcast limit
    * flips to hash semi-joins on node id, same shape). Lifecycle is
    * caller-owned like pageRank's withDeg. */
  def kCorePeel(s: SparkSession, dir: String, k: Int = 3,
      rounds: Int = 4, minQuantity: Double = 48): DataFrame = {
    val cs = tradeParityEdges(s, dir, Some(minQuantity))
    kCoreOnEdges(cs.unionByName(cs.select(col("b").as("a"), col("a").as("b"))),
      k, rounds)
  }

  /** Peel core over an already-undirected (a, b) edge frame — the spec
    * drives crafted graphs through the identical iteration.
    *
    * Size-gated execution (the same split as Dedup.componentsOf, and
    * the r14 Next #4 fix for q_kcore's 4.5 s stage-floor cost): up to
    * [[Dedup.SmallGraphEdges]] edges the whole peel runs as ONE
    * executor task (O(rounds × E) in a mapPartitions — a 16 k-node
    * graph pays microseconds of compute but ~40 AQE stages × the
    * 0.15–0.24 s local scheduling floor in the iterative plan; the
    * single task removes the floor entirely). Above the gate, the
    * distributed degree-filter iteration (Montresor et al. 2013) in
    * [[kCoreDistributed]] — the 100 TB path — takes over. Both paths
    * implement the identical fixed-round simultaneous-removal
    * semantics, asserted equal in GraphSpec. */
  private[graft] def kCoreOnEdges(undirected: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val s = undirected.sparkSession
    import s.implicits._
    val edges = undirected.persistMemDisk
    val out =
      if (edges.count() <= Dedup.SmallGraphEdges) {
        val peeled = edges
          .select(col("a").cast("long"), col("b").cast("long"))
          .as[(Long, Long)]
          .coalesce(1)
          .mapPartitions { it =>
            var es = it.toArray
            val deg = scala.collection.mutable.LongMap.empty[Long]
            def degrees(): Unit = {
              deg.clear()
              es.foreach { case (a, _) => deg(a) = deg.getOrElse(a, 0L) + 1L }
            }
            for (_ <- 1 to rounds) {
              degrees()
              // simultaneous removal: this round's survivor set is
              // decided entirely from the round-entry degrees
              es = es.filter { case (a, b) =>
                deg.getOrElse(a, 0L) >= k && deg.getOrElse(b, 0L) >= k }
            }
            degrees()
            deg.iterator.map { case (n, d) => (n, d) }
          }
          .toDF("node", "core_deg")
        cutLineage(s, peeled) // node-cardinality result; drop edge lineage
      } else kCoreDistributed(edges, k, rounds)
    edges.unpersist(blocking = false)
    out
  }

  /** Distributed peel round: one degree aggregate + a two-sided
    * survivor semi-filter per round, edges streamed never self-joined
    * — the shape that scales to corpus-sized graphs. */
  private[graft] def kCoreDistributed(undirected: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    var alive = undirected.persistMemDisk
    // size-conditional survivor-set hint: measured ONCE on the initial
    // node set (the survivor set only shrinks, so the decision is
    // conservative for every later round)
    val small = alive.select(col("a")).distinct().count() <=
      broadcastMaxNodes(undirected.sparkSession)
    for (_ <- 1 to rounds) {
      val keep = alive.groupBy(col("a")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("a").as("node"))
      alive = alive
        .join(hintSmall(keep, small), col("a") === col("node")).drop("node")
        .join(hintSmall(keep.select(col("node").as("nb")), small),
          col("b") === col("nb")).drop("nb")
        .persistMemDisk
    }
    alive.groupBy(col("a")).agg(count(lit(1)).as("core_deg"))
      .select(col("a").as("node"), col("core_deg"))
  }

  /** LPA core over an already-undirected (a, b) edge frame — the spec
    * drives crafted graphs through the identical iteration. */
  private[graft] def lpaOnEdges(s: SparkSession, undirected: DataFrame,
      iters: Int): DataFrame =
    if (smallGraph(undirected)) lpaKernel(undirected, iters)
    else lpaDistributed(s, undirected, iters)

  private[graft] def lpaDistributed(s: SparkSession, undirected: DataFrame,
      iters: Int): DataFrame = {
    ensureCheckpointDir(s)
    val edges = undirected.persistMemDisk
    val nodes = edges.select(col("a").as("node")).distinct()
      .persistMemDisk
    // size-conditional label-vector hint, one scalar per call; hash
    // path pre-partitions the edge list on its join key once so each
    // round shuffles only the label vector
    val small = nodes.count() <= broadcastMaxNodes(s)
    val iterEdges = if (small) edges
      else edges.repartition(col("b")).persistMemDisk
    var labels = nodes.select(col("node"), col("node").as("label"))
    var prevRound: DataFrame = null
    for (i <- 1 to iters) {
      val counts = iterEdges.join(hintSmall(labels, small), col("b") === col("node"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("c"))
      labels = counts.groupBy(col("a"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("a").as("node"), (-col("m.nl")).as("label"))
      if (i % 2 == 0 && i < iters) {
        labels = cutLineage(s, labels)
        if (prevRound != null) prevRound.unpersist(blocking = false)
        prevRound = labels
      }
    }
    // edges stays persisted through the caller's action (the last two
    // un-cut rounds re-join it on materialization); lifecycle is
    // caller-owned like pageRank's withDeg — Verify/Bench clearCache.
    labels.select(col("node").as("node_id"), col("label").as("community"))
  }

  /** Log-binned degree distribution of the trade graph — the first
    * thing a graph pipeline prints (power-law or not decides every
    * downstream algorithm's skew posture: hub caps, salting, the
    * broadcast ceiling). Degrees from one edge aggregate; binning is
    * map-side floor(log2(deg)) (an epsilon guards the exact powers of
    * two where two libms could disagree by an ulp); output is one row
    * per occupied bucket. */
  def degreeHistogram(s: SparkSession, dir: String): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    edges.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .groupBy(floor(log2(col("deg")) + lit(1e-9)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
      .orderBy(col("bucket"))
  }

  /** HITS hubs and authorities (Kleinberg 1999) on the DIRECTED
    * customer→supplier trade graph: authorities are suppliers many
    * strong buyers use, hubs are customers who buy from many strong
    * suppliers — the mutually-recursive pair PageRank's single score
    * collapses. Fixed `iters` rounds of
    *   auth = normalize(Aᵀ·hub),  hub = normalize(A·auth)
    * with L1 normalization and the score vector 1e-6-quantized after
    * every normalization (the k-means/logisticGd trick) so the whole
    * iteration is oracle-replayable despite float division.
    *
    * Scale posture: each half-round is one edge-keyed join against
    * the (node-cardinality) score vector plus one keyed sum — the
    * identical dataflow and conditional-broadcast ceiling as
    * [[pageRank]]; normalization totals are 1-row broadcasts. */
  def hits(s: SparkSession, dir: String, iters: Int = 2): DataFrame = {
    val edges = tradePairs(s, dir)
      .select(col("cust").as("c"), col("supp").as("p"))
    val scored =
      if (smallGraph(edges)) hitsKernel(edges, iters)
      else hitsDistributed(s, edges, iters)
    scored.select(col("role"), col("key"),
        round4eps(col("score")).as("score"))
      .orderBy(col("role"), col("key"))
  }

  private[graft] def hitsDistributed(s: SparkSession, edges: DataFrame,
      iters: Int): DataFrame = {
    def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val small = edges.select(col("c")).distinct().count() <=
      broadcastMaxNodes(s)
    var hub = edges.select(col("c")).distinct().withColumn("hub", lit(1.0))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      // persist each half-round's raw vector: it feeds BOTH the
      // normalization total and the normalized scores, and without the
      // cache each reuse replays the entire upstream chain — measured
      // 13 s at sf0.1 uncached vs ~1 s cached (2^(2·iters) blowup).
      // Node-cardinality frames; lifecycle caller-owned as in pageRank.
      val rawA = edges.join(hintSmall(hub, small), "c")
        .groupBy(col("p")).agg(sum(col("hub")).as("raw"))
        .persistMemDisk
      auth = rawA.crossJoin(broadcast(rawA.agg(sum(col("raw")).as("t"))))
        .select(col("p"), q6(col("raw") / col("t")).as("auth"))
      val rawH = edges.join(hintSmall(auth, small), "p")
        .groupBy(col("c")).agg(sum(col("auth")).as("raw"))
        .persistMemDisk
      hub = rawH.crossJoin(broadcast(rawH.agg(sum(col("raw")).as("t"))))
        .select(col("c"), q6(col("raw") / col("t")).as("hub"))
    }
    hub.select(lit("hub").as("role"), col("c").as("key"),
        col("hub").as("score"))
      .unionByName(auth.select(lit("authority").as("role"),
        col("p").as("key"), col("auth").as("score")))
  }

  /** Link prediction on the customer–supplier trade graph: score
    * customer pairs by common neighbors and Adamic–Adar
    * (Σ_{shared supplier s} 1/ln(deg(s)) — shared RARE suppliers count
    * more than shared hubs; Adamic & Adar, Social Networks 25, 2003).
    *
    * Scale posture — wedge enumeration is quadratic in supplier
    * degree, so density is controlled TWICE before any pair exists:
    *  - edges are RepeatEd relationships only (≥ `minOrders` distinct
    *    orders between the pair) — the signal filter; a one-off
    *    purchase is noise for affinity anyway;
    *  - suppliers above `maxDeg` surviving customers are dropped — the
    *    guard rail. A hub's wedges cost deg² yet each carries weight
    *    1/ln(deg) → ~0, the classic worst-cost/least-information term
    *    (same df-cap as the n-gram postings and prefix-filter joins).
    * What remains is one supplier-keyed self-join whose output is
    * Σ capped-deg² — tracked by candidate volume, not corpus². */
  def linkPrediction(s: SparkSession, dir: String, minOrders: Int = 3,
      maxDeg: Int = 1000, topN: Int = 50): DataFrame = {
    val edges = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .agg(countDistinct(col("o_orderkey")).as("n_ord"))
      .filter(col("n_ord") >= minOrders)
      .select(col("cust"), col("supp"))
    val deg = edges.groupBy(col("supp")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= maxDeg)
    val wedgeSide = edges.join(deg, "supp")
    val a = wedgeSide.select(col("supp"), col("cust").as("cust_a"), col("deg"))
    val b = wedgeSide.select(col("supp"), col("cust").as("cust_b"))
    a.join(b, Seq("supp"))
      .filter(col("cust_a") < col("cust_b"))
      .groupBy(col("cust_a"), col("cust_b"))
      .agg(count(lit(1)).as("common_neighbors"),
        round4eps(sum(lit(1.0) / log(col("deg").cast("double")))).as("adamic_adar"))
      .orderBy(col("adamic_adar").desc, col("common_neighbors").desc,
        col("cust_a"), col("cust_b"))
      .limit(topN)
  }

  /** Shared multi-source BFS kernel over the undirected bipartite
    * trade graph (customers at even ids, suppliers at odd): exact hop
    * distances (seed, node, dist) from each seed customer out to
    * maxHops. Frontier-only state with a left-anti revisit dedupe and
    * periodic lineage cuts — the scale discipline documented at
    * [[closenessCentrality]], which consumes this, as does
    * [[eccentricity]]. */
  private def seededBfsDistances(s: SparkSession, dir: String,
      seedCustkeys: Seq[Long], maxHops: Int): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val e0 = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    if (smallGraph(e0)) seededBfsKernel(e0, seedCustkeys.map(_ * 2), maxHops)
    else seededBfsDistributed(s, e0, seedCustkeys.map(_ * 2), maxHops)
  }

  private[graft] def seededBfsDistributed(s: SparkSession, e0: DataFrame,
      seeds: Seq[Long], maxHops: Int): DataFrame = {
    ensureCheckpointDir(s)
    val edges = e0.persistMemDisk
    import s.implicits._
    var dist = cutLineage(s, seeds.map(k => (k, k, 0))
      .toDF("seed", "node", "dist"))
    var lastCut = dist
    var frontier = dist.select(col("seed"), col("node"))
    var h = 1
    while (h <= maxHops) {
      val next = frontier.join(edges, col("node") === col("a"))
        .select(col("seed"), col("b").as("node")).distinct()
        .join(dist.select(col("seed"), col("node")), Seq("seed", "node"),
          "left_anti")
        .withColumn("dist", lit(h))
      dist = dist.unionByName(next)
      if (h % 2 == 0 && h < maxHops) {
        dist = cutLineage(s, dist)
        lastCut.unpersist(blocking = false)
        lastCut = dist
      }
      frontier = dist.filter(col("dist") === h).select(col("seed"), col("node"))
      h += 1
    }
    dist
  }

  /** Horizon-bounded eccentricity per seed: the maximum hop distance
    * any node sits from the seed within the maxHops BFS horizon, plus
    * the reached-set size — the per-node counterpart of a diameter
    * lower bound (max eccentricity over seeds). Same BFS kernel and
    * scale shape as [[closenessCentrality]]. */
  def eccentricity(s: SparkSession, dir: String,
      seedCustkeys: Seq[Long] = Seq(1L, 2L, 3L, 4L, 5L),
      maxHops: Int = 4): DataFrame = {
    seededBfsDistances(s, dir, seedCustkeys, maxHops)
      .filter(col("dist") > 0)
      .groupBy((col("seed") / 2).cast("long").as("seed_custkey"))
      .agg(count(lit(1)).as("n_reached"),
        max(col("dist")).cast("long").as("eccentricity"))
      .orderBy(col("seed_custkey"))
  }

  /** Closeness and harmonic centrality for a fixed seed set via
    * multi-source BFS on the undirected trade graph: exact hop
    * distances from each seed (customers 1..5), closeness =
    * n_reached / Σdist, harmonic = Σ 1/dist — harmonic being the
    * variant that stays meaningful on disconnected graphs (Boldi &
    * Vigna 2014).
    *
    * Scale shape: per-round state is (seed × frontier), NEVER
    * (seed × all-pairs) — the frontier joins the edge list keyed on
    * node id and a left-anti against the accumulated (seed, node) set
    * dedupes revisits, so each node enters a seed's state exactly once
    * (frontier-only BFS, same discipline as [[bfsHops]] with the seed
    * riding along as a key). Seed count is the multiplier on state
    * size — a deliberate parameter, not a corpus dimension. */
  def closenessCentrality(s: SparkSession, dir: String,
      seedCustkeys: Seq[Long] = Seq(1L, 2L, 3L, 4L, 5L),
      maxHops: Int = 4): DataFrame = {
    seededBfsDistances(s, dir, seedCustkeys, maxHops)
      .filter(col("dist") > 0)
      .groupBy((col("seed") / 2).cast("long").as("seed_custkey"))
      .agg(count(lit(1)).as("n_reached"),
        sum(col("dist")).as("sum_dist"),
        round4eps(count(lit(1)).cast("double") / sum(col("dist")))
          .as("closeness"),
        round4eps(sum(lit(1.0) / col("dist"))).as("harmonic"))
      .orderBy(col("seed_custkey"))
  }

  /** Newman modularity of the REGION partition over the nation-level
    * trade multigraph: Q = Σ_c (e_c/m − (d_c/2m)²) — do nations trade
    * more within their region than a degree-preserving random graph
    * would (Q>0), or is trade region-blind (Q≈0)? The community
    * assignment is the known region dimension, so the gate needs no
    * clustering replay; edges keep multiplicity (each distinct
    * customer→supplier nation pair per order line), making this the
    * WEIGHTED modularity of trade volume by count. One fact-scan
    * rollup to nation-pair grain; everything after is
    * |nations|²-bounded. */
  def regionModularity(s: SparkSession, dir: String): DataFrame = {
    val pr = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").as("a"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey").as("b"))),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("a") =!= col("b"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("a"), col("n_regionkey").as("ra"))), "a")
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey").as("b"), col("n_regionkey").as("rb"))), "b")
      .groupBy(col("a"), col("b"), col("ra"), col("rb"))
      .agg(count(lit(1)).as("w"))
      .persistMemDisk
    // doubled (undirected) edge list at nation-pair grain — bounded
    val e = pr.select(col("ra"), col("rb"), col("w"))
      .unionByName(pr.select(col("rb").as("ra"), col("ra").as("rb"), col("w")))
    val m2 = e.agg(sum(col("w")).as("m2"))
    val ein = e.filter(col("ra") === col("rb")).agg(sum(col("w")).as("ein2"))
    val deg = e.groupBy(col("ra")).agg(sum(col("w")).as("dc"))
    val degTerm = deg.crossJoin(broadcast(m2))
      .agg(sum(col("dc") * col("dc") /
        (col("m2").cast("double") * col("m2"))).as("dterm"))
    ein.crossJoin(broadcast(m2)).crossJoin(broadcast(degTerm))
      .select(
        round4eps(col("ein2").cast("double") / col("m2") - col("dterm"))
          .as("modularity"),
        (col("m2") / 2).cast("long").as("n_edges"))
  }

  /** Degree assortativity of the undirected trade graph — the Pearson
    * correlation of endpoint degrees over edges (Newman 2002). A
    * bipartite customer↔supplier graph is strongly DISASSORTATIVE
    * (high-degree suppliers connect to many low-degree customers), so
    * this doubles as a structural sanity gate for the edge builder.
    * Shape: the degree vector is one node-keyed aggregate of the edge
    * list; it joins back to the edges twice (both hash joins keyed on
    * node id — at billions of edges AQE picks broadcast only if the
    * degree frame fits); `corr` is a single-pass moment aggregate. */
  def assortativity(s: SparkSession, dir: String): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val edges = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
      .persistMemDisk
    val deg = edges.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
    edges
      .join(deg.select(col("node"), col("d").as("x")), col("a") === col("node"))
      .drop("node")
      .join(deg.select(col("node"), col("d").as("y")), col("b") === col("node"))
      .agg(round4eps(corr(col("x").cast("double"), col("y").cast("double")))
        .as("assortativity"),
        (count(lit(1)) / 2).cast("long").as("n_edges"))
  }

  /** Reciprocity of the directed nation-level trade graph: a directed
    * edge src→dst exists when customers of nation src bought MORE than
    * the mean pair revenue from suppliers of nation dst; reciprocity
    * is the share of edges whose reverse also exists. The pair rollup
    * is bounded by |nations|² at any corpus size, so the mean
    * threshold, the reverse-edge semi join and the final ratio all run
    * on a constant-size frame — only the initial revenue rollup
    * touches the fact table (margin to the mean threshold measured:
    * 799 at sf0.01, far above cross-engine sum drift). */
  def tradeReciprocity(s: SparkSession, dir: String): DataFrame = {
    val pairRev = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").as("src"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey").as("dst"))),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("src") =!= col("dst"))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .persistMemDisk
    val mu = pairRev.agg(avg(col("rev")).as("mu"))
    val ne = pairRev.crossJoin(broadcast(mu))
      .filter(col("rev") > col("mu"))
      .select(col("src"), col("dst"))
      .persistMemDisk
    val rev = ne.select(col("dst").as("src"), col("src").as("dst"),
      lit(1L).as("has_rev"))
    ne.join(broadcast(rev), Seq("src", "dst"), "left")
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("has_rev").isNotNull, 1L).otherwise(0L)).as("n_recip"))
      .select(col("n_edges"), col("n_recip"),
        round4eps(col("n_recip").cast("double") / col("n_edges"))
          .as("reciprocity"))
  }

  /** Strongly connected components of the DIRECTED brand-switching
    * graph — the directed-graph completion of the (undirected) CC /
    * LPA family: nodes are brands, an edge a→b is a customer's
    * consecutive-order switch from dominant brand a to b, and the
    * digraph keeps the top-`topEdges` transitions by count (rank-based,
    * so the cut is defined at every sf). SCC membership = mutual
    * reachability; component id = min brand in the class.
    *
    * The only fact-scale (distributed) work is the transition count;
    * the digraph itself is TAXONOMY-bounded metadata (≤ |brands| = 25
    * nodes, ≤ `topEdges` edges), so the closure runs driver-side over
    * the collected edge list (the bounded-collect discipline — loud
    * require cap) via squaring rounds on reachability bitsets. A
    * distributed closure here would pay 5 rounds × job overhead to
    * join 32-row frames — measured 28 s for work a driver loop does
    * in microseconds; the distributed-iteration patterns live where
    * the graph is fact-scale (pageRank/LPA/k-core hash paths). */
  def brandScc(s: SparkSession, dir: String, topEdges: Int = 32): DataFrame = {
    val ob = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_brand"))
      .agg(sum(col("l_quantity")).as("q"))
      .groupBy(col("l_orderkey"))
      .agg(min(struct((-col("q")).as("nq"), col("p_brand").as("b"))).as("w"))
      .select(col("l_orderkey"), col("w.b").as("brand"))
    val seq0 = ob.join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("o_orderdate").as("d"),
        col("o_orderkey").as("ok"), col("brand"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ck")).orderBy(col("d"), col("ok"))
    val edges = seq0.withColumn("prev", lag(col("brand"), 1).over(wOrd))
      .filter(col("prev").isNotNull && col("prev") =!= col("brand"))
      .groupBy(col("prev").as("a"), col("brand").as("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(topEdges)
      .select(col("a"), col("b"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    require(edges.length <= 10000,
      s"brand digraph has ${edges.length} edges — taxonomy-bounded " +
        "metadata by construction; a larger frame means the rank cut " +
        "upstream broke")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    // reachability closure by bitset squaring (log-diameter rounds)
    val reach = Array.tabulate(n)(i => new java.util.BitSet(n))
    edges.foreach { case (a, b) => reach(idx(a)).set(idx(b)) }
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i < n) {
        val next = new java.util.BitSet(n)
        var j = reach(i).nextSetBit(0)
        while (j >= 0) {
          next.or(reach(j)); j = reach(i).nextSetBit(j + 1)
        }
        next.andNot(reach(i))
        if (!next.isEmpty) { reach(i).or(next); changed = true }
        i += 1
      }
    }
    val sccOf = (0 until n).map { i =>
      val mutual = (0 until n).filter(j =>
        (i == j) || (reach(i).get(j) && reach(j).get(i)))
      nodes(mutual.min)
    }
    val sizes = sccOf.groupBy(identity).map { case (k, v) => k -> v.size }
    import s.implicits._
    nodes.indices.map(i => (nodes(i), sccOf(i), sizes(sccOf(i)).toLong))
      .toDF("brand", "scc_id", "scc_size")
      .orderBy(col("brand"))
  }

  /** Rich-club coefficient φ(k) over the co-supplier projection (the
    * [[triangleCounts]] edge set): among nodes of degree > k, what
    * fraction of possible edges exist? A rising φ(k) means the hubs
    * wire to each other (a supplier elite — the vendor-concentration
    * risk signal); flat φ(k) means hubs spread. One edge list → one
    * degree aggregate → per-k filtered edge/node counts (k is a
    * 4-value documented grid, so the "loop" is a broadcast-joined
    * explode, not iteration). */
  def richClub(s: SparkSession, dir: String,
               ks: Seq[Int] = Seq(2, 3, 4, 5),
               minQty: Double = 48.0): DataFrame = {
    val e = coSupplierEdges(s, dir, minQty)
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persistMemDisk
    val kdf = e.sparkSession.range(0, 1).select(
      explode(typedlit(ks.map(_.toLong))).as("k"))
    val nk = deg.crossJoin(broadcast(kdf))
      .filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_rich"))
    val ek = e
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .crossJoin(broadcast(kdf))
      .filter(col("da") > col("k") && col("db") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("e_rich"))
    nk.join(ek, Seq("k"), "left")
      .select(col("k"), col("n_rich"),
        coalesce(col("e_rich"), lit(0L)).as("e_rich"),
        when(col("n_rich") > 1, round4eps(
          lit(2.0) * coalesce(col("e_rich"), lit(0L)) /
            (col("n_rich").cast("double") * (col("n_rich") - 1))))
          .otherwise(lit(0.0)).as("phi"))
      .orderBy(col("k"))
  }

  /** Per-edge triangle support over the co-supplier graph (same
    * selectivity-guarded projection as [[triangleCounts]]): for every
    * undirected edge (a,b), the number of common neighbors — the edge
    * statistic under k-truss decomposition (an edge is in the
    * 3-truss iff support ≥ 1, in the 4-truss iff ≥ 2). Support is
    * the EDGE-grain density signal node-level clustering coefficients
    * blur: a high-degree node's edges can still be support-0 bridges.
    *
    * Scale shape: edges oriented low→high once, support counted by
    * joining each edge against the adjacency twice (wedge close) and
    * aggregating per edge — the same one-shuffle triangle join as the
    * count gate, keyed by edge instead of corner. */
  def edgeSupport(s: SparkSession, dir: String,
      minQty: Double = 48.0): DataFrame = {
    val e = coSupplierEdges(s, dir, minQty)
    // common neighbors of (a,b) via oriented wedges: for each
    // triangle a<b<c, credit edges (a,b), (a,c), (b,c)
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.b") === col("bc.a"))
      .join(e.as("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .select(col("ab.a").as("ta"), col("ab.b").as("tb"),
        col("bc.b").as("tc"))
    val credited = tri.select(explode(array(
        struct(col("ta").as("a"), col("tb").as("b")),
        struct(col("ta").as("a"), col("tc").as("b")),
        struct(col("tb").as("a"), col("tc").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
    e.join(credited, Seq("a", "b"), "left")
      .na.fill(0L, Seq("support"))
      .select(col("a").as("supp_a"), col("b").as("supp_b"),
        col("support"), (col("support") >= 1).as("in_3truss"),
        (col("support") >= 2).as("in_4truss"))
      .orderBy(col("supp_a"), col("supp_b"))
  }
  /** Katz centrality (Katz 1953) over the co-purchase bipartite graph
    * (customers x suppliers, the [[pageRank]] graph): x ← β + α·Aᵀx,
    * fixed 3 iterations from x₀ = β = 1 with α = 0.05 — the truncated
    * path-counting centrality (Σ_k αᵏ·#paths of length k) that, unlike
    * PageRank, does NOT divide by out-degree: a high-degree neighbor
    * passes its full influence to everyone. The alpha is far below
    * 1/λ_max for this graph, so the truncation is a controlled
    * geometric tail, not an artifact.
    *
    * Same per-round economics as [[pageRank]]: the node vector
    * broadcasts while it fits (edges stream with no shuffle), else the
    * edge list is pre-partitioned once and only the vector shuffles;
    * lineage cut on the same cadence. */
  def katzCentrality(s: SparkSession, dir: String,
      iters: Int = 3, alpha: Double = 0.05): DataFrame = {
    val cs = tradeParityEdges(s, dir)
    val e0 = cs.unionByName(cs.select(col("b").as("a"), col("a").as("b")))
    val x =
      if (smallGraph(e0)) katzKernel(e0, iters, alpha)
      else katzDistributed(s, e0, iters, alpha)
    x.select(col("node"), round4eps(col("x")).as("katz"))
  }

  private[graft] def katzDistributed(s: SparkSession, e0: DataFrame,
      iters: Int, alpha: Double): DataFrame = {
    ensureCheckpointDir(s)
    val edges = e0.persistMemDisk
    val nodes = edges.select(col("a").as("node")).distinct().persistMemDisk
    val nNodes = nodes.count()
    val small = nNodes <= broadcastMaxNodes(s)
    val iterEdges = if (small) edges
      else edges.repartition(col("a")).persistMemDisk
    var x = nodes.select(col("node"), lit(1.0).as("x"))
    var prevRound: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = iterEdges.join(hintSmall(x, small), col("a") === col("node"))
        .groupBy(col("b")).agg(sum(col("x")).as("mass"))
      x = nodes
        .join(hintSmall(contrib, small), col("node") === col("b"), "left")
        .select(col("node"),
          (lit(1.0) + lit(alpha) * coalesce(col("mass"), lit(0.0))).as("x"))
      if (i % 2 == 0 && i < iters) {
        x = cutLineage(s, x)
        if (prevRound != null) prevRound.unpersist(blocking = false)
        prevRound = x
      }
    }
    x
  }

  // ---- small-graph single-task kernels (r15 optimization round) ------
  //
  // The fixed-point family's distributed iterations are the 100 TB
  // path: per round, one edge-keyed join + one keyed aggregate. On a
  // SMALL graph that plan shape pays 18–42 AQE query-stages × the
  // 0.15–0.24 s/stage scheduling+codegen floor (BASELINE.md stage
  // table) to do microseconds of compute — and the floor is not only a
  // local-mode artifact: on a cluster, 40 stages of sub-MB shuffles
  // still cost scheduler round-trips that dwarf the compute. So the
  // same size gate that picks union-find in [[Dedup.componentsOf]] and
  // the single-task peel in [[kCoreOnEdges]] (≤ [[Dedup.SmallGraphEdges]]
  // edges, ~160 MB of (long,long) pairs — one comfortable task) now
  // routes every fixed-point operator through a one-task kernel:
  // O(iters × E) compute in one executor task, zero per-round stages.
  // Above the gate the distributed iterations below are untouched —
  // the ×100 trade graph (≫ the gate) still exercises them, and
  // GraphSpec asserts kernel ≡ distributed on crafted graphs.
  //
  // FP note: kernels accumulate in adjacency order where the
  // distributed aggregates accumulate in partition order — the same
  // class of reordering the distributed path already exhibits run to
  // run; every consumer quantizes through round4eps/q6 (the DuckDB
  // oracle replays the identical values, re-verified this round).

  /** The family gate: one count over the (cached) edge projection. */
  private def smallGraph(edges: DataFrame): Boolean =
    edges.count() <= Dedup.SmallGraphEdges

  private type Adj = scala.collection.mutable.LongMap[
    scala.collection.mutable.ArrayBuffer[Long]]

  private def adjacencyOf(es: Array[(Long, Long)]): Adj = {
    val adj: Adj = scala.collection.mutable.LongMap.empty
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a,
        new scala.collection.mutable.ArrayBuffer[Long]) += b
    }
    adj
  }

  /** PageRank / personalized-PageRank power iteration in one task —
    * identical recurrence to [[pageRankDistributed]]/[[pprDistributed]]
    * (teleport to all nodes vs the id%100==0 seed set). Returns raw
    * (node, rank); the caller applies round4eps. */
  private[graft] def prKernel(edges: DataFrame, iters: Int, damping: Double,
      personalized: Boolean): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val adj = adjacencyOf(it.toArray)
        val nodes = adj.keysIterator.toArray
        val n = nodes.length
        def isSeed(v: Long) = v % 100 == 0
        val nSeeds = if (personalized) nodes.count(isSeed) else 0
        if (personalized) require(nSeeds > 0,
          "personalized PageRank needs a non-empty seed set")
        var rank = scala.collection.mutable.LongMap.empty[Double]
        nodes.foreach { v =>
          rank(v) =
            if (!personalized) 1.0 / n
            else if (isSeed(v)) 1.0 / nSeeds else 0.0
        }
        for (_ <- 1 to iters) {
          val mass = scala.collection.mutable.LongMap.empty[Double]
          adj.foreach { case (a, nbrs) =>
            val c = rank(a) / nbrs.length
            nbrs.foreach(b => mass(b) = mass.getOrElse(b, 0.0) + c)
          }
          val next = scala.collection.mutable.LongMap.empty[Double]
          nodes.foreach { v =>
            val tele =
              if (!personalized) (1 - damping) / n
              else if (isSeed(v)) (1 - damping) / nSeeds else 0.0
            next(v) = tele + damping * mass.getOrElse(v, 0.0)
          }
          rank = next
        }
        nodes.iterator.map(v => (v, rank(v)))
      }.toDF("node", "rank")
  }

  /** Katz x ← 1 + α·Aᵀx in one task; raw (node, x). */
  private[graft] def katzKernel(edges: DataFrame, iters: Int,
      alpha: Double): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val adj = adjacencyOf(es)
        val nodes = adj.keysIterator.toArray
        var x = scala.collection.mutable.LongMap.empty[Double]
        nodes.foreach(v => x(v) = 1.0)
        for (_ <- 1 to iters) {
          val mass = scala.collection.mutable.LongMap.empty[Double]
          es.foreach { case (a, b) =>
            mass(b) = mass.getOrElse(b, 0.0) + x(a)
          }
          val next = scala.collection.mutable.LongMap.empty[Double]
          nodes.foreach(v =>
            next(v) = 1.0 + alpha * mass.getOrElse(v, 0.0))
          x = next
        }
        nodes.iterator.map(v => (v, x(v)))
      }.toDF("node", "x")
  }

  /** HITS over the directed (c, p) bipartite edge list in one task —
    * identical half-round + L1-normalize + 1e-6-quantize schedule as
    * [[hitsDistributed]]; raw (role, key, score). */
  private[graft] def hitsKernel(edges: DataFrame, iters: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    def q6(v: Double): Double =
      math.floor(v * 1000000 + 0.5 + 1e-6) / 1000000
    edges.select(col("c").cast("long"), col("p").cast("long"))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val hub = scala.collection.mutable.LongMap.empty[Double]
        es.foreach { case (c, _) => hub(c) = 1.0 }
        var auth = scala.collection.mutable.LongMap.empty[Double]
        for (_ <- 1 to iters) {
          val rawA = scala.collection.mutable.LongMap.empty[Double]
          es.foreach { case (c, p) =>
            rawA(p) = rawA.getOrElse(p, 0.0) + hub(c)
          }
          var t = 0.0
          rawA.foreachValue(t += _)
          auth = rawA.map { case (p, v) => (p, q6(v / t)) }
          val rawH = scala.collection.mutable.LongMap.empty[Double]
          es.foreach { case (c, p) =>
            rawH(c) = rawH.getOrElse(c, 0.0) + auth(p)
          }
          var t2 = 0.0
          rawH.foreachValue(t2 += _)
          hub.keysIterator.toArray.foreach(c => hub(c) = q6(rawH(c) / t2))
        }
        hub.iterator.map { case (c, v) => ("hub", c, v) } ++
          auth.iterator.map { case (p, v) => ("authority", p, v) }
      }.toDF("role", "key", "score")
  }

  /** Multi-source BFS (seeds = id%100==0) in one task; (node, dist)
    * for every node within maxHops of the seed set — the identical
    * layered-settlement semantics as the distributed frontier loop in
    * [[bfsHops]]. */
  private[graft] def bfsKernel(edges: DataFrame, maxHops: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val adj = adjacencyOf(it.toArray)
        val dist = scala.collection.mutable.LongMap.empty[Int]
        var frontier = adj.keysIterator.filter(_ % 100 == 0).toArray
        frontier.foreach(v => dist(v) = 0)
        var h = 1
        while (h <= maxHops && frontier.nonEmpty) {
          val next = scala.collection.mutable.ArrayBuffer.empty[Long]
          frontier.foreach { v =>
            adj.get(v).foreach(_.foreach { b =>
              if (!dist.contains(b)) { dist(b) = h; next += b }
            })
          }
          frontier = next.toArray
          h += 1
        }
        dist.iterator
      }.toDF("node", "dist")
  }

  /** Per-seed BFS in one task; (seed, node, dist) rows — identical to
    * the distributed multi-source kernel in [[seededBfsDistances]]
    * (each seed appears at dist 0 even when isolated). */
  private[graft] def seededBfsKernel(edges: DataFrame, seeds: Seq[Long],
      maxHops: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val adj = adjacencyOf(it.toArray)
        seeds.iterator.flatMap { seed =>
          val dist = scala.collection.mutable.LongMap.empty[Int]
          dist(seed) = 0
          var frontier = Array(seed)
          var h = 1
          while (h <= maxHops && frontier.nonEmpty) {
            val next = scala.collection.mutable.ArrayBuffer.empty[Long]
            frontier.foreach { v =>
              adj.get(v).foreach(_.foreach { b =>
                if (!dist.contains(b)) { dist(b) = h; next += b }
              })
            }
            frontier = next.toArray
            h += 1
          }
          dist.iterator.map { case (node, d) => (seed, node, d) }
        }
      }.toDF("seed", "node", "dist")
  }

  /** Synchronous LPA in one task — plurality label, ties to the
    * smallest, the identical fixed-round schedule as the distributed
    * loop in [[lpaOnEdges]]; (node_id, community). */
  private[graft] def lpaKernel(undirected: DataFrame, iters: Int): DataFrame = {
    val s = undirected.sparkSession
    import s.implicits._
    undirected.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val adj = adjacencyOf(it.toArray)
        val nodes = adj.keysIterator.toArray
        var labels = scala.collection.mutable.LongMap.empty[Long]
        nodes.foreach(v => labels(v) = v)
        for (_ <- 1 to iters) {
          val next = scala.collection.mutable.LongMap.empty[Long]
          nodes.foreach { v =>
            val counts = scala.collection.mutable.LongMap.empty[Long]
            adj(v).foreach { b =>
              val l = labels(b)
              counts(l) = counts.getOrElse(l, 0L) + 1L
            }
            var bestC = -1L
            var bestL = Long.MaxValue
            counts.foreach { case (l, c) =>
              if (c > bestC || (c == bestC && l < bestL)) {
                bestC = c; bestL = l
              }
            }
            next(v) = bestL
          }
          labels = next
        }
        nodes.iterator.map(v => (v, labels(v)))
      }.toDF("node_id", "community")
  }
}