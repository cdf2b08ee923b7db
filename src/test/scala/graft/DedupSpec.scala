package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Dedup semantics on a crafted corpus.
  *
  * Normalized-exact dedup (md5 of lower/trim/space-collapsed text) and
  * shingle-based near-dup (raw text, mirroring the DuckDB oracle's
  * `string_split(text, ' ')`) are DIFFERENT equivalence relations:
  * doc 2 (case/whitespace variant) collapses with doc 1 under
  * normalization but shares zero raw shingles with it, while doc 5
  * (byte-identical copy) and doc 3 (one-word edit of a 40-word text,
  * 3-shingle Jaccard 37/39 ~ 0.95) are near-dups of doc 1.
  */
class DedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private val nearDup = (1 to 39).map(i => s"w$i").mkString(" ") + " CHANGED"
  private val unrelated = (1 to 40).map(i => s"z$i").mkString(" ")

  private val dir = TestSpark.documentsFixture(Seq(
    (1L, base, "en", "web"),
    (2L, "  " + base.toUpperCase + "  ", "en", "web"), // exact dup after normalize only
    (3L, nearDup, "en", "web"),
    (4L, unrelated, "en", "books"),
    (5L, base, "en", "web")))                          // byte-identical dup of 1

  test("exactGroups merges case/whitespace variants and keeps min doc_id") {
    val groups = Dedup.exactGroups(spark, dir).collect()
    assert(groups.length === 3) // {1,2,5}, {3}, {4}
    val dupGroup = groups.filter(_.getAs[Long]("copies") == 3L)
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("keep_id") === 1L)
  }

  test("exactSurvivors keeps exactly one doc per normalized text") {
    val ids = TestSpark.collectSet[Long](Dedup.exactSurvivors(spark, dir), "doc_id")
    assert(ids === Set(1L, 3L, 4L))
  }

  test("minhashPairs emits rep-level near-dups; byte-identical docs collapse") {
    // r12 contract: doc 5 (byte-identical copy of 1) folds into rep 1
    // BEFORE banding — identical-text duplicates are exact dedup's
    // output, so the detector emits only the distinct-text pair (1,3)
    val rows = Dedup.minhashPairs(spark, dir).collect()
    val pairs = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs === Set((1L, 3L)))
    val j13 = rows.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 3L)
      .get.getAs[Double]("jaccard")
    assert(j13 === math.floor(37.0 / 39.0 * 10000 + 0.5) / 10000)
    // ... and the cluster/survivor layer re-attaches the exact copy,
    // so downstream outputs are what they were before the collapse
    val clusters = Dedup.nearDupClusters(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters === Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("sourceOverlap localizes duplication to the right source-pair cell") {
    // minhash dup pairs in the fixture: (1,5) byte-identical and
    // (1,3), (3,5) near-dups — all inside 'web' (doc 2 is an
    // exact-normalized dup only: its UPPERCASE shingles don't collide,
    // the declared minhash semantics). Doc 4 ('books') never pairs.
    // Expect exactly one (web, web) cell with 3 pairs.
    val cells = Dedup.sourceOverlap(spark, dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("n_dup_pairs")).toMap
    assert(cells === Map(("web", "web") -> 3L))
    // a cross-source duplicate shows up off-diagonal
    val xdir = TestSpark.documentsFixture(Seq(
      (1L, base, "en", "crawl_a"), (2L, base, "en", "crawl_b")))
    val xcells = Dedup.sourceOverlap(spark, xdir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_dup_pairs"), r.getAs[Double]("avg_jaccard")))).toMap
    assert(xcells === Map(("crawl_a", "crawl_b") -> ((1L, 1.0))))
  }

  test("nearDupSurvivors keeps the lowest doc_id of each dup cluster") {
    val ids = TestSpark.collectSet[Long](Dedup.nearDupSurvivors(spark, dir), "doc_id")
    assert(ids === Set(1L, 2L, 4L)) // 3 and 5 fold into 1; 2 is raw-distinct
  }

  test("nearDupClusters labels transitive chains a~b~c with one root") {
    // Chain by construction (60 words, 58 3-shingles each):
    //   a~b: 54 shared shingles, j = 54/62 ≈ 0.871  (pair)
    //   b~c: 52 shared,          j = 52/64 ≈ 0.813  (pair)
    //   a~c: 50 shared,          j = 50/66 ≈ 0.758  (NOT a pair)
    val t = (1 to 60).map(i => s"w$i")
    val a = t.mkString(" ")                                  // w1..w60
    val b = (t.take(56) ++ Seq("B1", "B2", "B3", "B4")).mkString(" ")
    val c = (t.take(52) ++ Seq("B1", "B2", "B3", "B4",
      "C1", "C2", "C3", "C4")).mkString(" ")
    val chainDir = TestSpark.documentsFixture(Seq(
      (10L, a, "en", "web"), (11L, b, "en", "web"), (12L, c, "en", "web"),
      (20L, (1 to 60).map(i => s"q$i").mkString(" "), "en", "web")))
    val pairs = Dedup.minhashPairs(spark, chainDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // precondition for the transitivity claim: a chain, not a triangle
    assert(pairs.contains((10L, 11L)) && pairs.contains((11L, 12L)))
    assert(!pairs.contains((10L, 12L)))
    val clusters = Dedup.nearDupClusters(spark, chainDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(clusters === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
    // the distributed label-propagation path must agree with the
    // union-find fast path nearDupClusters chose for this small graph
    val pairsDf = Dedup.minhashPairs(spark, chainDir)
      .select(org.apache.spark.sql.functions.col("doc_a"),
              org.apache.spark.sql.functions.col("doc_b"))
    val propagated = Dedup.propagateClusters(pairsDf, maxIters = 20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(propagated === clusters)
  }

  test("propagateClusters converges on a deep chain via pointer jumping") {
    // 40-node path graph 0-1-2-...-39: diameter 39. Plain min-label
    // propagation needs ~39 rounds; with the label-of-label hop the
    // loop must finish well inside maxIters=12 (log-diameter rounds).
    import spark.implicits._
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.propagateClusters(chain, maxIters = 12).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(labels.size === 40)
    assert(labels.values.toSet === Set(0L))
    // and union-find on the same graph agrees
    val uf = Dedup.unionFindClusters(chain).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(uf === labels)
  }

  test("simhashPairs collapses byte-identical docs before banding") {
    // r12 contract: no pair may touch the non-representative copy
    val rows = Dedup.simhashPairs(spark, dir).collect()
    assert(rows.forall(r => r.getAs[Long]("doc_a") != 5L &&
      r.getAs[Long]("doc_b") != 5L))
    // exact dedup still owns the identical group
    val g = Dedup.exactGroups(spark, dir).collect()
      .filter(_.getAs[Long]("copies") >= 2L)
    assert(g.exists(_.getAs[Long]("keep_id") == 1L))
  }

  test("simhashPortablePairs applies the same rep collapse as the fast variant") {
    val rows = Dedup.simhashPortablePairs(spark, dir).collect()
    assert(rows.forall(r => r.getAs[Long]("doc_a") != 5L &&
      r.getAs[Long]("doc_b") != 5L))
    assert(rows.forall(r => r.getAs[Int]("hamming") >= 0 &&
      r.getAs[Int]("hamming") <= 3))
  }

  test("simhashAgreementGate: deterministic verdicts, md5 count replay") {
    // The <=24 Hamming bound is calibrated on the real corpus's doc
    // lengths (see scaladoc) — short crafted docs flip many bits per
    // edited word — so the gate is asserted on the testdata corpus,
    // exactly as the registry runs it.
    val g = Dedup.simhashAgreementGate(spark, TestSpark.sfDir).collect()
    assert(g.length === 1)
    assert(g.head.getAs[Boolean]("xx_nonempty"))
    assert(g.head.getAs[Boolean]("xx_all_md5_near"))
    assert(g.head.getAs[Long]("n_md5_pairs") ===
      Dedup.simhashPortablePairs(spark, TestSpark.sfDir).count())
  }

  test("streamingDedupProbe reproduces the batch incremental verdicts") {
    // Real streaming execution (file stream -> stream-static probes ->
    // watermarked fold) must equal the batch path doc for doc.
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("match_id")))).toSet
    val streamed = collect(Dedup.streamingDedupGateVerdicts(spark, TestSpark.sfDir))
    val batch = collect(Dedup.incrementalDedup(spark, TestSpark.sfDir))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the sf0.001 corpus exercises near_dup and new at the 0.8 split
    // (exact dups all fall in the index half there; sf0.01 covers all
    // three via the oracle-gated q_stream_docdedup)
    assert(Set("near_dup", "new").subsetOf(streamed.map(_._2)))
  }

  test("minhashPairs finds every pair of a cluster larger than MaxBucket") {
    // 70 DISTINCT texts with identical shingle SETS (the same 3-word
    // pattern repeated a varying number of times): every doc lands in
    // the same bucket in all 16 bands (size > MaxBucket=64), and the
    // rep collapse cannot fold them (texts differ byte-wise). The
    // oversized-bucket path must still emit all C(70,2) pairs at
    // jaccard 1.0 rather than drop the bucket.
    val n = 70
    val bigDir = TestSpark.documentsFixture(
      (1 to n).map(i => (i.toLong,
        List.fill(i + 2)("a b c").mkString(" "), "en", "web")))
    val pairs = Dedup.minhashPairs(spark, bigDir).collect()
    assert(pairs.length === n * (n - 1) / 2)
    assert(pairs.forall(_.getAs[Double]("jaccard") == 1.0))
  }

  test("docs shorter than 3 words never form near-dup pairs (oracle parity)") {
    val shortDir = TestSpark.documentsFixture(Seq(
      (1L, "hello world", "en", "web"),
      (2L, "hello world", "en", "web"),
      (3L, base, "en", "web")))
    assert(Dedup.minhashPairs(spark, shortDir).count() === 0L)
    assert(Dedup.ngramJaccardWithinSource(spark, shortDir, 0.1).count() === 0L)
  }

  test("ngramJaccard maxDocFreq cap never invents pairs; generous cap is exact") {
    val rows = Dedup.ngramJaccardWithinSource(spark, dir, threshold = 0.5,
        maxDocFreq = Int.MaxValue)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // the registry DEFAULT (DefaultShingleDfCap) changes nothing at
    // gate scale — the exact all-pairs oracle stays the anchor
    val capped = Dedup.ngramJaccardWithinSource(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(capped === rows)
    // tight cap yields a subset (high precision, possible misses)
    val tight = Dedup.ngramJaccardWithinSource(spark, dir, threshold = 0.5,
        maxDocFreq = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(tight.subsetOf(rows))
  }

  test("duplicateSpanStats: shared passages count, unique docs score 0") {
    // docs 1 and 2 share the 10-word prefix (3 positional 8-grams each
    // over 10 words: positions 0..2 — all shared); doc 3 is disjoint
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val sdir = TestSpark.documentsFixture(Seq(
      (1L, shared, "en", "web"),
      (2L, shared + " tail1 tail2", "en", "web"),
      (3L, (1 to 12).map(i => s"u$i").mkString(" "), "en", "web"),
      (4L, "too short", "en", "web")))
    val rows = Dedup.duplicateSpanStats(spark, sdir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(rows(1L) === ((3L, 3L, 1.0)))      // fully covered by shared spans
    assert(rows(2L) === ((5L, 3L, 0.6)))      // 3 of 5 spans shared
    assert(rows(3L) === ((5L, 0L, 0.0)))      // unique content
    assert(!rows.contains(4L))                // < 8 words: no spans
  }

  test("ngramJaccardWithinSource respects source partitioning") {
    // doc 4 is in another source; pairs can only form within 'web'
    val rows = Dedup.ngramJaccardWithinSource(spark, dir, threshold = 0.5).collect()
    assert(rows.forall(_.getAs[String]("source") == "web"))
    assert(rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      === Set((1L, 3L), (1L, 5L), (3L, 5L)))
  }

  test("clusterSurvivors keeps the highest-quality member, min id on ties") {
    // cluster {1,3,5}: docs 1 and 5 are byte-identical (equal quality,
    // tie broken to id 1); doc 3's trailing " CHANGED" adds uppercase
    // penalty, so it can never be the survivor.
    val rows = Dedup.clusterSurvivors(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("cluster") === 1L)
    assert(r.getAs[Long]("n_members") === 3L)
    assert(r.getAs[Long]("survivor_id") === 1L)
    val q1 = graft.operators.TextAnalysis.qualityScores(spark, dir).collect()
      .find(_.getAs[Long]("doc_id") == 1L).get.getAs[Double]("quality")
    assert(r.getAs[Double]("best_quality") === q1)
  }

  test("leakageSafeSplit puts every near-dup cluster member in one split") {
    val rows = graft.operators.TextAnalysis.leakageSafeSplit(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("split_key"), r.getAs[String]("split")))).toMap
    assert(rows.size === 5)
    // cluster {1,3,5} shares one split_key (the min member) → one split
    assert(rows(1L)._1 === 1L && rows(3L)._1 === 1L && rows(5L)._1 === 1L)
    assert(Set(rows(1L)._2, rows(3L)._2, rows(5L)._2).size === 1)
    // unclustered docs key by their own id
    assert(rows(2L)._1 === 2L && rows(4L)._1 === 4L)
  }

  test("incrementalDedup adjudicates the batch against the index only") {
    // ids 0..7 (max 7, splitFrac 0.5 → split 4): index {0..3}, batch {4..7}
    val idir = TestSpark.documentsFixture(Seq(
      (0L, base, "en", "web"),
      (1L, unrelated, "en", "web"),
      (2L, "tiny", "en", "web"),                       // < 3 words: no shingles
      (3L, nearDup, "en", "web"),                      // near-dup of 0 (index-internal: ignored)
      (4L, "  " + base.toUpperCase + "  ", "en", "web"), // exact_dup of 0 after normalize
      (5L, nearDup, "en", "web"),                      // exact_dup of 3 AND near-dup of 0
      (6L, (1 to 40).map(i => s"q$i").mkString(" "), "en", "web"), // genuinely new
      (7L, (2 to 40).map(i => s"w$i").mkString(" "), "en", "web"))) // near-dup of 0 only
    val got = Dedup.incrementalDedup(spark, idir, splitFrac = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("verdict"), Option(r.getAs[Any]("match_id"))))).toMap
    assert(got(4L) === (("exact_dup", Some(0L))))
    assert(got(5L) === (("exact_dup", Some(3L))))
    assert(got(6L) === (("new", None)))
    assert(got(7L) === (("near_dup", Some(0L))))
    assert(got.size === 4) // index docs are never adjudicated
  }

  test("contamination flags exactly the train docs sharing a benchmark shingle") {
    val cdir = TestSpark.documentsFixture(Seq(
      (1L, "alpha beta gamma delta", "en", "bench"),  // shingles: abg, bgd
      (2L, "alpha beta gamma other words here", "en", "train"), // shares "alpha beta gamma"
      (3L, "completely different text entirely", "en", "train"), // clean
      (4L, "x alpha beta gamma delta y", "en", "train"))) // shares both bench shingles
    val rows = Dedup.contamination(spark, cdir, benchmarkSource = "bench").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bench_docs"), r.getAs[Long]("n_shared_shingles"),
          r.getAs[Double]("contaminated_frac")))).toMap
    assert(rows.keySet === Set(2L, 4L)) // doc 3 is clean: absent, not zero-rowed
    assert(rows(2L) === ((1L, 1L, 0.25))) // 1 of its 4 shingles contaminated
    assert(rows(4L) === ((1L, 2L, 0.5)))  // 2 of its 4 shingles contaminated
  }

  test("dupSizeHistogram conserves the corpus and counts singletons") {
    val sf = TestSpark.sfDir
    val hist = operators.Dedup.dupSizeHistogram(spark, sf).collect()
    assert(hist.nonEmpty)
    val totalDocs = hist.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === Tables.documents(spark, sf).count())
    hist.foreach { r =>
      assert(r.getAs[Long]("n_docs") ===
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }

  // ---- rep-collapse equivalence (r12 verdict Next #3, permanent) ----
  //
  // The r12 doctrine collapses byte-identical texts to min-doc_id
  // representatives BEFORE banding; clusters / survivors / histogram /
  // sourceOverlap must re-attach members so their outputs equal a
  // pre-collapse full-corpus computation. This fixture is dup-BEARING
  // by construction (the sf0.01 verify corpus has no exact dups, so
  // the oracles alone are no-ops on the re-attachment logic):
  //
  //   group A = {1 web, 2 books, 3 web}  — byte-identical 40-word text
  //   doc 4 (news)                       — near-dup of A (1-word edit,
  //                                        3-shingle j = 37/39 ≈ .9487)
  //   group B = {5 web, 6 books}         — byte-identical "hi there"
  //                                        (<3 words: SHINGLE-LESS — the
  //                                        pre-collapse detector never
  //                                        paired it; no edges may be
  //                                        synthesized)
  //   group C = {7 news, 8 web}          — byte-identical 40-word text
  //   doc 9 (books)                      — near-dup of C (same edit shape)
  //   doc 10 (web)                       — unrelated singleton
  //
  // Expected member-level (pre-collapse) pair multiset, derived by
  // hand: A-internal (1,2)(1,3)(2,3) @ j=1; A×4 (1,4)(2,4)(3,4)
  // @ .9487; C-internal (7,8) @ 1; C×9 (7,9)(8,9) @ .9487. Nothing
  // touches B or 10.
  private object RepCollapse {
    val tA = (1 to 40).map(i => s"a$i").mkString(" ")
    val tA2 = (1 to 39).map(i => s"a$i").mkString(" ") + " EDIT"
    val tC = (1 to 40).map(i => s"c$i").mkString(" ")
    val tC2 = (1 to 39).map(i => s"c$i").mkString(" ") + " EDIT"
    val dir = TestSpark.documentsFixture(Seq(
      (1L, tA, "en", "web"), (2L, tA, "en", "books"), (3L, tA, "en", "web"),
      (4L, tA2, "en", "news"),
      (5L, "hi there", "en", "web"), (6L, "hi there", "en", "books"),
      (7L, tC, "en", "news"), (8L, tC, "en", "web"),
      (9L, tC2, "en", "books"),
      (10L, (1 to 40).map(i => s"z$i").mkString(" "), "en", "web")))
  }

  test("rep-collapse: minhashPairs emits rep-level pairs only") {
    val pairs = Dedup.minhashPairs(spark, RepCollapse.dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // reps are 1 (group A), 7 (group C); members 2,3,8 never appear
    assert(pairs === Set((1L, 4L), (7L, 9L)))
  }

  test("rep-collapse: nearDupClusters equals the full-corpus clustering") {
    val cl = Dedup.nearDupClusters(spark, RepCollapse.dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    // pre-collapse reference: CC over the hand-derived member pairs
    assert(cl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
    // the shingle-less guard: group B must NOT be clustered (the old
    // detector never paired "hi there" copies — synthesized edges
    // would surface 5/6 here and fail this equality)
    assert(!cl.contains(5L) && !cl.contains(6L))
  }

  test("rep-collapse: nearDupSurvivors equals the full-corpus single-hop") {
    val ids = TestSpark.collectSet[Long](
      Dedup.nearDupSurvivors(spark, RepCollapse.dir), "doc_id")
    // greater sides of the member pair multiset: 2,3,4,8,9 — BOTH
    // shingle-less copies survive (guard), plus the singletons
    assert(ids === Set(1L, 5L, 6L, 7L, 10L))
  }

  test("rep-collapse: dupSizeHistogram equals the full-corpus histogram") {
    val hist = Dedup.dupSizeHistogram(spark, RepCollapse.dir).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs")))).toMap
    // clusters {1,2,3,4} and {7,8,9}; singletons 5, 6, 10
    assert(hist === Map(1L -> ((3L, 3L)), 3L -> ((1L, 3L)), 4L -> ((1L, 4L))))
  }

  test("rep-collapse: sourceOverlap reproduces member-level pair counts") {
    val j = math.floor(37.0 / 39.0 * 10000 + 0.5 + 0.000001) / 10000 // .9487
    val got = Dedup.sourceOverlap(spark, RepCollapse.dir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_dup_pairs"), r.getAs[Double]("avg_jaccard")))).toMap
    def q4(v: Double) = math.floor(v * 10000 + 0.5 + 0.000001) / 10000
    // combinatorial weights must reproduce the hand-derived multiset:
    // (books,news): (2,4)@j + (7,9)@j                     → 2 pairs
    // (books,web):  (1,2)@1 + (2,3)@1 + (8,9)@j           → 3 pairs
    // (news,web):   (1,4)@j + (3,4)@j + (7,8)@1           → 3 pairs
    // (web,web):    (1,3)@1                               → 1 pair
    assert(got === Map(
      ("books", "news") -> ((2L, q4(j))),
      ("books", "web") -> ((3L, q4((2.0 + j) / 3.0))),
      ("news", "web") -> ((3L, q4((1.0 + 2.0 * j) / 3.0))),
      ("web", "web") -> ((1L, 1.0))))
  }

  test("captureRecapture: Chapman estimate at least the union lower bound") {
    val r = graft.operators.Dedup.captureRecapture(TestSpark.spark, TestSpark.sfDir)
      .collect().head
    val n1 = r.getAs[Long]("n_jaccard")
    val n2 = r.getAs[Long]("n_simhash")
    val m = r.getAs[Long]("n_both")
    assert(m <= math.min(n1, n2))
    val est = r.getAs[Double]("chapman_est")
    assert(est >= math.max(n1, n2).toDouble - 1.0)
    val c1 = r.getAs[Double]("jaccard_coverage")
    assert(c1 >= 0.0 && c1 <= 1.0 + 1e-9)
  }
}
