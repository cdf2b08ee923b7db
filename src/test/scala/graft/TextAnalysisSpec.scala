package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.operators.TextAnalysis
import graft.functions.TextFunctions

/** Text-analysis semantics on crafted documents with hand-computable
  * token/ratio arithmetic. */
class TextAnalysisSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // "the cat sat." → 3 tokens, 12 chars, 1 punct char
  private val dir = TestSpark.documentsFixture(Seq(
    (1L, "the cat sat.", "en", "web"),
    (2L, "a a the the a the", "en", "web"),          // all stopwords
    (3L, "SHOUTING TEXT HERE", "en", "web"),         // high upper ratio
    (4L, "der hund ist nicht zu der das und ist", "de", "web"),
    (5L, "internationalization considerations", "en", "books"))) // long words

  test("tokenStats: exact whitespace and BPE-ish token counts") {
    val t = TextAnalysis.tokenStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(t(1L).getAs[Int]("n_tokens") === 3)
    assert(t(1L).getAs[Int]("n_chars_measured") === 12)
    // avg_word_len = (12 - 2) / 3
    assert(t(1L).getAs[Double]("avg_word_len") === math.floor(10.0 / 3.0 * 10000 + 0.5) / 10000)
    // "internationalization"(20) → 1 + floor(19/6)=3 extra; "considerations"(14) → 1+2
    assert(t(5L).getAs[Int]("n_tokens") === 2)
    assert(t(5L).getAs[Int]("n_tokens_bpe") === 2 + 3 + 2)
  }

  test("qualityScores: ratios and composite are exact arithmetic") {
    val q = TextAnalysis.qualityScores(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(q(2L).getAs[Double]("stopword_ratio") === 1.0)
    assert(q(1L).getAs[Double]("punct_ratio") === math.floor(1.0 / 12.0 * 10000 + 0.5) / 10000)
    assert(q(3L).getAs[Double]("upper_ratio") === math.floor(16.0 / 18.0 * 10000 + 0.5) / 10000)
    // doc 3: no stopwords, shouting → heavy penalty → quality clamps at 0
    assert(q(3L).getAs[Double]("quality") === 0.0)
  }

  test("langId predicts by stopword-profile argmax") {
    val p = TextAnalysis.langPredictions(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(p(1L) === "en")
    assert(p(4L) === "de")
    assert(p(5L) === "und") // no stopword hits anywhere
  }

  test("fingerprints: md5 matches normalized text, stable across variants") {
    val f = TextAnalysis.fingerprints(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fingerprint_md5")).toMap
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("the cat sat.".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(f(1L) === expected)
  }

  test("topTokens: corpus-wide frequency with deterministic ordering") {
    val top = TextAnalysis.topTokens(spark, dir).collect()
    assert(top.head.getAs[String]("token") === "the") // 3 in doc 2 + 1 in doc 1
    assert(top.head.getAs[Long]("freq") === 4L)
    // ordering is (freq desc, token asc) — verify monotone
    val freqs = top.map(_.getAs[Long]("freq")).toSeq
    assert(freqs === freqs.sorted.reverse)
  }

  test("corpusProfile groups by (lang, source) with exact sums") {
    val rows = TextAnalysis.corpusProfile(spark, dir).collect()
    val enWeb = rows.find(r => r.getAs[String]("lang") == "en"
      && r.getAs[String]("source") == "web").get
    assert(enWeb.getAs[Long]("n_docs") === 3L)
    assert(enWeb.getAs[Long]("total_chars") === (12L + 17L + 18L))
  }

  test("wordShingles yields an empty set for texts shorter than k (oracle parity)") {
    import spark.implicits._
    val df = Seq("one two").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 3).as("sh"))
    assert(df.collect().head.getSeq[String](0) === Seq.empty)
  }

  test("wordEntropy: uniform text hits ln(n_distinct), constant text hits 0") {
    val edir = TestSpark.documentsFixture(Seq(
      (1L, "a b c d", "en", "web"),       // 4 distinct words -> H = ln 4
      (2L, "a a a a", "en", "web"),       // constant -> H = 0
      (3L, "a a b b", "en", "web")))      // H = ln 2
    val rows = TextAnalysis.wordEntropy(spark, edir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5 + 0.000001) / 10000
    assert(rows(1L) === r4(math.log(4)))
    assert(rows(2L) === r4(0.0))
    assert(rows(3L) === r4(math.log(2)))
  }

  test("repetitionStats: fractions match hand-computed values") {
    val rdir = TestSpark.documentsFixture(Seq(
      (1L, "x y x y x y", "en", "web"),   // 6 words {x:3,y:3}; 5 bigrams {xy:3, yx:2}
      (2L, "a b c", "en", "web")))        // all distinct
    val rows = TextAnalysis.repetitionStats(spark, rdir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val d1 = rows(1L)
    assert(d1.getAs[Double]("dup_word_frac") === r4(1.0 - 2.0 / 6.0))
    assert(d1.getAs[Double]("top_word_frac") === r4(3.0 / 6.0))
    assert(d1.getAs[Double]("dup_bigram_frac") === r4(1.0 - 2.0 / 5.0))
    val d2 = rows(2L)
    assert(d2.getAs[Double]("dup_word_frac") === 0.0)
    assert(d2.getAs[Double]("dup_bigram_frac") === 0.0)
  }

  test("winnowFingerprints: identical docs share all fingerprints; " +
       "a shared run of >= 6 words shares at least one") {
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val overlap = ((1 to 8).map(i => s"w$i") ++ (1 to 12).map(i => s"v$i")).mkString(" ")
    val wdir = TestSpark.documentsFixture(Seq(
      (1L, base, "en", "web"),
      (2L, base, "en", "web"),            // identical
      (3L, overlap, "en", "web"),         // shares w1..w8 (6 shingles) with 1
      (4L, "one two three", "en", "web"))) // < 6 words -> excluded
    val fp = TextAnalysis.winnowFingerprints(spark, wdir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fingerprint")).toSet).toMap
    assert(fp(1L) === fp(2L))
    assert((fp(1L) intersect fp(3L)).nonEmpty)
    assert(!fp.contains(4L))
  }

  test("WordShingleGenerate emits positional (not distinct) shingles; short docs none") {
    val gdir = TestSpark.documentsFixture(Seq(
      (1L, "a b a b a", "en", "web"),   // repeated shingles must stay
      (2L, "one two", "en", "web")))    // < 3 words -> no rows
    val rows = TextAnalysis.shingleIndex(spark, gdir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getAs[String]("shingle")))
    assert(rows.toSeq.sorted === Seq(
      (1L, 0, "a b a"), (1L, 1, "b a b"), (1L, 2, "a b a")).sorted)
    assert(!rows.exists(_._1 == 2L))
  }

  test("WordShingleHashes kernel equals the composed shingle+xxhash64 chain") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{sort_array, transform, xxhash64}
    // covers: repeated shingles (distinct), multi-byte UTF-8, short
    // text (< k words -> empty), empty-string words from double spaces
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b a b a b",               // heavy shingle repetition
      "héllo wörld ünïcode tæxt 中文 分词 测试",
      "one two",                                // < 3 words
      "x  y z w")                               // double space -> empty word
    val df = texts.toDF("text")
    val composed = df.select(sort_array(transform(
        TextFunctions.wordShingles(col("text"), 3), sh => xxhash64(sh))).as("hs"))
      .collect().map(_.getSeq[Long](0))
    val fused = df.select(org.apache.spark.sql.GraftSql.column(
        graft.functions.WordShingleHashes(org.apache.spark.sql.GraftSql.expression(
          TextFunctions.words(col("text"))), 3)).as("hs"))
      .collect().map(_.getSeq[Long](0))
    assert(fused.toSeq === composed.toSeq)
  }

  test("trainValTestSplit: exhaustive, deterministic, hash-stable") {
    val r1 = TextAnalysis.trainValTestSplit(spark, dir).collect()
    assert(r1.map(_.getAs[Long]("n_docs")).sum === 5)
    assert(r1.map(_.getAs[String]("split")).toSet.subsetOf(Set("train", "val", "test")))
    val r2 = TextAnalysis.trainValTestSplit(spark, dir).collect()
    assert(r1.map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq ===
      r2.map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq)
  }

  test("bm25Scores: single-term query matches the hand formula") {
    // 'cat' appears once, in doc 1 only. N=5 docs, dl=3, avgdl=23/5.
    val scores = TextAnalysis.bm25Scores(spark, dir, query = Seq("cat")).collect()
    assert(scores.length === 1 && scores.head.getAs[Long]("doc_id") === 1L)
    val (n, df, tf, dl) = (5.0, 1.0, 1.0, 3.0)
    val avgdl = (3 + 6 + 3 + 9 + 2) / 5.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    val raw = idf * (tf * (TextAnalysis.Bm25K1 + 1)) /
      (tf + TextAnalysis.Bm25K1 * (1 - TextAnalysis.Bm25B + TextAnalysis.Bm25B * dl / avgdl))
    val expected = math.floor(raw * 10000 + 0.5 + 0.000001) / 10000
    assert(scores.head.getAs[Double]("bm25") === expected)
  }

  test("pmiBigrams: frequency and PMI match first-principles counts") {
    // corpus: Nu=23 unigrams, Nb=18 bigrams; "a the" occurs twice
    // (doc 2: a,a,the,the,a,the), c(a)=3, c(the)=1+3=4
    val rows = TextAnalysis.pmiBigrams(spark, dir, minFreq = 1).collect()
      .map(r => r.getAs[String]("bigram") ->
        ((r.getAs[Long]("freq"), r.getAs[Double]("pmi")))).toMap
    val (freq, pmi) = rows("a the")
    assert(freq === 2L)
    val raw = math.log((2.0 / 18) / ((3.0 / 23) * (4.0 / 23)))
    assert(pmi === math.floor(raw * 10000 + 0.5 + 0.000001) / 10000)
  }

  test("piiMask: digit runs and entity tokens redacted, count exact") {
    val pdir = TestSpark.documentsFixture(Seq(
      (1L, "call 555 1234 customer now", "en", "web"),
      (2L, "customers keep their suffix", "en", "web"))) // \b guards the partial match
    val rows = TextAnalysis.piiMask(spark, pdir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_redactions")).toMap
    assert(rows(1L) === 3)
    assert(rows(2L) === 0)
    // fingerprint = md5 of the literally masked text
    val masked = "call [PII] [PII] [PII] now"
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(masked.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = TextAnalysis.piiMask(spark, pdir).collect()
      .find(_.getAs[Long]("doc_id") == 1L).get.getAs[String]("masked_md5")
    assert(got === expected)
  }

  test("mixtureWeights: alpha=0.5 temperature scaling, weights sum to 1") {
    // 4 en + 1 de: shares (0.8, 0.2); sqrt-scaled weights are exactly
    // (2/3, 1/3) because sqrt(0.2)/sqrt(0.8) = 1/2.
    val mdir = TestSpark.documentsFixture(Seq(
      (1L, "a", "en", "s"), (2L, "b", "en", "s"), (3L, "c", "en", "s"),
      (4L, "d", "en", "s"), (5L, "e", "de", "s")))
    val rows = TextAnalysis.mixtureWeights(spark, mdir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mix_weight"),
          r.getAs[Long]("target_docs"))).toMap
    assert(rows("en") === ((4L, 0.6667, 3L)))
    assert(rows("de") === ((1L, 0.3333, 2L)))
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 0.001)
  }

  test("mixSchedule: stride interleave releases sources in weight proportion") {
    // sources a (2 docs) and b (6 docs): shares (0.25, 0.75), sqrt
    // temperature -> quantized weights 0.3660 / 0.6340. Stride release
    // times (r-0.5)/w merge into the exact sequence b a b b a b b b.
    val mdir = TestSpark.documentsFixture(Seq(
      (1L, "t", "en", "a"), (2L, "t", "en", "a"),
      (3L, "t", "en", "b"), (4L, "t", "en", "b"), (5L, "t", "en", "b"),
      (6L, "t", "en", "b"), (7L, "t", "en", "b"), (8L, "t", "en", "b")))
    val rows = TextAnalysis.mixSchedule(spark, mdir).collect()
      .sortBy(_.getAs[Int]("global_pos"))
    assert(rows.map(_.getAs[Int]("global_pos")).toSeq === (1 to 8))
    assert(rows.map(_.getAs[String]("source")).toSeq ===
      Seq("b", "a", "b", "b", "a", "b", "b", "b"))
    // release times are the ascending sort key
    val pos = rows.map(_.getAs[Double]("stride_pos"))
    assert(pos.sliding(2).forall(p => p(0) <= p(1)))
    // ranks within a source appear in order (1, 2, ...)
    val bRanks = rows.filter(_.getAs[String]("source") == "b")
      .map(_.getAs[Int]("rank_in_source")).toSeq
    assert(bRanks === (1 to 6))
  }

  test("dsirWeights: target-like documents score higher, hand-checked LLR") {
    // en doc is all 'x' (target-favored), de doc all 'y'. Add-1 LMs:
    // p_t(x)=4/5, p_all(x)=4/8 -> llr ln(1.6); p_t(y)=1/5,
    // p_all(y)=4/8 -> llr ln(0.4).
    val ddir = TestSpark.documentsFixture(Seq(
      (1L, "x x x", "en", "s"), (2L, "y y y", "de", "s")))
    val rows = TextAnalysis.dsirWeights(spark, ddir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("dsir_logweight")))).toMap
    assert(rows(1L) === ((3L, 0.47)))     // ln(1.6) rounded to the grid
    assert(rows(2L) === ((3L, -0.9163)))  // ln(0.4)
  }

  test("pplFilter: per-source quantile cut keeps all but the worst-perplexity tail") {
    // source s1: nine docs of corpus-common tokens (low nll) plus one
    // doc of corpus-rare tokens (highest nll). The p90 threshold
    // interpolates between the 9th and 10th sorted nll, so exactly the
    // rare-token doc is cut. Source s2 exists to prove the cut is
    // PER-source (its single doc is kept at its own threshold).
    val common = (1L to 9L).map(i => (i, "the the the the", "en", "s1"))
    val pdir = TestSpark.documentsFixture(common ++ Seq(
      (10L, "qqq www eee rrr", "en", "s1"),
      (20L, "zzz xxx ccc vvv", "en", "s2")))
    val rows = TextAnalysis.pplFilter(spark, pdir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept")))).toMap
    assert(rows("s1") === ((10L, 9L)))
    assert(rows("s2") === ((1L, 1L)))
  }

  test("writeTrainingShards: partitioned layout agrees with the manifest") {
    val out = TestSpark.tempDir("graft-shards")
    TextAnalysis.writeTrainingShards(spark, TestSpark.sfDir, out)
    val written = spark.read.parquet(out)
    val manifest = TextAnalysis.trainingShards(spark, TestSpark.sfDir).collect()
      .map(r => r.getAs[Int]("shard") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    // shard= partition dirs exist and carry exactly the manifest counts
    val perShard = written.groupBy(col("shard"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("n_tokens")).as("tok"))
      .collect().map(r => r.getAs[Int]("shard") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("tok")))).toMap
    assert(perShard === manifest)
    assert(new java.io.File(out).listFiles().exists(_.getName.startsWith("shard=")))
    // within a shard file, rows are stored in shuffle-hash order
    val shard0 = spark.read.parquet(s"$out/shard=0").collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("doc_id")))
    assert(shard0.sliding(2).forall(p => p.length < 2 ||
      (p(0)._1 < p(1)._1 || (p(0)._1 == p(1)._1 && p(0)._2 < p(1)._2))))
  }

  test("bpeMerges: hand-checked merge rounds, adjacent occurrences fuse fully") {
    // vocabulary: "abab" (x2 docs of one word... built as two docs),
    // "cd" (x1). Round 1 pairs: (a,b) 2*2=4, (b,a) 2, (c,d) 1 -> merge
    // (a,b). Applying to |a|b|a|b| must fuse BOTH occurrences (the
    // adjacent-match case the second replace pass exists for), giving
    // |ab|ab|. Round 2 top pair is then (ab, ab) freq 2.
    val bdir = TestSpark.documentsFixture(Seq(
      (1L, "abab", "en", "s"), (2L, "abab", "en", "s"), (3L, "cd", "en", "s")))
    val rows = TextAnalysis.bpeMerges(spark, bdir).collect()
      .map(r => (r.getAs[Int]("bpe_round"), r.getAs[Int]("rank")) ->
        ((r.getAs[String]("sym_left"), r.getAs[String]("sym_right"),
          r.getAs[Long]("freq")))).toMap
    assert(rows((1, 1)) === (("a", "b", 4L)))
    assert(rows((1, 2)) === (("b", "a", 2L)))
    assert(rows((1, 3)) === (("c", "d", 1L)))
    assert(rows((2, 1)) === (("ab", "ab", 2L)))
    assert(rows((2, 2)) === (("c", "d", 1L)))
    assert(rows.keys.count(_._1 == 2) === 2) // (b,a) is gone after the merge
  }

  test("budgetSample: per-source quality-ranked greedy fill to the token budget") {
    // web qualities: doc2 .5213 > doc1 .3483 > doc4 .0463 > doc3 0.0;
    // token counts doc2=6, doc1=3, doc4=9, doc3=3. books: doc5 (2 tokens).
    val all = TextAnalysis.budgetSample(spark, dir, budgetTokens = 100).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Long]("cum_tokens")))).toMap
    assert(all(2L) === (("web", 6L)))   // best quality fills first
    assert(all(1L) === (("web", 9L)))
    assert(all(4L) === (("web", 18L)))
    assert(all(3L) === (("web", 21L)))
    assert(all(5L) === (("books", 2L)))
    // budget 7: doc2 starts at 0, doc1 at 6 (<7, kept — the crossing
    // doc), doc4 at 15 (cut); books keeps its only doc
    val cut = TextAnalysis.budgetSample(spark, dir, budgetTokens = 7).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(cut === Set(2L, 1L, 5L))
    // budget 1 degenerates to argmax-quality per source
    val top = TextAnalysis.budgetSample(spark, dir, budgetTokens = 1).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(top === Set(("web", 2L), ("books", 5L)))
  }

  test("sequencePack: distributed prefix sum equals the sequential layout") {
    // token counts in doc_id order: 3, 6, 3, 9, 2 — window 8 tokens.
    // starts: 0, 3, 9, 12, 21 → packs 0,0,1,1,2; offsets 0,3,1,4,5.
    val got = TextAnalysis.sequencePack(spark, dir, windowTokens = 8, buckets = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("pack_id"), r.getAs[Long]("pack_off"),
          r.getAs[Boolean]("spans_boundary")))).toMap
    assert(got(1L) === ((0L, 0L, false)))
    assert(got(2L) === ((0L, 3L, true)))   // 6 tokens from offset 3 cross pack 0→1
    assert(got(3L) === ((1L, 1L, false)))
    assert(got(4L) === ((1L, 4L, true)))   // 9 tokens from offset 4 cross pack 1→2
    assert(got(5L) === ((2L, 5L, false)))
  }

  test("noveltyScores: first-occurrence fractions on a crafted overlap chain") {
    // doc 1 introduces both its shingles; doc 2 is a verbatim dup
    // (novelty 0); doc 3 shares exactly its first shingle with doc 1
    // (novelty 2/3); doc 4 is too short to shingle and must be absent.
    val ndir = TestSpark.documentsFixture(Seq(
      (1L, "x y z w", "en", "web"),
      (2L, "x y z w", "en", "web"),
      (3L, "x y z q r", "en", "web"),
      (4L, "too short", "en", "web")))
    val got = TextAnalysis.noveltyScores(spark, ndir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((3L, 2L, math.floor(2.0 / 3.0 * 10000 + 0.5 + 1e-6) / 10000)))
  }

  test("weightedSample: ES top-k matches an in-memory replay, plan is a TakeOrdered") {
    val got = TextAnalysis.weightedSample(spark, TestSpark.sfDir, k = 20)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id")))
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def esKey(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      math.log((h + 1).toDouble / math.pow(2, 60)) / w
    }
    val want = docs.filter(_._2 > 0)
      .map { case (id, w) => (id, esKey(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => (i + 1, id) }
    assert(got.toSeq === want.toSeq)
    // no corpus-wide sort: the global top-k must plan as TakeOrdered
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.weightedSample(spark, TestSpark.sfDir, k = 20)
        .queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"), plan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("chunkSplit: offsets, lengths and hashes match brute-force slicing") {
    val text = "der hund ist nicht zu der das und ist" // 37 chars, doc 4
    val got = TextAnalysis.chunkSplit(spark, dir, chunk = 10, stride = 8)
      .filter(col("doc_id") === 4L).collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("chunk_off"),
        r.getAs[Int]("n_chunk_chars"), r.getAs[String]("chunk_md5")))
      .sortBy(_._1)
    val want = Iterator.from(0).map(_ * 8).takeWhile(_ < text.length).zipWithIndex
      .map { case (off, idx) =>
        val slice = text.substring(off, math.min(off + 10, text.length))
        (idx, off, slice.length,
          java.security.MessageDigest.getInstance("MD5")
            .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }.toSeq
    assert(got.toSeq === want)
    // final short chunk: 37 chars, last offset 32 → 5-char tail
    assert(got.last._3 === 5)
  }

  test("rakeKeyphrases: stopword-free phrases, positive co-occurrence scores") {
    val stop = Set("a", "the", "of", "and", "is", "to", "in")
    val rows = graft.operators.TextAnalysis.rakeKeyphrases(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val phrase = r.getAs[String]("phrase")
      assert(phrase.split(" ").forall(w => !stop(w)),
        s"stopword leaked into phrase: $phrase")
      assert(r.getAs[Long]("n_words") === phrase.split(" ").length.toLong)
      assert(r.getAs[Double]("rake_score") > 0.0)
      assert(r.getAs[Long]("n_occur") >= 1L)
    }
    // scores arrive ranked
    val scores = rows.map(_.getAs[Double]("rake_score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("naiveBayesLang: confusion rows partition the corpus") {
    val rows = graft.operators.TextAnalysis
      .naiveBayesLang(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, dir).count())
    // in-sample NB on a frequency-skewed shared vocab must beat the
    // majority-class baseline on the diagonal
    val correct = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getAs[Long]("n_docs")).sum
    val biggestClass = Tables.documents(spark, dir)
      .groupBy("lang").count().collect().map(_.getLong(1)).max
    assert(correct >= biggestClass,
      s"NB diagonal $correct under majority baseline $biggestClass")
  }

  test("topPVocab: nucleus covers at least half the mass, minimally") {
    val rows = graft.operators.TextAnalysis.topPVocab(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the crossing token is included, so coverage >= 0.5 ...
      assert(r.getAs[Double]("coverage") >= 0.5 - 1e-9)
      assert(r.getAs[Long]("n_nucleus") >= 1L)
      assert(r.getAs[Long]("n_nucleus") <= r.getAs[Long]("vocab_size"))
    }
  }

  test("sourceLangMix: entropy bounded by ln(n_langs), docs conserve") {
    val rows = graft.operators.TextAnalysis.sourceLangMix(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, dir).count())
    rows.foreach { r =>
      val h = r.getAs[Double]("lang_entropy")
      assert(h >= 0.0 - 1e-9)
      assert(h <= math.log(r.getAs[Long]("n_langs").toDouble) + 1e-6)
    }
  }

  test("heapsLaw: sublinear growth exponent on the shingle vocabulary") {
    val r = graft.operators.TextAnalysis.heapsLaw(spark, dir).head()
    val beta = r.getAs[Double]("heaps_beta")
    // vocabulary growth is at most stream-linear (β = 1 exactly when
    // the tiny sf0.001 corpus never repeats a shingle; < 1 at sf0.01+)
    assert(beta > 0.0 && beta <= 1.0 + 1e-9, s"beta=$beta")
    assert(r.getAs[Long]("n_points") >= 2L)
  }

  test("jsDivergence: bounded by ln 2, symmetric in construction") {
    val rows = graft.operators.TextAnalysis.jsDivergence(spark, dir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val js = r.getAs[Double]("js")
      assert(js >= 0.0 && js <= math.log(2.0) + 1e-9)
      assert(r.getAs[Long]("n_terms") > 0)
    }
  }

  test("readability counts words, sentences and vowel-group syllables") {
    // over the REAL corpus: Flesch must reconcile with its own parts
    val rows = TextAnalysis.readability(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val wps = r.getAs[Double]("words_per_sentence")
      val spw = r.getAs[Double]("syllables_per_word")
      val flesch = r.getAs[Double]("flesch")
      assert(wps > 0 && spw > 0)
      assert(math.abs(flesch - (206.835 - 1.015 * wps - 84.6 * spw))
        < 1e-2, s"${r.getString(0)}")
    }
  }

  test("readability on a hand-computable fixture") {
    val d = TestSpark.documentsFixture(Seq(
      (1L, "the cat sat. it ran!", "xx", "web")))
    // words: the,cat,sat.,it,ran! = 5; sentences: '.', '!' = 2
    // vowel groups: e,a,a,i,a = 5
    val r = TextAnalysis.readability(spark, d)
      .filter(col("lang") === "xx").head()
    assert(r.getAs[Double]("words_per_sentence") == 2.5)
    assert(r.getAs[Double]("syllables_per_word") == 1.0)
  }

  test("zipfSlope is negative with a full top-k vocabulary") {
    val r = TextAnalysis.zipfSlope(spark, TestSpark.sfDir).head()
    assert(r.getAs[Long]("n_tokens") > 10)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("textRank: probability mass conserved across iterations; " +
    "output ranked and vocabulary-bounded") {
    val all = TextAnalysis.textRank(spark, TestSpark.sfDir,
      topN = 1000000).collect()
    // teleport + row-stochastic transitions conserve total mass at 1
    // (up to the per-round q6 quantization)
    val mass = all.map(_.getAs[Double]("score")).sum
    assert(math.abs(mass - 1.0) < 0.01)
    assert(all.forall(_.getAs[Double]("score") > 0.0))
    val top = TextAnalysis.textRank(spark, TestSpark.sfDir).collect()
    assert(top.length == 15)
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("dupRateByLang: doc counts conserve the corpus; survivor " +
    "share + dup structure consistent") {
    val rows = TextAnalysis.dupRateByLang(spark, TestSpark.sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.documents(spark, TestSpark.sfDir).count())
    rows.foreach { r =>
      val dr = r.getAs[Double]("dup_rate")
      val ss = r.getAs[Double]("survivor_share")
      assert(dr >= 0.0 && dr <= 1.0)
      assert(ss > 0.0 && ss <= 1.0)
      // a language with no dupes has survivor share exactly 1
      if (dr == 0.0) assert(math.abs(ss - 1.0) < 1e-9)
    }
  }

  test("vocabCoverage: coverage is monotone in k and bounded by 1") {
    val rows = TextAnalysis.vocabCoverage(spark, TestSpark.sfDir)
      .collect()
    assert(rows.map(_.getAs[Long]("top_k")).toSeq ==
      Seq(10L, 100L, 1000L))
    val cov = rows.map(_.getAs[Double]("token_coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(cov.forall(c => c > 0.0 && c <= 1.0))
  }

  test("cohensKappa agrees with a recomputation from langConfusion") {
    val cells = TextAnalysis.langConfusion(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n_docs")))
    val n = cells.map(_._2).sum.toDouble
    val po = cells.filter(c => c._1._1 == c._1._2).map(_._2).sum / n
    val rowT = cells.groupBy(_._1._1).map { case (k, v) => k -> v.map(_._2).sum }
    val colT = cells.groupBy(_._1._2).map { case (k, v) => k -> v.map(_._2).sum }
    val pe = rowT.keys.toSeq.intersect(colT.keys.toSeq)
      .map(k => rowT(k).toDouble * colT(k) / (n * n)).sum
    val got = TextAnalysis.cohensKappa(spark, TestSpark.sfDir).head()
    assert(got.getAs[Long]("n_docs") == n.toLong)
    assert(math.abs(got.getAs[Double]("po") - po) < 1e-3)
    assert(math.abs(got.getAs[Double]("kappa") -
      (po - pe) / (1 - pe)) < 1e-3)
  }

  test("krippendorffAlpha: alpha <= 1, disagreements bounded") {
    val r = graft.operators.TextAnalysis.krippendorffAlpha(
      TestSpark.spark, TestSpark.sfDir).collect().head
    assert(r.getAs[Long]("n_ratings") == 3 * r.getAs[Long]("n_units"))
    val d_o = r.getAs[Double]("d_observed")
    val d_e = r.getAs[Double]("d_expected")
    assert(d_o >= 0.0 && d_o <= 1.0 + 1e-9)
    assert(d_e > 0.0 && d_e <= 1.0 + 1e-9)
    assert(r.getAs[Double]("alpha") <= 1.0 + 1e-9)
  }

  test("rougePairs: F1 bounded by min(P,R) geometry, rouge2 <= rouge1") {
    val rows = graft.operators.TextAnalysis.rougePairs(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("rouge1_p")
      val rc = r.getAs[Double]("rouge1_r")
      val f = r.getAs[Double]("rouge1_f")
      assert(p >= 0.0 && p <= 1.0 + 1e-9)
      assert(rc >= 0.0 && rc <= 1.0 + 1e-9)
      assert(f <= math.max(p, rc) + 1e-3)
      assert(r.getAs[Double]("rouge2_f") <= f + 0.05) // bigram overlap can't much exceed unigram
    }
  }

  test("clippedOverlap expression: two-pointer merge clips, skips, handles empties") {
    val s = TestSpark.spark
    import org.apache.spark.sql.functions._
    def grams(texts: Seq[String]) = {
      val df = s.createDataFrame(texts.zipWithIndex.map(_.swap))
        .toDF("doc_id", "text")
      df.select(col("doc_id"), explode(split(col("text"), " ")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("g"), col("c")))).as("m"))
    }
    val g = grams(Seq("a b a c", "a a a b z", "x y")).persist()
    def ov(i: Int, j: Int): Long = {
      val a = g.filter(col("doc_id") === i).select(col("m").as("ma"))
      val b = g.filter(col("doc_id") === j).select(col("m").as("mb"))
      a.crossJoin(b).select(graft.functions.GramOverlapFunctions
        .clippedOverlap(col("ma"), col("mb")).as("ov"))
        .collect().head.getLong(0)
    }
    // doc0 = {a:2, b:1, c:1}, doc1 = {a:3, b:1, z:1}: min(2,3)+min(1,1) = 3
    assert(ov(0, 1) === 3L)
    assert(ov(1, 0) === 3L) // symmetric
    assert(ov(0, 2) === 0L) // disjoint vocabularies
    assert(ov(0, 0) === 4L) // self-overlap = own length
    g.unpersist()
  }

  test("decontamSpans: finds the exact shared run, drops sub-threshold overlap") {
    // md5-bucket split: doc_ids 2 and 7 land in the >=90 eval bucket,
    // 1 and 3 in train (verified constants of the hash split)
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")   // 12 tokens
    val short = (1 to 5).map(i => s"v$i").mkString(" ")     // 5 tokens
    val dir = TestSpark.documentsFixture(Seq(
      (1L, "p1 p2 p3 p4 p5 " + shared + " q1 q2 q3 q4 q5", "en", "web"),
      (2L, "r1 r2 r3 " + shared + " " + short + " t1", "en", "web"),
      (3L, "u1 u2 " + short + " u3 u4 u5", "en", "web"),
      (7L, (1 to 20).map(i => s"z$i").mkString(" "), "en", "web")))
    val rows = graft.operators.TextAnalysis
      .decontamSpans(TestSpark.spark, dir, minSpanTokens = 10).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") === 1L)
    assert(r.getAs[Long]("eval_id") === 2L)
    assert(r.getAs[Long]("span_tokens") === 12L)
    assert(r.getAs[Int]("doc_pos") === 5)  // s1 at word index 5 of doc 1
    assert(r.getAs[Int]("eval_pos") === 3) // s1 at word index 3 of doc 2
    // the 5-token overlap (doc 3 x doc 2) is below threshold: absent
    // sub-8-token thresholds would break winnowing completeness: refused
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.decontamSpans(TestSpark.spark, dir, 6)
    }
  }

  test("burrowsDelta: symmetric non-negative pair deltas over shared words") {
    val rows = graft.operators.TextAnalysis.burrowsDelta(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("delta") >= 0.0)
      assert(r.getAs[Long]("n_words") > 0L &&
        r.getAs[Long]("n_words") <= 50L)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }
}
