package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Arbitrary}
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.pipeline.{Schemas, Transform}

/** Property tests (SURVEY §5.4): algebraic invariants checked on
  * ScalaCheck-generated data pushed through the REAL Spark operators —
  * one job per property over a generated batch, not per sample.
  */
class PropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  private val genPrice: Gen[Schemas.BitcoinPrice] = for {
    src <- Gen.oneOf("coingecko", "coincap", "blockchain_info")
    usd <- Gen.option(Gen.choose(1.0, 100000.0))
    eur <- Gen.option(Gen.choose(1.0, 100000.0))
    cap <- Gen.option(Gen.choose(1.0, 1e12))
    chg <- Gen.option(Gen.choose(-50.0, 50.0))
    dayOffset <- Gen.choose(0, 3)
    hour <- Gen.choose(0, 23)
  } yield Schemas.BitcoinPrice(src, "BTC", usd, eur, eur.map(_ * 6.0),
    cap, cap.map(_ / 100), chg,
    java.sql.Timestamp.valueOf(f"2026-03-${dayOffset + 1}%02d $hour%02d:00:00"))

  test("staging: coalesced measures are never null; row count preserved") {
    val rows = sample(genPrice, 300, seed = 1L)
    val stg = Transform.staging(rows.toDF()).cache()
    assert(stg.count() === rows.length.toLong)
    val numeric = Seq("price_usd", "price_eur", "price_brl", "market_cap_usd",
      "volume_24h_usd", "price_change_24h_pct")
    val nulls = stg.select(numeric.map(c => sum(col(c).isNull.cast("int")).as(c)): _*)
      .collect().head
    numeric.indices.foreach(i => assert(nulls.getLong(i) === 0L, numeric(i)))
  }

  test("mart: min <= avg <= max and records sums to staging rows per grain") {
    val rows = sample(genPrice, 300, seed = 2L)
    val stg = Transform.staging(rows.toDF())
    val mart = Transform.dailyMart(stg).collect()
    mart.foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_price_usd"),
        r.getAs[Double]("avg_price_usd"), r.getAs[Double]("max_price_usd"))
      assert(mn <= av + 1e-9 && av <= mx + 1e-9)
    }
    assert(mart.map(_.getAs[Long]("records")).sum === rows.length.toLong)
  }

  test("VecDot/VecCosine agree with the sequential scala fold") {
    val genVec = Gen.listOfN(16, Gen.choose(-4.0f, 4.0f)).map(_.toArray)
    val pairs = sample(Gen.zip(genVec, genVec), 200, seed = 3L)
    val df = pairs.map { case (a, b) => (a.toSeq, b.toSeq) }.toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b")).as("dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos"))
    val got = df.collect()
    pairs.zip(got).foreach { case ((a, b), row) =>
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      assert(row.getDouble(0) === dot)
      assert(math.abs(row.getDouble(1) - dot / (na * nb)) < 1e-12)
      assert(row.getDouble(1) >= -1.0 - 1e-9 && row.getDouble(1) <= 1.0 + 1e-9)
    }
  }

  test("SortedLongJaccard equals set-based Jaccard for arbitrary sets") {
    val genSet = Gen.nonEmptyListOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    val pairs = sample(Gen.zip(genSet, genSet), 200, seed = 4L)
    val df = pairs.toDF("a", "b").select(
      org.apache.spark.sql.GraftSql.column(graft.functions.SortedLongJaccard(
        org.apache.spark.sql.GraftSql.expression(col("a")),
        org.apache.spark.sql.GraftSql.expression(col("b")))).as("j"))
    df.collect().zip(pairs).foreach { case (row, (a, b)) =>
      val expected = a.toSet.intersect(b.toSet).size.toDouble / a.toSet.union(b.toSet).size
      assert(row.getDouble(0) === expected)
    }
  }

  test("connected components: union-find and label propagation agree on random graphs") {
    val genEdge = Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L))
      .suchThat { case (a, b) => a != b }
    (0 until 5).foreach { round =>
      val edges = sample(genEdge, 60, seed = 100L + round)
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val df = edges.toDF("doc_a", "doc_b")
      val uf = graft.operators.Dedup.unionFindClusters(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lp = graft.operators.Dedup.propagateClusters(df, maxIters = 15).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(uf === lp, s"round $round, edges $edges")
      // labels are component minima: every node's label <= itself and
      // label nodes are their own label (roots are canonical)
      uf.foreach { case (n, l) => assert(l <= n && uf(l) == l) }
    }
  }

  test("sequencePack: offsets in-window, packs monotone, stream conserved") {
    val genText = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bb", "ccc", "dd", "e")).map(_.mkString(" ")))
    val texts = sample(genText, 120, seed = 11L)
    val dir = TestSpark.documentsFixture(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") })
    val w = 64
    val rows = graft.operators.TextAnalysis
      .sequencePack(spark, dir, windowTokens = w, buckets = 7)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("pack_off"),
        r.getAs[Boolean]("spans_boundary")))
      .sortBy(_._1)
    assert(rows.length === texts.length)
    // reconstruct the stream: starts are the exclusive prefix sums
    var cum = 0L
    rows.foreach { case (_, n, pack, off, spans) =>
      assert(off >= 0 && off < w)                  // offset inside its window
      assert(pack === cum / w && off === cum % w)  // exact layout position
      assert(spans === ((cum + n - 1) / w > cum / w)) // boundary flag exact
      cum += n
    }
    // pack ids are non-decreasing in doc order (contiguous layout)
    assert(rows.map(_._3).sliding(2).forall(p => p.head <= p.last))
  }

  test("chunkSplit: chunks tile the text with the configured stride") {
    val genText = Gen.chooseNum(1, 200).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaNumChar))
    val texts = sample(genText, 80, seed = 12L)
    val dir = TestSpark.documentsFixture(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s") })
    val (chunk, stride) = (50, 40)
    val byDoc = graft.operators.TextAnalysis
      .chunkSplit(spark, dir, chunk = chunk, stride = stride)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("chunk_off"), r.getAs[Int]("n_chunk_chars")))
      .groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val chunks = byDoc(i.toLong).sortBy(_._2)
      val expectedN = (t.length + stride - 1) / stride // offsets 0..len-1 step stride
      assert(chunks.length === expectedN)
      chunks.foreach { case (_, idx, off, len) =>
        assert(off === idx * stride)
        assert(len === math.min(chunk, t.length - off)) // exact tail truncation
      }
      // every char position is covered by at least one chunk
      val covered = chunks.flatMap { case (_, _, off, len) => off until (off + len) }.toSet
      assert(covered === (0 until t.length).toSet)
    }
  }

  test("simhash: identical texts collide; hamming is symmetric and <= 64") {
    val genText = Gen.nonEmptyListOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
      .map(_.mkString(" "))
    val texts = sample(genText, 150, seed = 5L)
    val df = texts.toDF("text")
      .select(graft.functions.TextFunctions.simhash64(col("text")).as("sig"), col("text"))
      .collect().map(r => r.getAs[String]("text") -> r.getAs[Long]("sig")).toMap
    texts.foreach { t =>
      assert(df(t) === df(t)) // deterministic per text
    }
    val sigs = df.values.toSeq
    sigs.zip(sigs.reverse).foreach { case (a, b) =>
      val h = java.lang.Long.bitCount(a ^ b)
      assert(h >= 0 && h <= 64)
      assert(h === java.lang.Long.bitCount(b ^ a))
    }
  }

  test("gini is scale-invariant and bounded on generated spend vectors") {
    // Gini over per-customer spends: invariant under x -> c*x, in
    // [0, 1), and 0 for perfectly equal spends — checked through the
    // SAME rank-identity the operator uses, on generated data
    def gini(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length.toDouble
      val num = s.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      2.0 * num / (n * s.sum) - (n + 1.0) / n
    }
    val gen = Gen.nonEmptyListOf(Gen.choose(1.0, 10000.0))
    sample(gen, 30, seed = 7L).foreach { xs =>
      val g = gini(xs)
      assert(g >= -1e-9 && g < 1.0, s"gini $g out of range for n=${xs.length}")
      assert(math.abs(gini(xs.map(_ * 3.5)) - g) < 1e-9, "not scale-invariant")
    }
    assert(math.abs(gini(Seq.fill(40)(25.0))) < 1e-9, "equal spends must give 0")
  }

  test("CM join estimate upper-bounds the exact inner product on generated keys") {
    // the operator's min-over-seeds inner product can only ADD hash
    // collisions to the true Σ cntA(v)·cntB(v) — never subtract
    val genKeys = Gen.listOfN(400, Gen.choose(0L, 60L))
    val width = 64
    sample(genKeys, 10, seed = 11L).zipWithIndex.foreach { case (ks, i) =>
      val a = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val b = sample(genKeys, 1, seed = 100L + i).head
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = a.keySet.intersect(b.keySet).toSeq
        .map(k => a(k) * b(k)).sum
      val est = (0 until 4).map { seed =>
        def bucket(k: Long): Int =
          (((k * 2654435761L + seed * 40503L) >>> 16) % width).toInt
        val ca = a.groupBy { case (k, _) => bucket(k) }.view
          .mapValues(_.values.sum).toMap
        val cb = b.groupBy { case (k, _) => bucket(k) }.view
          .mapValues(_.values.sum).toMap
        ca.keySet.intersect(cb.keySet).toSeq.map(x => ca(x) * cb(x)).sum
      }.min
      assert(est >= exact, s"CM estimate $est below exact $exact")
    }
  }

  test("hash_reservoir: sample == k-smallest-hash rule on generated data") {
    import graft.functions.FreqSketchFunctions.hashReservoir
    val genRow: Gen[(Long, Double)] = for {
      h <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      v <- Gen.choose(-1000.0, 1000.0)
    } yield (h, v)
    for (seed <- Seq(11L, 22L, 33L)) {
      val rows = sample(genRow, 400, seed)
      val k = 16
      // reference: min value per hash (the admit rule), then k smallest
      val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).min)
        .toSeq.sortBy(_._1).take(k).map(_._2).toSet
      for (parts <- Seq(1, 5, 13)) {
        val got = rows.toDF("h", "v").repartition(parts)
          .agg(hashReservoir(col("h"), col("v"), k).as("s"))
          .select(explode(col("s")).as("v")).as[Double].collect().toSet
        assert(got === want, s"seed=$seed parts=$parts")
      }
    }
  }
  test("VecL2Sq is BIT-identical to the aggregate(zip_with) HOF fold it replaced") {
    import org.apache.spark.sql.functions._
    val gen: Gen[Seq[Double]] =
      Gen.listOfN(7, Gen.choose(-1e6, 1e6)).map(_.toSeq)
    val rows = sample(Gen.zip(gen, gen), 200, 20260816L)
    val df = rows.toDF("a", "b")
      .withColumn("kernel",
        graft.functions.VectorFunctions.l2Sq(col("a"), col("b")))
      .withColumn("hof", aggregate(
        zip_with(col("a"), col("b"), (p, q) => (p - q) * (p - q)),
        lit(0.0), (acc, v) => acc + v))
    // exact equality, not tolerance: the matrix-profile hash-parity
    // claim rests on the kernel reproducing the HOF's fold order
    val bad = df.filter(col("kernel") =!= col("hof")).count()
    assert(bad === 0L)
  }
}