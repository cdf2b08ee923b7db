package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.functions.ScalarSuites

/** Specs for the round-2 relational extensions: pivot, grouping sets,
  * full outer join, set ops, subqueries, and the scalar suites. The
  * DuckDB oracle hash-checks full outputs; these assert the semantics
  * that make those outputs right. */
class RelationalExtSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("pivot equals the manual conditional aggregation") {
    val pivoted = Relational.pivotDailyType(spark, dir)
    val aggs = Relational.EventTypes.map(t =>
      round(sum(when(col("event_type") === t, col("value"))), 4).as(t))
    val manual = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .agg(aggs.head, aggs.tail: _*)
    assert(pivoted.columns.toSeq === ("event_date" +: Relational.EventTypes))
    assert(pivoted.collect().toSet === manual.collect().toSet)
  }

  test("grouping sets = union of its member aggregations") {
    val gs = Relational.groupingSetsMart(spark, dir).collect().toSet
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("event_date"), col("event_type"), col("value"))
    val byBoth = ev.groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("records"), round(sum(col("value")), 4).as("total_value"))
    val byType = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("records"), round(sum(col("value")), 4).as("total_value"))
      .select(lit(null).cast("date").as("event_date"), col("event_type"),
        col("records"), col("total_value"))
    val total = ev.agg(count(lit(1)).as("records"),
        round(sum(col("value")), 4).as("total_value"))
      .select(lit(null).cast("date").as("event_date"),
        lit(null).cast("string").as("event_type"), col("records"), col("total_value"))
    assert(gs === byBoth.unionByName(byType).unionByName(total).collect().toSet)
  }

  test("full outer keeps keys unique and preserves both exclusive sides") {
    val fo = Relational.fullOuterDaily(spark, dir)
    assert(fo.count() ===
      fo.select(col("user_id"), col("event_date")).distinct().count())
    // exclusive sides appear with a null other-side measure
    assert(fo.filter(col("purchase_value").isNull).count() > 0)
    assert(fo.filter(col("error_value").isNull).count() > 0)
    // and never both null
    assert(fo.filter(col("purchase_value").isNull && col("error_value").isNull)
      .count() === 0)
  }

  test("intersect/except partition their key sets") {
    import org.apache.spark.sql.functions.to_date
    val ev = Tables.events(spark, dir)
    // exceptUsers is (user, day)-grain: purchase days with no error
    // that day; with-error days + error-free days = all purchase days
    val purchaseDays = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val errorDays = ev.filter(col("event_type") === "error")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val withError = purchaseDays.intersect(errorDays).count()
    val only = Relational.exceptUsers(spark, dir).count()
    assert(withError + only === purchaseDays.count())
    // intersectUsers stays user-grain set semantics: no duplicates
    val both = Relational.intersectUsers(spark, dir).count()
    assert(Relational.intersectUsers(spark, dir).distinct().count() === both)
  }

  test("correlated scalar subquery decorrelates to a join (no per-row subplan)") {
    val df = Relational.subqueryCustomers(spark, dir)
    assert(df.count() > 0)
    // every returned customer beats its segment average
    val avgs = Tables.customer(spark, dir).groupBy(col("c_mktsegment"))
      .agg(avg(col("c_acctbal")).as("seg_avg"))
    val joined = df.join(Tables.customer(spark, dir), "c_custkey")
      .join(avgs, "c_mktsegment")
      .filter(col("c_acctbal") <= col("seg_avg"))
    assert(joined.count() === 0)
  }

  test("saltedJoin output equals the plain join") {
    val ev = Tables.events(spark, dir)
    val userDim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events"))
    val plain = ev.join(userDim, "user_id")
      .select(col("event_id"), col("user_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = graft.operators.Joins.saltedJoin(ev, userDim, "user_id", salts = 4)
      .select(col("event_id"), col("user_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === plain)
  }

  test("native kernels are callable from SQL via GraftExtensions") {
    Tables.registerAll(spark, dir)
    val r = spark.sql("""
      SELECT e1.vec_id, vec_cosine(e1.embedding, e2.embedding) AS sim,
             vec_dot(e1.embedding, e1.embedding) AS self_dot,
             vec_l2dist(e1.embedding, e1.embedding) AS self_dist
      FROM embeddings e1 JOIN embeddings e2 ON e1.vec_id = e2.vec_id
      LIMIT 5""").collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("sim") - 1.0) < 1e-9)
      assert(row.getAs[Double]("self_dist") === 0.0)
      assert(row.getAs[Double]("self_dot") > 0.0)
    }
    val sh = spark.sql(
      """SELECT long_simhash(transform(split('hello world hello', ' '), w -> xxhash64(w))) AS h,
        |       sorted_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j""".stripMargin)
      .collect()(0)
    assert(sh.getAs[Long]("h") !== 0L)   // deterministic 64-bit signature
    assert(sh.getAs[Double]("j") === 0.5) // |{2,3}| / |{1,2,3,4}|
  }

  test("bloomSemiJoin output equals the plain left-semi join") {
    import graft.operators.Joins
    val hot = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val viaBloom = Joins.bloomSemiJoin(
        Tables.lineitem(spark, dir), hot, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = Tables.lineitem(spark, dir)
      .join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(viaBloom.collect().toSet === plain.collect().toSet)
  }

  test("zscoreOutliers flags exactly the rows beyond the rounded threshold") {
    val out = Relational.zscoreOutliers(spark, dir).collect()
    assert(out.nonEmpty) // heavy-tailed fixture has |z| > 2.5 rows
    assert(out.forall(r => math.abs(r.getAs[Double]("z")) > 2.5))
    // spot-check one z against a direct computation
    val ev = Tables.events(spark, dir).filter(col("value").isNotNull)
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("m"), stddev_samp(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val one = out.head
    val (m, s) = stats(one.getAs[String]("event_type"))
    val raw = Tables.events(spark, dir)
      .filter(col("event_id") === one.getAs[Long]("event_id"))
      .collect()(0).getAs[Double]("value")
    val expected = math.floor((raw - m) / s * 10000 + 0.5 + 0.000001) / 10000
    assert(one.getAs[Double]("z") === expected)
  }

  test("charHistogram buckets cover every doc and bounds sit inside buckets") {
    val docs = Tables.documents(spark, dir)
    val hist = Relational.charHistogram(spark, dir).collect()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === docs.count())
    hist.foreach { r =>
      val lo = r.getAs[Long]("bucket_lo")
      assert(r.getAs[Long]("min_chars") >= lo)
      assert(r.getAs[Long]("max_chars") < lo + 100)
    }
  }

  test("flagship joins: Q5-shape broadcasts all dims; Q3-shape fuses top-k") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q5 = graft.operators.Joins.localSupplierVolume(spark, dir)
        .queryExecution.executedPlan.toString
      // the only exchanges: lineitem⋈orders co-partitioning + final rollup
      assert("Exchange hashpartitioning".r.findAllIn(q5).length <= 2, q5)
      // all four dims broadcast; the orders side may broadcast too at
      // tiny SF (5 broadcast joins, zero fact-side shuffles)
      assert("BroadcastHashJoin".r.findAllIn(q5).length >= 4, q5)
      val q3 = graft.operators.Joins.shippingPriority(spark, dir)
        .queryExecution.executedPlan.toString
      assert(q3.contains("TakeOrderedAndProject"), q3)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("priceHistogram: buckets partition lineitem, top bucket clamps") {
    val hist = Relational.priceHistogram(spark, dir).collect()
    assert(hist.map(_.getAs[Long]("n_items")).sum === Tables.lineitem(spark, dir).count())
    val buckets = hist.map(_.getAs[Int]("bucket"))
    assert(buckets.forall(b => b >= 0 && b <= 9))
    assert(buckets.distinct.length === buckets.length)
  }

  test("unpivotDaily: 3 metric rows per mart row, values preserved") {
    val wide = Relational.dailyMart(spark, dir).collect()
      .map(r => (r.getAs[java.sql.Date]("event_date").toString, r.getAs[String]("event_type")) -> r)
      .toMap
    val long = Relational.unpivotDaily(spark, dir).collect()
    assert(long.length === wide.size * 3)
    long.foreach { r =>
      val key = (r.getAs[java.sql.Date]("event_date").toString, r.getAs[String]("event_type"))
      val metric = r.getAs[String]("metric")
      assert(r.getAs[Double]("metric_value") === wide(key).getAs[Double](metric))
    }
  }

  test("scalar suites: spot-check semantics against literal expectations") {
    val sf = ScalarSuites.stringFuncs(spark, dir)
      .filter(col("c_custkey") === 1).collect()(0)
    val name = Tables.customer(spark, dir)
      .filter(col("c_custkey") === 1).select("c_name").collect()(0).getString(0)
    assert(sf.getAs[String]("u_name") === name.toUpperCase)
    assert(sf.getAs[Int]("name_len") === name.length)
    assert(sf.getAs[String]("padded_key") === "0000000001")
    assert(sf.getAs[Int]("hash_pos") === name.indexOf('#') + 1)

    val dfn = ScalarSuites.dateFuncs(spark, dir).limit(1).collect()(0)
    assert(dfn.getAs[Int]("o_dow") >= 1 && dfn.getAs[Int]("o_dow") <= 7)

    val mf = ScalarSuites.mathFuncs(spark, dir)
      .filter(col("l_quantity") === 25.0).limit(1).collect()
    mf.foreach { r =>
      assert(r.getAs[Double]("sqrt_qty") === 5.0)
      assert(r.getAs[Double]("qty_sq") === 625.0)
    }
  }

  test("madOutliers flags only deviations beyond 3x the MAD") {
    // type "a": median 10, MAD = median(1,0,0,0,1,90) = 0.5 → threshold
    // 1.5: only the 100 qualifies. Type "b": constant values → MAD 0,
    // adev 0 → 0 > 0 false, so the type is absent from the output.
    val ts0 = 1700000000000000000L
    val edir = TestSpark.eventsFixture(Seq(
      (1L, 1L, "a", 9.0, ts0), (2L, 1L, "a", 10.0, ts0),
      (3L, 1L, "a", 10.0, ts0), (4L, 1L, "a", 10.0, ts0),
      (5L, 1L, "a", 11.0, ts0), (6L, 1L, "a", 100.0, ts0),
      (7L, 2L, "b", 5.0, ts0), (8L, 2L, "b", 5.0, ts0)))
    val rows = Relational.madOutliers(spark, edir).collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("event_type") === "a")
    assert(rows(0).getAs[Long]("n_outliers") === 1L)
    assert(rows(0).getAs[Double]("min_outlier") === 100.0)
    assert(rows(0).getAs[Double]("max_outlier") === 100.0)
  }

  test("globalSort produces a total order (the hash oracle cannot see order)") {
    val rows = Relational.globalSort(spark, dir).collect()
    assert(rows.length === Tables.lineitem(spark, dir).count())
    val keys = rows.map(r => (r.getAs[java.time.LocalDateTime]("l_shipdate"),
      r.getAs[Long]("l_orderkey"), r.getAs[Int]("l_linenumber")))
    keys.sliding(2).foreach { case Array(a, b) =>
      val c = a._1.compareTo(b._1)
      assert(c < 0 || (c == 0 && (a._2 < b._2 || (a._2 == b._2 && a._3 <= b._3))),
        s"out of order: $a then $b")
    }
  }

  test("winsorizedStats: clamped aggregates respect the [p05,p95] band") {
    val rows = Relational.winsorizedStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_wins") <= r.getAs[Double]("avg_wins"))
      assert(r.getAs[Double]("avg_wins") <= r.getAs[Double]("max_wins"))
      // ~10% of rows sit outside [p05,p95] by construction of exact
      // percentiles (ties can shrink it, never grow it much)
      assert(r.getAs[Long]("n_clamped") <= r.getAs[Long]("n_valued") * 15 / 100)
    }
  }

  test("fuzzyNamePairs links within blocks only, by edit distance") {
    // Block = (brand, first word). Same block, dist 1 → pair; same
    // block, dist > 3 → no pair; same name in ANOTHER brand → no pair
    // (blocking is the declared semantics).
    val pdir = TestSpark.tempDir("graft-part")
    val s = spark
    import s.implicits._
    Seq(
      (1L, "red widget", "Brand#1"),
      (2L, "red widgit", "Brand#1"),
      (3L, "red gizmos", "Brand#1"),
      (4L, "red widget", "Brand#2"))
      .toDF("p_partkey", "p_name", "p_brand")
      .write.mode("overwrite").parquet(s"$pdir/part.parquet")
    val pairs = graft.operators.Joins.fuzzyNamePairs(spark, pdir).collect()
      .map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b"),
        r.getAs[Int]("dist"))).toSet
    assert(pairs === Set((1L, 2L, 1)))
  }

  test("psiDrift: separated cohorts alarm, identical cohorts read zero") {
    // 'shift': even-id (ref) values cluster in bin 0, odd-id (cur) in
    // bin 9 -> maximal distribution shift, PSI far above the 0.25
    // investigate bar. 'same': both cohorts identical -> p == q in
    // every bin -> PSI exactly 0.
    val edir = TestSpark.eventsFixture(Seq(
      (0L, 1L, "shift", 0.0, 1000L), (2L, 1L, "shift", 0.5, 1000L),
      (4L, 1L, "shift", 1.0, 1000L), (6L, 1L, "shift", 0.8, 1000L),
      (1L, 1L, "shift", 99.0, 1000L), (3L, 1L, "shift", 100.0, 1000L),
      (5L, 1L, "shift", 98.0, 1000L), (7L, 1L, "shift", 97.0, 1000L),
      (10L, 1L, "same", 5.0, 1000L), (12L, 1L, "same", 10.0, 1000L),
      (11L, 1L, "same", 5.0, 1000L), (13L, 1L, "same", 10.0, 1000L)))
    val psi = graft.operators.Relational.psiDrift(spark, edir).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("psi")).toMap
    assert(psi("shift") > 0.25, s"expected alarm, got ${psi("shift")}")
    assert(psi("same") === 0.0)
  }

  test("entityClusters closes fuzzy matches under transitivity") {
    // The closure case: "madgyz" (key 4) is edit distance 4 from
    // "widget" (key 1) — beyond the maxDist=3 verify bound, so no
    // direct pair — but distance 3 from "widgyt" (key 3), so it joins
    // key 1's entity ONLY through the chain. All four must land in one
    // entity named by the min key. Key 9 is distance 6 from everything
    // and stays unclustered (absent: CC covers edge-touched nodes only).
    val pdir = TestSpark.tempDir("graft-part-er")
    val s = spark
    import s.implicits._
    Seq(
      (1L, "red widget", "Brand#1"),
      (2L, "red widgit", "Brand#1"),
      (3L, "red widgyt", "Brand#1"),
      (4L, "red madgyz", "Brand#1"),
      (9L, "red zzzzzz", "Brand#1"))
      .toDF("p_partkey", "p_name", "p_brand")
      .write.mode("overwrite").parquet(s"$pdir/part.parquet")
    val rows = graft.operators.Joins.entityClusters(spark, pdir).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        ((r.getAs[Long]("entity_id"), r.getAs[Long]("n_members")))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L))
    assert(rows.values.toSet === Set((1L, 4L)))
    // transitivity generally: every pair's endpoints share an entity
    val pairEnt = graft.operators.Joins.fuzzyNamePairs(spark, pdir).collect()
      .forall(p => rows(p.getAs[Long]("key_a"))._1 == rows(p.getAs[Long]("key_b"))._1)
    assert(pairEnt)
  }
  test("targetEncode: out-of-fold means are leakage-free and smoothed to the prior") {
    val dirr = dir
    val got = Relational.targetEncode(spark, dirr).collect()
      .map(r => (r.getAs[String]("category"), r.getAs[Int]("fold")) ->
        (r.getAs[Long]("n_oof"), r.getAs[Double]("encoded"))).toMap
    // brute force the same statistic from raw rows
    val rows = graft.Tables.orders(spark, dirr)
      .join(graft.Tables.customer(spark, dirr)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), (col("o_custkey") % 5).cast("int"),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    got.foreach { case ((cat, fold), (nOof, enc)) =>
      val oof = rows.filter(r => r._1 == cat && r._2 != fold)
      assert(oof.length.toLong === nOof)
      val others = rows.filter(_._2 != fold)
      val prior = others.map(_._3).sum / others.length
      val want = (oof.map(_._3).sum + 10.0 * prior) / (oof.length + 10.0)
      assert(math.abs(enc - want) < 1e-4, s"($cat,$fold): $enc vs $want")
      // the encoding never uses the fold's own labels: perturbing them
      // is invisible by construction (subtraction of the own-fold cell)
    }
    assert(got.nonEmpty && got.keySet.map(_._2).size === 5)
  }

  test("tableFingerprints: partition-order independent, content sensitive") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    val canon = concat_ws("|", col("k"), col("v"))
    def fpOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = Relational.fingerprint(df, "t", canon).collect()(0)
      (r.getAs[Long]("n_rows"), r.getAs[Long]("xor_fp"))
    }
    val base = fpOf(rows.toDF("k", "v"))
    // any partitioning / row order yields the identical fingerprint
    assert(fpOf(rows.reverse.toDF("k", "v").repartition(7)) === base)
    assert(fpOf(rows.toDF("k", "v").repartition(1)) === base)
    // one changed value flips it; a dropped row changes count AND fp
    assert(fpOf(Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d"))
      .toDF("k", "v"))._2 != base._2)
    val dropped = fpOf(rows.take(3).toDF("k", "v"))
    assert(dropped._1 === 3L && dropped._2 != base._2)
    // and the registry op emits one row per audited table
    val all = Relational.tableFingerprints(spark, dir).collect()
    assert(all.map(_.getAs[String]("tbl")).toSeq ===
      Seq("customer", "lineitem", "orders"))
  }

  test("kmvOverlap: exact inclusion-exclusion holds and the sketch " +
    "estimates land within the KMV error envelope") {
    val r = graft.operators.Relational.kmvOverlap(spark, dir).head()
    val ea = r.getAs[Long]("exact_a"); val eb = r.getAs[Long]("exact_b")
    val eu = r.getAs[Long]("exact_union")
    val ei = r.getAs[Long]("exact_inter")
    assert(ei == ea + eb - eu)
    assert(eu >= math.max(ea, eb) && eu <= ea + eb)
    val estU = r.getAs[Double]("est_union")
    val estI = r.getAs[Double]("est_inter")
    // k=256 ⇒ relative σ ≈ 1/√(k−2) ≈ 6.3%; allow 5σ (sf0.001 may
    // also take the exact <k branch, where error is 0)
    assert(math.abs(estU - eu) <= 0.32 * eu + 1)
    assert(math.abs(estI - ei) <= 0.32 * eu + 1)
    val j = r.getAs[Double]("est_jaccard")
    assert(j >= 0.0 && j <= 1.0 + 1e-9)
  }
}
