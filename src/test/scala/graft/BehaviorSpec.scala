package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Behavior

/** Funnel and cohort semantics on a crafted event stream. */
class BehaviorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val day = 86400L
  private val base = 1786838400L // 2026-08-16 00:00 UTC
  private def ns(offsetS: Long) = (base + offsetS) * 1000000000L

  private val dir = TestSpark.eventsFixture(Seq(
    // user 1: full funnel in order
    (1L, 1L, "view", Double.box(1.0), ns(0)),
    (2L, 1L, "click", Double.box(1.0), ns(10)),
    (3L, 1L, "purchase", Double.box(1.0), ns(20)),
    // user 2: view then purchase WITHOUT click → stops at stage 1
    (4L, 2L, "view", Double.box(1.0), ns(0)),
    (5L, 2L, "purchase", Double.box(1.0), ns(5)),
    // user 3: click only (no view) → not in the funnel at all
    (6L, 3L, "click", Double.box(1.0), ns(0)),
    // user 1 again next day (for cohort retention)
    (7L, 1L, "view", Double.box(1.0), ns(day + 100))))

  test("funnelStages: ordered earliest-path counts and conversions") {
    val rows = Behavior.funnelStages(spark, dir).collect()
      .map(r => r.getAs[Int]("stage") ->
        ((r.getAs[String]("event_type"), r.getAs[Long]("n_users"),
          r.getAs[Double]("conversion")))).toMap
    assert(rows(1) === (("view", 2L, 1.0)))
    assert(rows(2) === (("click", 1L, 0.5)))
    assert(rows(3) === (("purchase", 1L, 0.5)))
  }

  test("transitionMatrix: row-normalized adjacent-pair probabilities") {
    // transitions: u1 view>click>purchase>view(next day), u2
    // view>purchase, u3 none. From 'view': click and purchase once
    // each -> p 0.5/0.5; the other rows are single certain hops.
    val m = Behavior.transitionMatrix(spark, dir).collect()
      .map(r => (r.getAs[String]("cur_type"), r.getAs[String]("next_type")) ->
        ((r.getAs[Long]("n_transitions"), r.getAs[Double]("p_next")))).toMap
    assert(m(("view", "click")) === ((1L, 0.5)))
    assert(m(("view", "purchase")) === ((1L, 0.5)))
    assert(m(("click", "purchase")) === ((1L, 1.0)))
    assert(m(("purchase", "view")) === ((1L, 1.0)))
    assert(m.size === 4)
  }

  test("topPaths: ordered first-k journeys ranked with path tie-break") {
    val rows = Behavior.topPaths(spark, dir).collect()
      .map(r => r.getAs[Int]("rank") ->
        ((r.getAs[String]("path"), r.getAs[Long]("n_users")))).toMap
    assert(rows(1) === (("click", 1L)))
    assert(rows(2) === (("view>click>purchase>view", 1L)))
    assert(rows(3) === (("view>purchase", 1L)))
    assert(rows.size === 3)
  }

  test("cohortRetention: day-offset activity per first-seen cohort") {
    val collected = Behavior.cohortRetention(spark, dir).collect()
    val day0 = java.time.Instant.ofEpochSecond(base)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val rows = collected
      .map(r => (r.getAs[java.sql.Date]("cohort_date").toString,
        r.getAs[Int]("day_offset")) -> r.getAs[Long]("n_users")).toMap
    // all three users first seen on day 0; only user 1 returns on day 1
    assert(rows((day0, 0)) === 3L)
    assert(rows((day0, 1)) === 1L)
    assert(rows.size === 2)
  }

  test("activityBitmap: day-of-month bits OR together, popcount = distinct days") {
    // base is 2026-08-16 UTC → day 16 sets bit 15; user 1 also day 17
    val rows = Behavior.activityBitmap(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("days_bitmap"), r.getAs[Long]("n_active_days")))).toMap
    assert(rows(1L) === (((1L << 15) | (1L << 16), 2L)))
    assert(rows(2L) === ((1L << 15, 1L)))
    assert(rows(3L) === ((1L << 15, 1L)))
  }

  test("basketRules: metrics reproduce a driver-side brute force, lift-ordered") {
    val sfDir = TestSpark.sfDir
    val baskets = Tables.lineitem(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        org.apache.spark.sql.functions.col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = baskets.map(_._1).distinct.length.toDouble
    val nOne = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nBoth = baskets.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r4(v: Double) = math.floor(v * 1e4 + 0.5 + 1e-6) / 1e4
    val want = nBoth.filter(_._2 >= 3).map { case ((a, b), n) =>
      (a, b, n, r4(n / nOrders), r4(n.toDouble / nOne(a)),
        r4(n.toDouble * nOrders / (nOne(a) * nOne(b))))
    }.toSeq.sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = operators.Behavior.basketRules(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"),
        r.getAs[Long]("n_both"), r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("attribution: every model distributes exactly one credit per converted purchase") {
    val rows = operators.Behavior.attribution(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val firstSum = rows.map(_.getAs[Long]("first_touch")).sum
    val lastSum = rows.map(_.getAs[Long]("last_touch")).sum
    val linearSum = rows.map(_.getAs[Double]("linear_credit")).sum
    // one first-touch and one last-touch credit per attributed conversion,
    // and the linear credits sum to the same conversion count
    assert(firstSum === lastSum)
    assert(math.abs(linearSum - firstSum.toDouble) < 0.01 * firstSum)
  }

  test("tierHistory: intervals partition each user's events, SCD2-closed") {
    val rows = Behavior.tierHistory(spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("run_id"),
        r.getAs[Int]("tier"), r.getAs[Long]("valid_from"),
        Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
        r.getAs[Long]("n_events")))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_._2)
      // run ids are dense from 1
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      // each interval closes exactly at its successor's start; only the
      // last is open (the CURRENT SCD2 row)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), "valid_to must equal next valid_from")
          assert(a._3 != b._3, "consecutive runs must change tier")
        case _ =>
      }
      assert(sorted.last._5.isEmpty, "current row must be open-ended")
      assert(sorted.init.forall(_._5.nonEmpty))
    }
    // events are conserved: interval n_events sums to the user's count
    val evCounts = graft.Tables.events(spark, TestSpark.sfDir)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    byUser.foreach { case (u, ivs) =>
      assert(ivs.map(_._6).sum === evCounts(u), s"user $u event conservation")
    }
  }

  test("peakConcurrency equals brute-force interval overlap per day") {
    val got = Behavior.peakConcurrency(spark, TestSpark.sfDir).collect()
      .map(r => r.getAs[java.sql.Date]("d").toString ->
        (r.getAs[Long]("peak"), r.getAs[Long]("peak_at"))).toMap
    assert(got.nonEmpty)
    // re-derive sessions in plain Scala and sweep every boundary instant
    val ev = Tables.events(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.unix_timestamp(
          org.apache.spark.sql.functions.col("ts")).as("t"),
        org.apache.spark.sql.functions.col("event_id"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("t"),
        r.getAs[Long]("event_id")))
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val runs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = ts.head; var last = ts.head
      ts.tail.foreach { t =>
        if (t - last > 1800L) { runs += ((start, last)); start = t }
        last = t
      }
      runs += ((start, last)); runs
    }.toArray
    def dayOf(t: Long): String =
      java.time.Instant.ofEpochSecond(t).toString.take(10)
    val boundaries = sessions.flatMap(s => Seq(s._1, s._2)).distinct
    val wantPerDay = boundaries.groupBy(dayOf).map { case (d, instants) =>
      val scored = instants.sorted.map(t =>
        (sessions.count(s => s._1 <= t && t <= s._2).toLong, t))
      val peak = scored.map(_._1).max
      d -> (peak, scored.filter(_._1 == peak).map(_._2).min)
    }
    assert(got === wantPerDay)
  }

  test("sessionPaths: every path has 3 steps from the event-type " +
    "vocabulary; trigram count never exceeds in-session event count") {
    val rows = Behavior.sessionPaths(spark, dir).collect()
    assert(rows.nonEmpty)
    val types = Tables.events(spark, dir)
      .select("event_type").distinct().collect()
      .map(_.getString(0)).toSet
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(" > ")
      assert(steps.length == 3 && steps.forall(types.contains))
    }
    // total trigrams = sum over sessions of max(0, n_events - 2)
    val want = graft.operators.Windows.sessionize(spark, dir)
      .collect().map(r => math.max(0L, r.getAs[Long]("n_events") - 2)).sum
    val allPaths = Behavior.sessionPaths(spark, dir, topN = 1000000)
      .collect().map(_.getAs[Long]("n")).sum
    assert(allPaths == want)
  }

  test("markovAbsorption: expected steps are >= 1 and finite; a " +
    "state that always converts immediately reports exactly 1") {
    val sf = TestSpark.sfDir
    val rows = Behavior.markovAbsorption(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Double]("expected_steps")
      assert(t >= 1.0 && !t.isNaN && !t.isInfinite && t < 1e6)
    }
    // crafted chain: a -> purchase always => expected steps exactly 1
    val d2 = TestSpark.eventsFixture(Seq(
      (1L, 1L, "a", Double.box(1.0), ns(0)),
      (2L, 1L, "purchase", Double.box(1.0), ns(10)),
      (3L, 2L, "a", Double.box(1.0), ns(0)),
      (4L, 2L, "purchase", Double.box(1.0), ns(10))))
    val got = Behavior.markovAbsorption(spark, d2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 1.0) < 1e-9)
  }

  test("sloBurn: windows nest (1d counts <= 7d <= 28d); burn is " +
    "rate over budget") {
    val sf = TestSpark.sfDir
    val rows = Behavior.sloBurn(spark, sf).collect()
      .map(r => r.getAs[String]("win_label") -> r).toMap
    assert(rows("1d").getAs[Long]("n_events") <=
      rows("7d").getAs[Long]("n_events"))
    assert(rows("7d").getAs[Long]("n_events") <=
      rows("28d").getAs[Long]("n_events"))
    rows.values.foreach { r =>
      assert(math.abs(r.getAs[Double]("burn_rate") -
        r.getAs[Double]("error_rate") / 0.25) < 1e-3)
    }
  }

  test("retentionCurve: decay exponent positive for a decaying " +
    "pooled curve; day-1 fit within (0, 1.5]") {
    val sf = TestSpark.sfDir
    val r = Behavior.retentionCurve(spark, sf).head()
    assert(r.getAs[Long]("n_offsets") > 3)
    val d1 = r.getAs[Double]("day1_rate_fit")
    assert(d1 > 0.0 && d1 <= 1.5)
    assert(!r.getAs[Double]("decay_exponent").isNaN)
  }

  test("deltaMethodSe: ratio matches sums-over-users; delta SE is " +
    "positive and finite") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sfDir
    val got = Behavior.deltaMethodSe(spark, sf).head()
    val u = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        coalesce(col("value"), lit(0.0))).otherwise(0.0)).as("x"),
        count(lit(1)).cast("double").as("y"))
      .agg(avg(col("x")).as("mx"), avg(col("y")).as("my")).head()
    val want = u.getAs[Double]("mx") / u.getAs[Double]("my")
    assert(math.abs(got.getAs[Double]("revenue_per_event") - want) < 1e-2)
    val se = got.getAs[Double]("delta_se")
    assert(se > 0.0 && !se.isNaN && !se.isInfinite)
  }

  test("ipwAte: ATE equals the stratum-size-weighted effect; rates " +
    "bounded") {
    val sf = TestSpark.sfDir
    val rows = Behavior.ipwAte(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.lineitem(spark, sf).count())
    val want = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("effect")).sum / n
    assert(math.abs(rows.head.getAs[Double]("ate") - want) < 1e-3)
    rows.foreach { r =>
      assert(r.getAs[Double]("rate_treat") >= 0.0 &&
        r.getAs[Double]("rate_treat") <= 1.0)
      assert(r.getAs[Double]("p_treat") > 0.0 &&
        r.getAs[Double]("p_treat") < 1.0) // overlap holds per stratum
    }
  }

  test("missingnessProfile: rates bounded, mean-impute deflates variance") {
    val rows = graft.operators.Behavior.missingnessProfile(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("missing_rate")
      assert(rate >= 0.0 && rate < 1.0)
      assert(r.getAs[Double]("var_imputed") <=
        r.getAs[Double]("var_observed") + 1e-9)
      assert(r.getAs[Double]("chi2_mcar") >= 0.0)
    }
  }

  test("tripleRules: support/lift positive, brands strictly ordered") {
    val rows = graft.operators.Behavior.tripleRules(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(r.getAs[String]("brand_b") < r.getAs[String]("brand_c"))
      assert(r.getAs[Long]("n_all3") >= 5L)
      assert(r.getAs[Double]("support") > 0.0)
      assert(r.getAs[Double]("lift3") > 0.0)
    }
    val lifts = rows.map(_.getAs[Double]("lift3"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("doubleJeopardy: gaps are fit residuals (sum ~ 0), freq >= 1") {
    val rows = graft.operators.Behavior.doubleJeopardy(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val pen = r.getAs[Double]("penetration")
      assert(pen > 0.0 && pen <= 1.0)
      assert(r.getAs[Double]("avg_freq") >= 1.0)
      assert(math.abs(r.getAs[Double]("loyalty_gap") -
        (r.getAs[Double]("avg_freq") - r.getAs[Double]("expected_freq"))) < 2e-3)
    }
    // OLS residuals sum to ~zero across brands
    val gapSum = rows.map(_.getAs[Double]("loyalty_gap")).sum
    assert(math.abs(gapSum) < 0.05)
  }
}
