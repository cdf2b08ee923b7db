package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Windows

/** Window-operator semantics on a crafted event stream: two users, one
  * with a >30-min gap splitting two sessions. Timestamps are epoch
  * nanos in the fixture (mirroring the testdata's physical type). */
class WindowsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def ns(minute: Int): Long = // 2026-08-16 00:MM UTC in nanos
    (1786838400L + minute * 60L) * 1000000000L

  private val dir = TestSpark.eventsFixture(Seq(
    // user 1: events at t0, t0+10min, t0+50min (gap 40min > 30min → 2 sessions)
    (1L, 1L, "view", Double.box(10.0), ns(0)),
    (2L, 1L, "purchase", Double.box(30.0), ns(10)),
    (3L, 1L, "view", Double.box(5.0), ns(50)),
    // user 2: single session, null value on one event
    (4L, 2L, "view", null, ns(0)),
    (5L, 2L, "purchase", Double.box(100.0), ns(20))))

  test("valueChange: lag-based delta, first event anchored to itself") {
    val v = Windows.valueChange(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("value_change")).toMap
    assert(v(1L) === 0.0)    // no previous → value - value
    assert(v(2L) === 20.0)   // 30 - 10
    assert(v(3L) === -25.0)  // 5 - 30
  }

  test("runningTotal: cumulative per-user sum in event order") {
    val v = Windows.runningTotal(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("running_value")).toMap
    assert(v(1L) === 10.0)
    assert(v(2L) === 40.0)
    assert(v(3L) === 45.0)
    assert(v(5L) === 100.0) // null value contributes nothing
  }

  test("topEventPerUser: exactly one row per user, max value wins") {
    val rows = Windows.topEventPerUser(spark, dir).collect()
    assert(rows.length === 2)
    val byUser = rows.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(byUser(1L) === 2L)
    assert(byUser(2L) === 5L)
  }

  test("sessionize: >30-min gap starts a new session") {
    val rows = Windows.sessionize(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))).toMap
    assert(rows.size === 3)
    assert(rows((1L, 1L)) === ((2L, 40.0)))  // t0 + t10
    assert(rows((1L, 2L)) === ((1L, 5.0)))   // t50 after 40-min gap
    assert(rows((2L, 1L)) === ((2L, 100.0))) // null value sums away
  }

  test("dailyTypeRank keeps at most 3 types per day, rank 1 = most events") {
    val rows = Windows.dailyTypeRank(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("rank") <= 3))
    val r1 = rows.filter(_.getAs[Int]("rank") == 1)
    assert(r1.map(_.getAs[String]("event_type")).toSet === Set("view")) // 3 views > 2 purchases
  }

  test("forwardFill carries the last non-null value; leading nulls stay null") {
    // the shipped testdata has no null values, so the oracle gate can't
    // exercise LOCF semantics — this fixture can
    val ns0 = 1700000000L * 1000000000L
    def ns(offsetS: Long) = ns0 + offsetS * 1000000000L
    val fdir = TestSpark.eventsFixture(Seq(
      (1L, 5L, "view", null, ns(0)),                              // leading null
      (2L, 5L, "view", java.lang.Double.valueOf(3.0), ns(10)),
      (3L, 5L, "view", null, ns(20)),                             // filled with 3.0
      (4L, 5L, "view", null, ns(30)),                             // still 3.0
      (5L, 5L, "view", java.lang.Double.valueOf(7.0), ns(40)),
      (6L, 6L, "view", null, ns(0))))                             // other user: null
    val rows = Windows.forwardFill(spark, fdir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("value_filled")).map(_.doubleValue)).toMap
    assert(rows(1L) === None)
    assert(rows(2L) === Some(3.0))
    assert(rows(3L) === Some(3.0))
    assert(rows(4L) === Some(3.0))
    assert(rows(5L) === Some(7.0))
    assert(rows(6L) === None)
  }

  test("ewmaSmoothed: left fold seeded with first value, null values excluded") {
    val rows = Windows.ewmaSmoothed(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma")))).toMap
    // user 1: [10, 30, 5] → 10 → 0.9*10+0.1*30 = 12 → 0.9*12+0.1*5 = 11.3
    assert(rows(1L) === ((3L, 11.3)))
    // user 2: null dropped → [100] → seed only
    assert(rows(2L) === ((1L, 100.0)))
  }

  test("ewmaSmoothed: cap folds only the trailing events") {
    val d2 = TestSpark.eventsFixture(
      (1 to 6).map(i => (i.toLong, 9L, "view", Double.box(i.toDouble), ns(i))))
    // cap=3 → fold [4,5,6]: 4 → 0.9*4+0.1*5 = 4.1 → 0.9*4.1+0.1*6 = 4.29
    val r = Windows.ewmaSmoothed(spark, d2, cap = 3).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma")))).toMap
    assert(r(9L) === ((6L, 4.29)))
  }

  test("scd2UserTypes: change rows become versioned intervals, open version is current") {
    // user 1: view → purchase → view = 3 versions; user 2: view → purchase = 2
    val rows = Windows.scd2UserTypes(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("version")) ->
        ((r.getAs[String]("event_type"),
          Option(r.getAs[java.lang.Long]("valid_to_s")).map(_.longValue),
          r.getAs[Boolean]("is_current")))).toMap
    assert(rows.size === 5)
    val t0 = 1786838400L
    assert(rows((1L, 1)) === (("view", Some(t0 + 600), false)))
    assert(rows((1L, 2)) === (("purchase", Some(t0 + 3000), false)))
    assert(rows((1L, 3)) === (("view", None, true)))
    assert(rows((2L, 1)) === (("view", Some(t0 + 1200), false)))
    assert(rows((2L, 2)) === (("purchase", None, true)))
    // exactly one current version per user
    val currents = Windows.scd2UserTypes(spark, dir).collect()
      .filter(_.getAs[Boolean]("is_current")).map(_.getAs[Long]("user_id"))
    assert(currents.sorted.toSeq === Seq(1L, 2L))
  }

  test("twapDaily integrates the LOCF step function, censored at midnight") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.Windows.twapDaily(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("d").toString) ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("covered_sec"),
          r.getAs[Double]("twap"))))
      .toMap
    assert(out.nonEmpty)
    // brute-force every group from the raw rows
    val raw = Tables.events(spark, TestSpark.sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), unix_timestamp(col("ts")).as("t"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("t"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    val byGroup = raw.groupBy { case (et, t, _, _) =>
      (et, java.time.Instant.ofEpochSecond(t).toString.take(10))
    }
    byGroup.foreach { case ((et, d), rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val dayEnd = java.time.LocalDate.parse(d).plusDays(1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
      val weights = sorted.indices.map { i =>
        val next = if (i + 1 < sorted.length) sorted(i + 1)._2 else dayEnd
        next - sorted(i)._2
      }
      val twap = sorted.zip(weights).map { case (r, w) => r._4 * w }.sum /
        weights.sum
      val (n, cov, gotTwap) = out((et, d))
      assert(n === sorted.length.toLong && cov === weights.sum)
      assert(math.abs(gotTwap - twap) < 1e-3, s"($et,$d)")
    }
  }
}
