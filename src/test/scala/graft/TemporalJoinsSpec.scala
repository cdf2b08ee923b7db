package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoins

/** As-of and range join semantics on a crafted event stream. */
class TemporalJoinsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def ns(minute: Int): Long = (1786838400L + minute * 60L) * 1000000000L

  // user 1: view@0, view@10, purchase@15, error@20, purchase@90
  // user 2: purchase@5 (no prior view), error@64, purchase@65
  private val dir = TestSpark.eventsFixture(Seq(
    (1L, 1L, "view", Double.box(1.0), ns(0)),
    (2L, 1L, "view", Double.box(2.0), ns(10)),
    (3L, 1L, "purchase", Double.box(50.0), ns(15)),
    (4L, 1L, "error", null, ns(20)),
    (5L, 1L, "purchase", Double.box(60.0), ns(90)),
    (6L, 2L, "purchase", Double.box(70.0), ns(5)),
    (7L, 2L, "error", null, ns(64)),
    (8L, 2L, "purchase", Double.box(80.0), ns(65))))

  test("as-of join picks the latest view at-or-before each purchase") {
    val rows = TemporalJoins.lastViewBeforePurchase(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("view_event_id")).map(_.longValue)).toMap
    assert(rows(3L) === Some(2L)) // view@10 beats view@0
    assert(rows(5L) === Some(2L)) // still the latest view
    assert(rows(6L) === None)     // user 2 never viewed
    assert(rows(8L) === None)
  }

  test("custom AsOfJoinExec: same verdicts as the composition, merge-scan plan") {
    val custom = TemporalJoins.lastViewBeforePurchaseCustom(spark, dir)
    val rows = custom.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("view_event_id")).map(_.longValue)).toMap
    assert(rows === Map(3L -> Some(2L), 5L -> Some(2L), 6L -> None, 8L -> None))
    // the plan actually runs the custom operator (not a window rewrite),
    // with EnsureRequirements-inserted exchanges+sorts under it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TemporalJoins.lastViewBeforePurchaseCustom(spark, dir)
        .queryExecution.executedPlan
      assert(plan.collect { case e: graft.plans.AsOfJoinExec => e }.nonEmpty,
        s"expected AsOfJoinExec in:\n$plan")
      assert(plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.size >= 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // equal-timestamp tie: two views at the purchase instant -> the
    // greatest view_event_id wins (the declared tie rule)
    val tdir = TestSpark.eventsFixture(Seq(
      (1L, 1L, "view", Double.box(1.0), ns(15)),
      (2L, 1L, "view", Double.box(2.0), ns(15)),
      (3L, 1L, "purchase", Double.box(50.0), ns(15))))
    val tie = TemporalJoins.lastViewBeforePurchaseCustom(spark, tdir).collect()
    assert(tie.head.getAs[java.lang.Long]("view_event_id") === 2L)
  }

  test("forward as-of picks the earliest view at-or-after; exact-time matches count") {
    // extra fixture: user 3 has a view exactly at the purchase instant
    val fdir = TestSpark.eventsFixture(Seq(
      (1L, 1L, "view", Double.box(1.0), ns(0)),
      (2L, 1L, "purchase", Double.box(50.0), ns(15)),
      (3L, 1L, "view", Double.box(2.0), ns(20)),   // first view after
      (4L, 1L, "view", Double.box(3.0), ns(30)),
      (5L, 2L, "purchase", Double.box(70.0), ns(5)), // no later view
      (6L, 3L, "purchase", Double.box(80.0), ns(40)),
      (7L, 3L, "view", Double.box(4.0), ns(40))))  // same instant: inclusive
    val rows = TemporalJoins.firstViewAfterPurchase(spark, fdir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("view_event_id")).map(_.longValue)).toMap
    assert(rows(2L) === Some(3L)) // earliest AFTER, not latest overall
    assert(rows(5L) === None)
    assert(rows(6L) === Some(7L)) // rTime >= lTime is inclusive
  }

  test("range join pairs purchases with errors in the preceding hour only") {
    val pairs = TemporalJoins.errorsBeforePurchase(spark, dir).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    // purchase@90 (user 1): error@20 is 70 min earlier -> excluded
    // purchase@65 (user 2): error@64 is 1 min earlier -> included
    assert(pairs === Set((8L, 7L)))
  }

  test("as-of join keeps matched-row columns together when values are null") {
    // newest view has a NULL value: the match must return (view_id=2,
    // value=NULL), not tear value=1.0 from the older view
    val d = TestSpark.eventsFixture(Seq(
      (1L, 1L, "view", Double.box(1.0), ns(0)),
      (2L, 1L, "view", null, ns(10)),
      (3L, 1L, "purchase", Double.box(9.0), ns(20))))
    val r = TemporalJoins.lastViewBeforePurchase(spark, d).collect()
      .find(_.getAs[Long]("event_id") == 3L).get
    assert(r.getAs[java.lang.Long]("view_event_id") === 2L)
    assert(r.isNullAt(r.fieldIndex("view_value")))
  }

  test("generic rangeJoin works when both sides share the time column name") {
    val ev = Tables.events(spark, TestSpark.eventsFixture(Seq(
      (1L, 1L, "error", Double.box(0.0), ns(0)),
      (2L, 1L, "purchase", Double.box(1.0), ns(30)))))
    import org.apache.spark.sql.functions.col
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts"))
    val out = TemporalJoins.rangeJoin(purchases, errors, Seq("user_id"), "ts", "ts", 3600L)
    assert(out.columns.count(_ == "ts") === 1 && out.columns.contains("ts_r"))
    assert(out.collect().map(r =>
      (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet === Set((2L, 1L)))
  }

  test("range join is inclusive at both bounds") {
    val d2 = TestSpark.eventsFixture(Seq(
      (1L, 1L, "error", Double.box(0.0), ns(0)),
      (2L, 1L, "purchase", Double.box(1.0), ns(60)), // exactly 1h after
      (3L, 1L, "error", Double.box(0.0), ns(60))))   // same instant
    val pairs = TemporalJoins.errorsBeforePurchase(spark, d2).collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("error_id"))).toSet
    assert(pairs === Set((2L, 1L), (2L, 3L)))
  }

  test("intervalOverlap matches a from-scratch per-customer pair walk") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.sfDir
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    var pairs = 0L
    orders.groupBy(_._1).values.foreach { os =>
      val iv = os.map { case (_, ok, st) => (ok, st, st.plusDays(3 + ok % 7)) }
      for (a <- iv; b <- iv if a._1 < b._1)
        if (!a._2.isAfter(b._3) && !b._2.isAfter(a._3)) pairs += 1
    }
    val got = TemporalJoins.intervalOverlap(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n_pairs")).sum == pairs)
    got.foreach { r =>
      assert(r.getAs[Double]("avg_overlap_days") >= 1.0)
      assert(r.getAs[Long]("max_overlap_days") <= 10) // spans are <= 10 days
    }
  }

  test("bitemporalReport: knowledge is monotone and bounded by final") {
    val rows = graft.operators.TemporalJoins.bitemporalReport(
      TestSpark.spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val byMonth = rows.groupBy(_.getAs[java.sql.Date]("valid_month"))
    byMonth.values.foreach { ms =>
      assert(ms.length == 2) // mid + final snapshot
      val sorted = ms.sortBy(_.getAs[java.sql.Date]("known_at").getTime)
      val shares = sorted.map(_.getAs[Double]("share_of_final"))
      assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-9 })
      assert(shares.last >= 1.0 - 1e-9) // the final snapshot knows everything
      sorted.foreach(r => assert(r.getAs[Double]("share_of_final") <= 1.0 + 1e-9))
    }
  }
}
