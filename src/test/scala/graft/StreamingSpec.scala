package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, SessionOut}

/** Structured Streaming semantics driven through MemoryStream
  * micro-batches: watermarked windowed aggregation and stateful
  * sessionization, plus batch/stream plan parity. */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-08-12 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("windowedTypeCounts aggregates per tumbling window under watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.windowedTypeCounts(mem.toDF(), "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(
        Event(1, 1, "view", 10.0, ts(0)),
        Event(2, 1, "view", 20.0, ts(10)),
        Event(3, 2, "purchase", 100.0, ts(40)))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type")) ->
          ((r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))).toMap
      assert(rows((ts(0), "view")) === ((2L, 30.0)))
      assert(rows((ts(30), "purchase")) === ((1L, 100.0)))
    } finally q.stop()
  }

  test("streamingPChart flags an injected error burst against fixed limits") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // baseline pbar = 0.1: a 10-event window with 1 error sits inside
    // p = 0.1 +- 3*sqrt(0.09/10) ~ [0, 0.385]; a 10-event window with
    // 8 errors (p = 0.8) must breach
    val q = EventStreams.streamingPChart(mem.toDF(), pbar = 0.1,
        windowLength = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("p_chart_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData((1 to 10).map(i =>
        Event(i.toLong, 1, if (i == 1) "error" else "view", 1.0, ts(i))): _*)
      mem.addData((11 to 20).map(i =>
        Event(i.toLong, 1, if (i <= 18) "error" else "view", 1.0,
          ts(30 + (i - 10)))): _*)
      q.processAllAvailable()
      val rows = spark.table("p_chart_stream").collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          ((r.getAs[Long]("bad"), r.getAs[Int]("breach")))).toMap
      assert(rows(ts(0)) === ((1L, 0)))
      assert(rows(ts(30)) === ((8L, 1)))
    } finally q.stop()
  }

  test("dailyActiveSketch: KMV partials merge across micro-batches, stream == batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dailyActiveSketch(mem.toDF(), k = 4)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete).start()
    try {
      // 6 distinct users across two micro-batches (forces a state-store
      // MERGE of serialized KMV partials), one repeated user
      mem.addData(Event(1, 1, "view", 1.0, ts(0)),
        Event(2, 2, "view", 1.0, ts(5)), Event(3, 3, "view", 1.0, ts(9)))
      q.processAllAvailable()
      mem.addData(Event(4, 4, "view", 1.0, ts(15)),
        Event(5, 5, "view", 1.0, ts(20)), Event(6, 6, "view", 1.0, ts(25)),
        Event(7, 1, "view", 1.0, ts(30))) // dup user
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream").collect()
        .map(r => (r.getAs[Timestamp]("day_start"), r.getAs[Long]("n_retained"),
          r.getAs[Double]("est_users"))).toSet
      // batch twin over the identical rows
      val batch = EventStreams.dailyActiveSketch(
        Seq(Event(1, 1, "view", 1.0, ts(0)), Event(2, 2, "view", 1.0, ts(5)),
          Event(3, 3, "view", 1.0, ts(9)), Event(4, 4, "view", 1.0, ts(15)),
          Event(5, 5, "view", 1.0, ts(20)), Event(6, 6, "view", 1.0, ts(25)),
          Event(7, 1, "view", 1.0, ts(30))).toDF(), k = 4)
        .collect().map(r => (r.getAs[Timestamp]("day_start"),
          r.getAs[Long]("n_retained"), r.getAs[Double]("est_users"))).toSet
      assert(streamed === batch)
      assert(streamed.head._2 === 4L, "sketch retains exactly k mins")
    } finally q.stop()
  }

  test("sessionizeStream closes a session when the gap passes, across micro-batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionizeStream(mem.toDS(), gapSeconds = 1800L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events 10 min apart (one open session)
      mem.addData(Event(1, 1, "view", 10.0, ts(0)), Event(2, 1, "view", 30.0, ts(10)))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // still open
      // batch 2: 40-min gap -> closes session 1, opens session 2
      mem.addData(Event(3, 1, "view", 5.0, ts(50)))
      q.processAllAvailable()
      val s = spark.table("sessions").as[SessionOut].collect()
      assert(s.length === 1)
      assert(s.head === SessionOut(1L, ts(0), ts(10), 2L, 40.0))
      // advance the watermark (2h delay) far past user 1's gap horizon:
      // ts(300) sets watermark to ts(180) at batch end; the NEXT batch
      // evaluates timeouts against it and flushes the trailing session
      mem.addData(Event(4, 2, "view", 1.0, ts(300)))
      q.processAllAvailable()
      mem.addData(Event(5, 2, "view", 1.0, ts(301)))
      q.processAllAvailable()
      val s2 = spark.table("sessions").as[SessionOut].collect()
      assert(s2.toSet.contains(SessionOut(1L, ts(50), ts(50), 1L, 5.0)),
        s2.mkString(", "))
    } finally q.stop()
  }

  test("windowedTypeCounts logical plan runs identically in batch mode") {
    val batch = Seq(
      Event(1, 1, "view", 10.0, ts(0)),
      Event(2, 1, "view", 20.0, ts(10)),
      Event(3, 2, "purchase", 100.0, ts(40))).toDF()
    val rows = EventStreams.windowedTypeCounts(batch, "30 minutes", "1 hour")
      .collect().map(r => (r.getAs[Timestamp]("window_start"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n_events")).toMap
    assert(rows((ts(0), "view")) === 2L)
    assert(rows((ts(30), "purchase")) === 1L)
  }

  test("dedupStream drops replayed events within the watermark horizon") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupStream(mem.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, 1, "view", 10.0, ts(0)),
        Event(1, 1, "view", 10.0, ts(0)),  // in-batch replay
        Event(2, 1, "view", 20.0, ts(5)))
      q.processAllAvailable()
      mem.addData(Event(1, 1, "view", 10.0, ts(1))) // cross-batch replay
      q.processAllAvailable()
      val ids = spark.table("deduped").collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted === Seq(1L, 2L))
    } finally q.stop()
  }

  test("purchaseViewJoin joins streams within the interval, bounded by watermarks") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val df = mem.toDF()
    val q = EventStreams.purchaseViewJoin(df)
      .writeStream.format("memory").queryName("pv_join")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        Event(1, 1, "view", 1.0, ts(0)),      // 40 min before purchase → match
        Event(2, 1, "view", 1.0, ts(30)),     // 10 min before → match
        Event(3, 2, "view", 1.0, ts(35)),     // other user → no match
        Event(4, 1, "purchase", 9.0, ts(40)),
        Event(5, 1, "view", 1.0, ts(45)))     // after purchase → no match
      q.processAllAvailable()
      val got = spark.table("pv_join").collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"))).toSet
      assert(got === Set((4L, 1L), (4L, 2L)))
      // batch-mode parity: identical logical plan, identical rows
      val batch = Seq(
        Event(1, 1, "view", 1.0, ts(0)), Event(2, 1, "view", 1.0, ts(30)),
        Event(3, 2, "view", 1.0, ts(35)), Event(4, 1, "purchase", 9.0, ts(40)),
        Event(5, 1, "view", 1.0, ts(45))).toDF()
      val batchGot = EventStreams.purchaseViewJoin(batch).collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"))).toSet
      assert(batchGot === got)
    } finally q.stop()
  }

  test("priceStreamToLake appends micro-batches as snapshots") {
    implicit val sc = spark.sqlContext
    val wh = TestSpark.tempDir("graft-stream-wh")
    val catalog = new graft.pipeline.LakeCatalog(spark, wh)
    catalog.createNamespace("raw")
    val mem = MemoryStream[graft.pipeline.Schemas.BitcoinPrice]
    val q = EventStreams.priceStreamToLake(mem.toDF(), catalog,
      TestSpark.tempDir("graft-ckpt"))
    try {
      val row = graft.pipeline.Schemas.BitcoinPrice("coingecko", "BTC",
        Some(50000.0), Some(46000.0), Some(272500.0), Some(1e12), Some(1e10),
        Some(1.5), ts(0))
      mem.addData(row)
      q.processAllAvailable()
      mem.addData(row.copy(extracted_at = ts(60)))
      q.processAllAvailable()
      assert(catalog.table(graft.pipeline.Ingest.RawTable).count() === 2L)
      assert(catalog.snapshots(graft.pipeline.Ingest.RawTable).count() === 2L)
    } finally q.stop()
  }

  test("sessionWindowValues runs as a streaming aggregation (MemoryStream)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionWindowValues(mem.toDF())
      .writeStream.format("memory").queryName("sess_win")
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(
        Event(1, 1, "view", 1.0, ts(0)),
        Event(2, 1, "view", 2.0, ts(10)),  // +10 min: merges
        Event(3, 1, "view", 4.0, ts(50)))  // +40 min gap: new session
      q.processAllAvailable()
      val rows = spark.table("sess_win").collect()
        .map(r => (r.getAs[Timestamp]("session_start"),
          r.getAs[Long]("n_events"), r.getAs[Double]("session_value"))).toSet
      assert(rows === Set((ts(0), 2L, 3.0), (ts(50), 1L, 4.0)))
    } finally q.stop()
  }

  test("sessionWindowValues merges by gap; an exact-gap successor still merges") {
    val base = 1700000000L // epoch seconds; fixture ts column is nanos
    def ns(offsetS: Long) = (base + offsetS) * 1000000000L
    val dir = TestSpark.eventsFixture(Seq(
      (1L, 7L, "click", java.lang.Double.valueOf(1.0), ns(0)),
      (2L, 7L, "click", java.lang.Double.valueOf(2.0), ns(600)),   // +10 min: same
      (3L, 7L, "click", java.lang.Double.valueOf(4.0), ns(2400)),  // exactly +30 min: merges
      (4L, 7L, "click", java.lang.Double.valueOf(8.0), ns(4201)))) // +30:01: NEW session
    val out = EventStreams.sessionWindowValues(Tables.events(spark, dir)).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("session_start").getTime / 1000L - base,
                 r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))
      .toSet
    assert(out === Set((0L, 3L, 7.0), (4201L, 1L, 8.0)))
  }

  test("enrichStreamGate: stream-static join equals the batch join") {
    import org.apache.spark.sql.functions._
    val got = EventStreams.enrichStreamGate(spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("n_events"), r.getAs[Long]("value_c"))).toSet
    val want = EventStreams.enrichBySegment(
        Tables.events(spark, TestSpark.sfDir), Tables.customer(spark, TestSpark.sfDir))
      .collect()
      .map(r => (r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("n_events"), r.getAs[Long]("value_c"))).toSet
    assert(got === want && got.nonEmpty)
  }

  test("dedupStreamGateKeys: streaming dedup equals batch DISTINCT over the keys") {
    val base = 1786838400L
    def ns(offsetS: Long) = (base + offsetS) * 1000000000L
    val dir = TestSpark.eventsFixture(Seq(
      (1L, 1L, "view", java.lang.Double.valueOf(1.0), ns(0)),
      (2L, 1L, "view", java.lang.Double.valueOf(2.0), ns(10)),   // dup key
      (3L, 1L, "purchase", java.lang.Double.valueOf(3.0), ns(20)),
      (4L, 2L, "view", java.lang.Double.valueOf(4.0), ns(30)),
      (5L, 2L, "view", java.lang.Double.valueOf(5.0), ns(40)))) // dup key
    val keys = EventStreams.dedupStreamGateKeys(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet
    assert(keys === Set((1L, "view"), (1L, "purchase"), (2L, "view")))
  }

  test("statefulProfileGate: transformWithState drain equals batch GROUP BY") {
    val base = 1786838400L
    def ns(offsetS: Long) = (base + offsetS) * 1000000000L
    val dir = TestSpark.eventsFixture(Seq(
      (1L, 1L, "view", java.lang.Double.valueOf(1.25), ns(0)),
      (2L, 1L, "view", java.lang.Double.valueOf(2.50), ns(10)),
      (3L, 1L, "purchase", java.lang.Double.valueOf(9.99), ns(20)),
      (4L, 2L, "view", java.lang.Double.valueOf(-0.75), ns(30))))
    val got = EventStreams.statefulProfileGate(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("value_cents")))).toMap
    assert(got((1L, "view")) === ((2L, 375L)))      // floor(125)+floor(250)
    assert(got((1L, "purchase")) === ((1L, 999L)))
    assert(got((2L, "view")) === ((1L, -75L)))      // floor(-75.0) = -75
  }

  test("windowedTopKGate: <= k per window, ranked by count desc") {
    val rows = EventStreams.windowedTopKGate(TestSpark.spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byW = rows.groupBy(_.getAs[java.sql.Timestamp]("window_start"))
    byW.values.foreach { ws =>
      assert(ws.length <= 3)
      val ranked = ws.sortBy(_.getAs[Long]("rk"))
      assert(ranked.map(_.getAs[Long]("rk")).toSeq ==
        (1L to ranked.length).toSeq)
      val counts = ranked.map(_.getAs[Long]("n_events"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }
}
