package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference has no streaming code — its "streaming" is Airflow
  * re-running the batch pipeline hourly (SURVEY §2.9; dag.py:19). These
  * operators are the Spark-native expression of the same workload when
  * the input actually arrives as a stream, plus the event-analytics
  * extensions (windowed aggregation, stateful sessionization) a
  * 100 TB event pipeline needs.
  *
  * All transforms take an input DataFrame that may be either a
  * streaming source (`readStream` / MemoryStream in tests) or a batch
  * frame — the logical plan is identical, which is how the batch oracle
  * checks the streaming semantics.
  *
  * Scale posture: every stateful op is keyed (groupBy window/user), so
  * state distributes across executors; watermarks bound state size —
  * without one, a 100 TB stream accumulates unbounded window state.
  */
object EventStreams {

  /** Event row for typed stateful ops. `value` boxed: events carry
    * nulls (see WindowsSpec fixture). */
  final case class Event(event_id: Long, user_id: Long, event_type: String,
                         value: java.lang.Double, ts: Timestamp)

  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Long, session_value: Double)

  final case class SessionState(start: Timestamp, last: Timestamp,
                                        n: Long, total: Double)

  /** Tumbling-window event counts/values per event_type with a
    * watermark bounding late data (and state). Output: one row per
    * (window, event_type) — appendable once the watermark passes the
    * window end. */
  def windowedTypeCounts(events: DataFrame,
                         windowLength: String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Streaming SPC monitor (r9) — the p-chart as a watermarked
    * event-time windowed aggregate: per window, the error-event
    * proportion against FIXED control limits computed offline from a
    * baseline era (`pbar`; limits are per-window since n varies —
    * p̄ ± 3√(p̄(1−p̄)/n)). The streaming side deliberately takes the
    * limits as ARGUMENTS rather than computing them on the stream:
    * control limits must come from in-control history, not the data
    * being judged (that is what makes it a control chart and keeps the
    * state store at one count row per open window). Batch twin:
    * [[graft.operators.ControlCharts.pChart]], which computes p̄ from
    * the whole corpus; the spec pins an injected error burst to
    * breach = 1. */
  def streamingPChart(events: DataFrame, pbar: Double,
                      windowLength: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "error").cast("long")).as("bad"))
      .select(col("w.start").as("window_start"),
        col("n"), col("bad"),
        (col("bad").cast("double") / col("n").cast("double")).as("p"),
        greatest(lit(pbar) - lit(3.0) * sqrt(lit(pbar) * lit(1.0 - pbar) /
          col("n").cast("double")), lit(0.0)).as("lcl"),
        (lit(pbar) + lit(3.0) * sqrt(lit(pbar) * lit(1.0 - pbar) /
          col("n").cast("double"))).as("ucl"))
      .withColumn("breach",
        (col("p") < col("lcl") || col("p") > col("ucl")).cast("int"))

  /** Streaming daily-actives sketch — the KMV distinct-user estimate
    * as a watermarked 1-day windowed aggregate (exact streaming
    * COUNT(DISTINCT) is unsupported AND unbounded-state by nature; the
    * sketch is the production answer): per day the state store holds
    * ONE k-long mergeable KMV partial ([[graft.functions.KmvMins]] is
    * a TypedImperativeAggregate, so micro-batch partials merge
    * losslessly in state), k longs per open window regardless of
    * traffic. Batch-mode twin of `Relational.kmvDaily` — identical
    * retained mins, so the same per-day ORDER BY hash LIMIT k oracle
    * replays it, and the spec pins stream ≡ batch. */
  def dailyActiveSketch(events: DataFrame, k: Int = 64,
      watermark: String = "2 days"): DataFrame = {
    val est = when(size(col("mins")) < k, size(col("mins")).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(col("mins"), k).cast("double") / lit(math.pow(2.0, 60))))
    events
      .withWatermark("ts", watermark)
      .select(window(col("ts"), "1 day").as("w"),
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("w"))
      .agg(graft.functions.FreqSketchFunctions.kmvMins(col("h"), k).as("mins"))
      .select(col("w.start").as("day_start"),
        size(col("mins")).cast("long").as("n_retained"),
        (floor(est * 10000 + 0.5 + 1e-6) / 10000).as("est_users"))
  }

  /** Sliding-window counts: each event lands in windowLength/slide
    * overlapping windows (2 here) — the `window()` generator expands
    * rows BEFORE the aggregation shuffle, so the state/shuffle cost is
    * (expansion factor × tumbling), the standard overlap trade. */
  def slidingTypeCounts(events: DataFrame,
                        windowLength: String = "2 hours",
                        slide: String = "1 hour",
                        watermark: String = "3 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Native session windows: Spark's `session_window` merges a user's
    * events whose 30-minute windows overlap — the declarative sibling
    * of sessionizeStream (which carries explicit state for custom
    * close/flush logic). Runs identically in batch and streaming (with
    * a watermark the state store expires closed sessions). Boundary
    * semantics (verified in StreamingSpec): an exact-gap successor
    * MERGES — a new session opens only when delta > gap, matching the
    * batch Windows.sessionize cutover. One shuffle on (user_id, merged
    * window) via the dedicated SessionWindow operator. */
  def sessionWindowValues(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Gap-based sessionization with explicit state
    * (flatMapGroupsWithState): a session closes when >gap passes
    * between a user's consecutive events, or on EVENT-TIME timeout —
    * once the watermark passes last-event + gap, a quiet user's
    * trailing session is flushed and its state dropped. Without the
    * timeout, final sessions would never emit in Append mode and
    * per-user state would never expire. Event-time (not
    * processing-time) timeouts keep the operator deterministic and
    * data-driven: no wall-clock coupling, no empty trigger loops.
    *
    * The streaming analog of Windows.sessionize: the gap is compared
    * on SECOND-truncated timestamps exactly like the batch operator's
    * unix_timestamp arithmetic, so the two stay in lockstep on
    * sub-second data. */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Long = 1800L,
                       watermark: String = "2 hours"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def seconds(t: Timestamp): Long = t.getTime / 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Watermark passed the open session's gap horizon: close
            // and emit it, drop the state.
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.last, s.n, s.total))
          } else {
            // Events within one micro-batch arrive unordered — sort by
            // ts (bounded: one user's slice of a batch), then fold
            // through the session state, emitting each closed session.
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[SessionOut]
            var st = state.getOption.orNull
            sorted.foreach { e =>
              val v = Option(e.value).map(_.doubleValue).getOrElse(0.0)
              st = st match {
                case null => SessionState(e.ts, e.ts, 1L, v)
                case s if seconds(e.ts) - seconds(s.last) <= gapSeconds =>
                  SessionState(s.start, e.ts, s.n + 1, s.total + v)
                case s =>
                  closed += SessionOut(userId, s.start, s.last, s.n, s.total)
                  SessionState(e.ts, e.ts, 1L, v)
              }
            }
            if (st != null) {
              state.update(st)
              // must stay above the current watermark (late-arriving
              // groups could otherwise set an already-passed horizon)
              state.setTimeoutTimestamp(math.max(
                (seconds(st.last) + gapSeconds + 1) * 1000L,
                state.getCurrentWatermarkMs() + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-stream interval join: each purchase matched to the same
    * user's views from the preceding hour. Both sides carry watermarks
    * and the join condition bounds event-time distance, so the state
    * store holds only one hour (+watermark slack) of views per user —
    * the condition every unbounded stream-stream join must satisfy or
    * state grows with the stream. Batch-mode: the same plan is a plain
    * range join (the oracle path; watermarks no-op). */
  def purchaseViewJoin(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    purchases.join(views,
      col("user_id") === col("v_user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .select(col("user_id"), col("purchase_id"), col("view_id"))
  }

  /** Streaming exact dedup: drop events already seen within the
    * watermark horizon, keyed by content fingerprint — the streaming
    * face of the batch Dedup.exactSurvivors operator, and the standard
    * exactly-once guard in front of an append-only lake table. State is
    * one row per distinct key, expired by the watermark (without which
    * a 100 TB stream's dedup state grows unboundedly). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** File-based streaming source over the events table — the
    * production ingest topology (`readStream` on arriving files, here
    * with Trigger.AvailableNow draining everything then stopping). The
    * executor-side scan replaces the earlier collect-into-MemoryStream
    * gate plumbing, which pulled the whole fact table to the driver —
    * a scale-killer at 100 TB and unnecessary even for the gate.
    * Schema is declared (streaming file sources don't infer); nanos
    * epoch → microsecond timestamp exactly like Tables.events.
    *
    * The source path is the sf DIRECTORY (Spark's streaming file source
    * requires a directory to monitor — pointing it at the
    * `events.parquet` file fails with "Option 'basePath' must be a
    * directory"), narrowed to the events table by pathGlobFilter. */
  private def eventsReadStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Streaming file sources don't infer schemas, and the testdata's ts
    // physical type has varied across generations (nanos-as-long vs
    // micros-NTZ — see Tables.events). Declare the schema from one
    // batch footer read (a metadata-only operation) so the stream's
    // declared types always match the files, then apply the same
    // ts normalization as the batch loader.
    val batch = graft.Tables.load(s, dir, "events")
    // Two on-disk layouts exist: the driver testdata ships events as a
    // single FLAT FILE $dir/events.parquet (stream the parent dir,
    // narrowed by pathGlobFilter — a streaming source must be given a
    // directory), while standard Spark writers produce a DIRECTORY
    // named events.parquet of part files (stream that directory as-is;
    // pathGlobFilter matches leaf file names, so the flat-file filter
    // would exclude every part-*.parquet inside it).
    val eventsPath = java.nio.file.Paths.get(dir, "events.parquet")
    val reader = s.readStream.schema(batch.schema)
    val stream =
      if (java.nio.file.Files.isDirectory(eventsPath)) reader.parquet(eventsPath.toString)
      else reader
        .option("pathGlobFilter", "events.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(dir)
    stream.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case _ => stream
    }
  }

  /** Real-execution gate for [[dedupStream]]: run the watermarked
    * dropDuplicatesWithinWatermark plan over the file-stream source to
    * completion (Trigger.AvailableNow) against a memory sink, and
    * return the surviving keys. A single drain from the epoch-0
    * watermark drops nothing by lateness, so the streaming result is
    * exactly the batch DISTINCT over the key columns — which is what
    * the DuckDB oracle checks. */
  def dedupStreamGateKeys(s: SparkSession, dir: String): DataFrame =
    withGatePartitions(s) {
      val sink = s"dedup_gate_${System.nanoTime()}"
      val q = dedupStream(eventsReadStream(s, dir), Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      // A partial drain must fail loudly, not hand a truncated memory
      // sink to the correctness gate as if it were the full answer.
      try require(q.awaitTermination(120000L),
        s"stream gate $sink did not drain within 120 s") finally q.stop()
      // the query is stopped, so the memory sink table is now static
      s.table(sink)
    }

  /** Real-execution windowed TOP-K gate: hourly (window × type) counts
    * aggregated ON THE STREAM in Append mode with a 0-second
    * watermark, drained to completion (Trigger.AvailableNow), then
    * top-k ranked per window in a BATCH pass over the closed-window
    * sink — the "stream aggregates, batch serves" split (ranking
    * inside the stream would force Complete mode and unbounded state).
    *
    * Append-mode semantics the oracle replays exactly: a window emits
    * only once the final watermark (max event time − 0 s) passes its
    * END, so the trailing partial hour never appears — the DuckDB twin
    * filters `window_end <= max(ts)` for the same cut.
    *
    * Scale shape: streaming state = one count row per (open window ×
    * type), watermark-bounded; the serving rank runs on the
    * calendar-bounded closed-window table. */
  def windowedTopKGate(s: SparkSession, dir: String, k: Int = 3): DataFrame =
    withGatePartitions(s) {
      val sink = s"topk_gate_${System.nanoTime()}"
      val q = eventsReadStream(s, dir)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000L),
        s"stream gate $sink did not drain within 120 s") finally q.stop()
      s.table(sink)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("window_start"))
            .orderBy(col("n_events").desc, col("event_type"))).cast("long"))
        .filter(col("rk") <= k)
    }

  /** Output row of [[RunningProfileProcessor]]: per (user, type)
    * running event count and integer value checksum (cents — integer
    * sums are order-independent, so the gate hashes deterministically
    * where a double sum would not). */
  final case class KeyProfile(user_id: Long, event_type: String,
                              n_events: Long, value_cents: Long)

  /** Arbitrary-state streaming on the MODERN API: Spark 4's
    * `transformWithState` StatefulProcessor (the successor of
    * mapGroupsWithState, RocksDB-backed, TTL-capable per state var).
    * Keeps one ValueState per (user, type) and emits the updated
    * running profile each time the key sees input — the canonical
    * "maintain a per-entity profile over the firehose" shape. At
    * 100 TB the state distributes by key; TTLConfig bounds per-key
    * state lifetime where the domain allows forgetting. */
  final class RunningProfileProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Long, String), (Long, String, java.lang.Double), KeyProfile] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("profile",
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: (Long, String),
        rows: Iterator[(Long, String, java.lang.Double)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[KeyProfile] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      // events carry nulls (see Event scaladoc): a null value counts
      // the event but adds nothing — SQL SUM semantics, so the batch
      // oracle stays exact if a regeneration introduces null values
      rows.foreach { r =>
        n += 1
        if (r._3 != null) cents += math.floor(r._3.doubleValue * 100).toLong
      }
      state.update((n, cents))
      Iterator.single(KeyProfile(key._1, key._2, n, cents))
    }
  }

  /** Real-execution gate for [[RunningProfileProcessor]]: drain the
    * file stream through transformWithState (RocksDB state store — the
    * only provider the API supports) and reduce the Update-mode sink
    * to each key's FINAL state (n_events is monotone, so max_by is the
    * last update even if the drain split into several micro-batches).
    * One full drain ≡ the batch GROUP BY — the DuckDB oracle. */
  def statefulProfileGate(s: SparkSession, dir: String): DataFrame =
    withGatePartitions(s) {
      // provider is read at stream START; scope it so the other gates
      // keep the session default
      val pKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProvider = s.conf.getOption(pKey)
      s.conf.set(pKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try statefulProfileGateInner(s, dir)
      finally prevProvider match {
        case Some(v) => s.conf.set(pKey, v)
        case None => s.conf.unset(pKey)
      }
    }

  private def statefulProfileGateInner(s: SparkSession, dir: String): DataFrame = {
      import s.implicits._
      val sink = s"profile_gate_${System.nanoTime()}"
      val src = eventsReadStream(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
        .as[(Long, String, java.lang.Double)](
          org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.STRING,
            org.apache.spark.sql.Encoders.DOUBLE))
      val q = src.groupByKey(r => (r._1, r._2))
        .transformWithState(new RunningProfileProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[KeyProfile])
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000L),
        s"stream gate $sink did not drain within 120 s") finally q.stop()
      s.table(sink).groupBy(col("user_id"), col("event_type"))
        .agg(max(col("n_events")).as("n_events"),
          max_by(col("value_cents"), col("n_events")).as("value_cents"))
    }

  /** Gate-scoped shuffle-partition override. A stateful streaming op
    * instantiates ONE state store (with its own checkpoint dir,
    * maintenance thread, and commit files) per shuffle partition — for
    * a gate's single small micro-batch that is pure fixed overhead, so
    * the gates run with a handful of state partitions. Production
    * streams size this to the key cardinality instead; the number is
    * locked into the checkpoint at first start either way. Restores the
    * session conf afterwards (the conf is read at stream START, so
    * scoping it around start()..stop() is race-free for this session). */
  private def withGatePartitions[T](s: SparkSession, n: Int = 4)(body: => T): T =
    StreamGateConf.withStreamGateConfs(s, n)(body)

  /** Stream-static enrichment: a streaming event feed joined against a
    * static (batch) dimension table — the standard "enrich the firehose
    * with reference data" topology. The static side re-plans per
    * micro-batch (so dimension updates between batches are picked up)
    * and broadcasts, so the stream side never shuffles. */
  def enrichBySegment(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("value_c"))

  /** Real-execution gate for [[enrichBySegment]]: run the stream-static
    * join + aggregation over the file-stream source in Complete mode
    * (Trigger.AvailableNow) and return the final per-segment profile
    * (deterministic: one drain, integer value checksum). */
  def enrichStreamGate(s: SparkSession, dir: String): DataFrame =
    withGatePartitions(s) {
      val sink = s"enrich_gate_${System.nanoTime()}"
      val q = enrichBySegment(eventsReadStream(s, dir), graft.Tables.customer(s, dir))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Complete)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try require(q.awaitTermination(120000L),
        s"stream gate $sink did not drain within 120 s") finally q.stop()
      s.table(sink)
    }

  /** The pipeline's ingest stage as a real stream: micro-batch append
    * of raw price rows into the LakeCatalog via foreachBatch — the
    * Trigger.AvailableNow file-stream mapping of SURVEY §2.9. Each
    * micro-batch commits one snapshot, exactly like the hourly Airflow
    * tick — through [[graft.pipeline.LakeCatalog.appendExactlyOnce]],
    * so the at-least-once epoch delivery of foreachBatch lands each
    * batch as EXACTLY one snapshot: a replayed epoch whose batch id is
    * already in the snapshot log is a no-op, and a crash between the
    * commit-dir rename and the log line is healed by the retry (the
    * log line is the append's commit point). This is the r14 Next #6
    * closure: the streaming sink rides the same commit discipline as
    * every batch write surface. */
  def priceStreamToLake(prices: DataFrame, catalog: graft.pipeline.LakeCatalog,
                        checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    prices.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          catalog.appendExactlyOnce(graft.pipeline.Ingest.RawTable, batch,
            batchId, partitionTs = Some("extracted_at"))
        ()
      }
      .start()

  /** Streaming materialized-view maintenance: each micro-batch appends
    * to the base table AND folds the same rows into the registered
    * summary through [[graft.plans.MatView.refresh]] — the MV tracks
    * the stream at change-feed cost (batch-sized work per trigger,
    * never a base rescan), while downstream aggregates keep being
    * served by [[graft.plans.MatViewRewrite]] transparently. The
    * batch is persisted across its two actions (append + delta
    * summarize) so the source micro-batch is read once.
    *
    * Replay safety: foreachBatch delivers AT LEAST once, so the
    * epoch's batchId is committed to a marker file after the fold and
    * already-folded epochs are skipped on restart — a replayed
    * complete epoch is a no-op instead of a double append +
    * double fold. The residual window is a crash BETWEEN the base
    * append and the marker commit: that epoch replays
    * non-idempotently. Closing it needs a transactional base sink
    * (route the append through LakeCatalog/WAP and fold off its
    * change feed); this operator demonstrates the maintenance loop,
    * and the marker documents exactly where the transactional
    * boundary belongs. */
  def streamToMatView(rows: DataFrame, basePath: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(basePath, batch, batchId)
      }
      .start()

  /** The [[streamToMatView]] micro-batch body, exactly-once under
    * crash-replay at EVERY boundary (the r7-documented append-vs-
    * marker window, now closed). Each step is idempotent per batchId:
    *  - the base append promotes staged part files under DETERMINISTIC
    *    `graft-b<batchId>-*` names, deleting a crashed attempt's
    *    leftovers first — a replay overwrites instead of duplicating;
    *  - `MatView.refresh` carries the batchId as its tag; the tag is
    *    written inside the new summary version only after its parquet
    *    completes, so a replay whose tag already matches skips the
    *    fold (no double-apply), while a crash mid-fold left the
    *    version untagged/unregistered and is cleanly overwritten;
    *  - the `_graft_last_folded` marker is written last and only
    *    short-circuits fully-applied batches.
    * Structured Streaming replays the SAME source offsets for an
    * unacknowledged batch (checkpointed ranges), so replayed content
    * matches — the precondition for any foreachBatch idempotence. */
  private[graft] def foldBatch(basePath: String, batch: DataFrame,
      batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    val marker = Paths.get(basePath, "_graft_last_folded")
    val lastFolded =
      if (Files.exists(marker))
        new String(Files.readAllBytes(marker), "UTF-8").trim.toLong
      else -1L
    if (batchId > lastFolded && !batch.isEmpty) {
      batch.persist()
      try {
        appendIdempotent(basePath, batch, batchId)
        graft.plans.MatView.refresh(batch.sparkSession, basePath, batch,
          tag = Some(batchId.toString))
        Files.write(marker, batchId.toString.getBytes("UTF-8"))
        ()
      } finally { batch.unpersist(); () }
    }
  }

  /** Append `batch` to the base under deterministic per-batch file
    * names: stage (overwrite), purge any `graft-b<id>-*` files a
    * crashed attempt promoted, promote staged parts in sorted order,
    * drop the stage. Any replay converges to exactly one copy. */
  private[graft] def appendIdempotent(basePath: String, batch: DataFrame,
      batchId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val stage = Paths.get(basePath, s".graft_stage_$batchId")
    batch.write.mode("overwrite").parquet(stage.toString)
    val root = Paths.get(basePath)
    val prefix = s"graft-b$batchId-"
    val leftovers = Files.list(root)
    try leftovers.iterator().asScala
      .filter(_.getFileName.toString.startsWith(prefix)).toList
      .foreach(Files.delete(_))
    finally leftovers.close()
    val staged = Files.list(stage)
    val parts = try staged.iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toList
      .sortBy(_.getFileName.toString)
    finally staged.close()
    parts.zipWithIndex.foreach { case (f, i) =>
      Files.move(f, root.resolve(f"$prefix$i%05d.parquet")); ()
    }
    val rm = Files.walk(stage).sorted(
      java.util.Comparator.reverseOrder[java.nio.file.Path]())
    try rm.forEach(p => { Files.delete(p); () }) finally rm.close()
  }
}
