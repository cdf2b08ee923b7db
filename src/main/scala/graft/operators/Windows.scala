package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Window-function surface. The reference computes no windows — its one
  * windowed-analytic semantic (24h price change) is outsourced to the
  * upstream API (SURVEY §2.7, extract_bitcoin_prices.py:63,88). A native
  * engine computes it itself: `lag` over (partition by source, order by
  * ts). Mapped here onto events(user_id, ts, value).
  *
  * Scale posture: every window partitions by a key (user_id) — one
  * shuffle on that key, then per-partition sort. No global windows
  * (a window with no partitionBy pulls 100 TB onto one task — banned).
  * Ordering always includes event_id as a unique tie-break so results
  * are deterministic under any physical row order.
  */
object Windows {

  private def byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** The reference's outsourced "change since previous observation"
    * (change_24h_pct analog) computed natively with lag. */
  def valueChange(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(byUser))
      .select(col("event_id"), col("user_id"),
        round(col("value") - coalesce(col("prev_value"), col("value")), 4).as("value_change"))

  /** Per-user running total — cumulative window frame. */
  def runningTotal(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("running_value",
        sum(col("value")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), round(col("running_value"), 4).as("running_value"))

  /** Top-1-per-group via row_number: each user's highest-value event.
    * Deterministic tie-break (value desc, then event_id). */
  def topEventPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
  }

  /** Gap-based sessionization: a new session starts when >30 min passes
    * between a user's consecutive events. Two windows over one shuffle
    * (same partitioning+ordering reused by Catalyst). Output: one row
    * per session with bounds and size. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val gapSeconds = 1800L
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(col("prev_ts").isNull ||
      unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1).otherwise(0)
    ev.withColumn("prev_ts", prevTs)
      .withColumn("is_new", newSession)
      .withColumn("session_seq",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("session_value"))
  }

  /** The remaining analytic-function family in one query: lead,
    * dense_rank, ntile, percent_rank, cume_dist, first_value and
    * nth_value — all over the SAME (user_id) partitioning, so Catalyst
    * plans ONE shuffle+sort and evaluates the rank-based functions in a
    * single Window operator. Orderings are total (event_id tie-break;
    * value orders put NULLS FIRST to match across engines), frames are
    * explicit ROWS so no engine-default ambiguity exists. */
  def windowSuite(s: SparkSession, dir: String): DataFrame = {
    val byValue = Window.partitionBy(col("user_id"))
      .orderBy(col("value").asc_nulls_first, col("event_id"))
    val cumFrame = byUser.rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir).select(
      col("user_id"),
      col("event_id"),
      round(lead(col("value"), 1).over(byUser), 4).as("next_value"),
      dense_rank().over(Window.partitionBy(col("user_id"))
        .orderBy(col("event_type"))).as("type_rank"),
      ntile(4).over(byUser).as("quartile"),
      round4eps(percent_rank().over(byValue)).as("value_prank"),
      round4eps(cume_dist().over(byValue)).as("value_cdist"),
      round(first_value(col("value")).over(cumFrame), 4).as("first_val"),
      round(nth_value(col("value"), 2).over(cumFrame), 4).as("second_val"))
  }

  /** Time-RANGE frame: each event's trailing-hour sum/count per user —
    * the frame is bounded by the ORDER-BY VALUE (epoch seconds), not row
    * position, so simultaneous events are frame peers regardless of row
    * order. The sliding-window analytic that doesn't need a self-join. */
  def trailingHour(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-3600L, 0L)
    Tables.events(s, dir)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 4).as("hour_value"),
        count(lit(1)).over(w).as("hour_events"))
  }

  /** Forward fill (LOCF — last observation carried forward): each null
    * value takes the most recent non-null value in its user's event
    * order; leading nulls stay null. `last(ignoreNulls)` over a
    * running frame — the canonical gap-filling operator for sparse
    * sensor/metric streams, one shuffle on the partition key. */
  def forwardFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        round(col("value"), 4).as("value"),
        round(last(col("value"), ignoreNulls = true).over(w), 4).as("value_filled"))
  }

  /** SCD Type-2 dimension build: collapse each user's event stream into
    * versioned (event_type, valid_from, valid_to] intervals — keep only
    * rows where the tracked attribute changed (lag-compare), then close
    * each version with the next change's timestamp (lead). The open
    * version (valid_to NULL) is current. This is the standard
    * warehouse dimension-history operator the reference's full-refresh
    * CTAS mart cannot express. Two window passes over ONE shuffle on
    * user_id (same partitioning and ordering, so Spark plans a single
    * exchange + sort); event_id tie-breaks equal timestamps. */
  def scd2UserTypes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("version"),
        unix_timestamp(col("ts")).as("valid_from_s"),
        unix_timestamp(col("valid_to_ts")).as("valid_to_s"),
        col("valid_to_ts").isNull.as("is_current"))
  }

  /** Per-user exponentially-weighted moving average of event values —
    * the standard smoothing/trend statistic for telemetry streams
    * (acc' = (1-α)·acc + α·v over the ts-ordered history, seeded with
    * the first value). Computed as a codegen'd higher-order
    * `aggregate` fold over the user's sorted value array — no UDF, no
    * driver loop; the fold is a strict left fold so the IEEE
    * accumulation order is fully determined and oracle-replayable.
    *
    * Scale posture: one shuffle keyed by user_id (the collect_list
    * aggregate), then per-user map work. A user's history must fit in
    * a task — true for behavioral data (thousands of events/user), and
    * enforced here by folding only the trailing `cap` events: with
    * α=0.1 the weight of anything past 512 steps is < 10⁻²³, so the
    * cap changes nothing numerically while bounding task memory
    * against pathological power users. (A genuinely unbounded stream
    * would move this to the streaming surface — mapGroupsWithState
    * carries the same recurrence with O(1) state.) */
  def ewmaSmoothed(s: SparkSession, dir: String,
      alpha: Double = 0.1, cap: Int = 512): DataFrame = {
    val q = lit(1.0 - alpha)
    val a = lit(alpha)
    // valued events only, explicitly: collect_list drops nulls anyway,
    // but the filter pins the semantics (a user with no valued events
    // has no smoothed series) and pushes to the scan
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("hist"))
      .select(col("user_id"), size(col("hist")).cast("long").as("n_events"),
        transform(col("hist"), x => x.getField("value")).as("vals"))
      .withColumn("capped",
        slice(col("vals"), greatest(lit(1), size(col("vals")) - (cap - 1)),
          lit(cap)))
      .select(col("user_id"), col("n_events"),
        round4eps(aggregate(
          slice(col("capped"), 2, cap),
          element_at(col("capped"), 1),
          (acc, x) => q * acc + a * x)).as("ewma"))
  }

  /** Daily ranking: rank event types by volume within each day —
    * dense_rank over an aggregated (already small) input. */
  def dailyTypeRank(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_date"))
      .orderBy(col("n").desc, col("event_type"))
    daily.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("event_date"), col("event_type"), col("n"), col("rank"))
  }

  /** Daily time-weighted average (TWAP) of the event value per type —
    * the irregular-sampling mean finance and metering get wrong with a
    * plain AVG (a value that held for 10 hours must weigh 600× one
    * that held a minute): each sample's value holds until the next
    * sample of the same (type, day) — last-observation-carried-forward
    * — and the day's average integrates that step function, censored
    * at midnight. Weights are INTEGER seconds (lead arithmetic, ties
    * weigh 0 under the (ts, event_id) order), so engines agree bit-for
    * -bit up to the one final division. All windows keyed by
    * (event_type, day) — corpus distributes on the natural grain, no
    * global ordering. */
  def twapDaily(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val ev = graft.Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("ts"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("event_type"), col("d"))
      .orderBy(col("ts"), col("event_id"))
    ev.withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("wsec",
        when(col("next_ts").isNull,
          unix_timestamp(date_add(col("d"), 1).cast("timestamp")) -
            unix_timestamp(col("ts")))
          .otherwise(unix_timestamp(col("next_ts")) - unix_timestamp(col("ts"))))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("wsec")).as("covered_sec"),
        round4eps(sum(col("value") * col("wsec")) / sum(col("wsec")))
          .as("twap"),
        round4eps(avg(col("value"))).as("naive_avg"))
      .orderBy(col("event_type"), col("d"))
  }
}
