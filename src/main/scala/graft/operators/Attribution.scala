package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Multi-touch marketing attribution over event streams — the four
  * standard position rules (first-touch, last-touch, linear,
  * position-based 40/20/40) computed in ONE pass and reported per
  * channel.
  *
  * Journey model: per user, events are ordered by (ts, event_id) —
  * the unique tie-break that keeps both engines' sequences identical.
  * Every `purchase` event is a conversion; the touches attributed to
  * it are the non-purchase events since the user's PREVIOUS purchase
  * (journey_id = count of prior purchases). Touches after the last
  * purchase never convert and carry no credit — dropped, and reported
  * in the companion coverage row of the gate output via n_touches.
  *
  * Credit rules per converted journey with n touches:
  *  - first/last: 1.0 to the first/last-ordered touch;
  *  - linear: 1/n each;
  *  - position-based: n = 1 → 1.0; n = 2 → 0.5 + 0.5;
  *    n ≥ 3 → 0.4 first, 0.4 last, 0.2/(n−2) each middle.
  *
  * Scale shape: one events scan → user-keyed windows (sequence rank +
  * prior-purchase count — ONE shuffle by user_id, both windows share
  * the partitioning) → journey-grain aggregate → channel-grain
  * aggregate (channel NDV is tiny). No self-joins, no per-journey
  * explode; at 100 TB the cost is the user-keyed sort, which the
  * sessionization family already pays and AQE coalesces. */
object Attribution {

  /** Per-channel credit under the four rules + touch volume. */
  def channelCredits(s: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wPrior = wSeq.rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("is_conv", (col("event_type") === "purchase").cast("int"))
      .withColumn("journey_id",
        coalesce(sum(col("is_conv")).over(wPrior), lit(0)))
    // journeys that actually convert: journey_id < total purchases
    val convJourneys = ev.filter(col("is_conv") === 1)
      .select(col("user_id"), col("journey_id"))
    val touches = ev.filter(col("is_conv") === 0)
      .join(convJourneys, Seq("user_id", "journey_id"))
    // rank within journey (touch order), journey size
    val wj = Window.partitionBy(col("user_id"), col("journey_id"))
      .orderBy(col("ts"), col("event_id"))
    val wjAll = Window.partitionBy(col("user_id"), col("journey_id"))
    val credited = touches
      .withColumn("pos", row_number().over(wj))
      .withColumn("n", count(lit(1)).over(wjAll))
      .withColumn("ft", when(col("pos") === 1, 1.0).otherwise(0.0))
      .withColumn("lt", when(col("pos") === col("n"), 1.0).otherwise(0.0))
      .withColumn("lin", lit(1.0) / col("n"))
      .withColumn("pb",
        when(col("n") === 1, 1.0)
          .when(col("pos") === 1 || col("pos") === col("n"),
            when(col("n") === 2, 0.5).otherwise(0.4))
          .otherwise(lit(0.2) / (col("n") - lit(2))))
    credited.groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        round4eps(sum(col("ft"))).as("first_touch"),
        round4eps(sum(col("lt"))).as("last_touch"),
        round4eps(sum(col("lin"))).as("linear"),
        round4eps(sum(col("pb"))).as("position_based"))
      .orderBy(col("channel"))
  }

  /** Attribution sanity frame: each rule must conserve total credit —
    * per rule, the summed credit equals the number of CONVERTED
    * journeys with ≥ 1 touch. One scalar row (the gate asserts the
    * conservation identity cross-engine). */
  def creditConservation(s: SparkSession, dir: String): DataFrame = {
    val per = channelCredits(s, dir)
    per.agg(
      round4eps(sum(col("first_touch"))).as("ft_total"),
      round4eps(sum(col("last_touch"))).as("lt_total"),
      round4eps(sum(col("linear"))).as("lin_total"),
      round4eps(sum(col("position_based"))).as("pb_total"),
      sum(col("n_touches")).as("n_touches"))
  }
}
