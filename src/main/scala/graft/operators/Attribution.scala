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

  /** Channel bit positions for the Shapley subset lattice, in fixed
    * alphabetical order (the non-purchase event types). */
  val ShapleyChannels = Seq("click", "error", "signup", "view")

  /** EXACT Shapley-value attribution over the 4-channel touch-set
    * lattice — the game-theoretic rule the position heuristics above
    * approximate. Characteristic function v(S) = number of CONVERTED
    * journeys whose touch-set ⊆ S (monotone, v(∅) = 0 since every
    * journey here has ≥ 1 touch); φ_i = Σ_{S ∌ i} |S|!(n−1−|S|)!/n! ·
    * (v(S ∪ i) − v(S)) over all 2⁴ subsets, so Σφ_i = v(U) = total
    * converted journeys with touches — the conservation identity the
    * spec pins.
    *
    * Scale shape: the fact-linear part is the same journey windows as
    * [[channelCredits]]; everything after collapses to ≤ 2⁴ touch-set
    * masks × 2⁴ subsets — constant-size regardless of corpus. This is
    * why EXACT Shapley is tractable here: the lattice is over channel
    * COUNT (tiny and fixed), never over journeys. */
  def shapleyAttribution(s: SparkSession, dir: String): DataFrame = {
    val n = ShapleyChannels.length
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wPrior = wSeq.rowsBetween(Window.unboundedPreceding, -1)
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("is_conv", (col("event_type") === "purchase").cast("int"))
      .withColumn("journey_id",
        coalesce(sum(col("is_conv")).over(wPrior), lit(0)))
    // per-journey touch-set bitmask (bit i = channel i present)
    val maskExpr = ShapleyChannels.zipWithIndex.map { case (c, i) =>
      max((col("event_type") === c).cast("int")).cast("long") * lit(1L << i)
    }.reduce(_ + _)
    val jm = ev.filter(col("is_conv") === 0)
      .groupBy(col("user_id"), col("journey_id"))
      .agg(maskExpr.as("jmask"))
    val convKeys = ev.filter(col("is_conv") === 1)
      .select(col("user_id"), col("journey_id")).withColumn("conv", lit(1L))
    val sets = jm.join(convKeys, Seq("user_id", "journey_id"), "left")
      .groupBy(col("jmask"))
      .agg(sum(coalesce(col("conv"), lit(0L))).as("n_conv"))
    // v(S) over all 2^n subsets: jmask ⊆ S  ⇔  (jmask & S) == jmask
    val subsets = s.range(0, 1L << n).select(col("id").as("mask"))
    val v = subsets.crossJoin(sets)
      .filter((col("jmask").bitwiseAND(col("mask"))) === col("jmask"))
      .groupBy(col("mask")).agg(sum(col("n_conv")).as("v"))
    val vAll = subsets.join(v, Seq("mask"), "left")
      .select(col("mask"), coalesce(col("v"), lit(0L)).as("v"))
    // φ_i: subsets without i, weighted marginal contributions.
    // weights for n=4 by |S|: 0→6/24, 1→2/24, 2→2/24, 3→6/24
    val channels = {
      import s.implicits._
      ShapleyChannels.zipWithIndex
        .map { case (c, i) => (c, 1L << i) }
        .toDF("channel", "bit")
    }
    val weight = when(bit_count(col("mask")) === 0, lit(6.0) / 24.0)
      .when(bit_count(col("mask")) === 1, lit(2.0) / 24.0)
      .when(bit_count(col("mask")) === 2, lit(2.0) / 24.0)
      .otherwise(lit(6.0) / 24.0)
    val contrib = channels.crossJoin(vAll)
      .filter((col("mask").bitwiseAND(col("bit"))) === 0)
      .join(vAll.select(col("mask").as("mask_i"), col("v").as("v_i")),
        col("mask_i") === (col("mask").bitwiseOR(col("bit"))))
      .select(col("channel"),
        (weight * (col("v_i") - col("v")).cast("double")).as("c"))
    val phi = contrib.groupBy(col("channel"))
      .agg(sum(col("c")).as("phi_raw"))
    val tot = phi.agg(sum(col("phi_raw")).as("phi_sum"))
    phi.crossJoin(broadcast(tot))
      .select(col("channel"), round4eps(col("phi_raw")).as("phi"),
        round4eps(col("phi_raw") / col("phi_sum")).as("share"))
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
