package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Temporal join operators Spark lacks natively — as-of join and
  * bounded range join — composed from built-in operators so Catalyst
  * keeps full visibility (pushdown, AQE) into the plan.
  *
  * Scale posture:
  *  - asOfJoin is the union+running-last formulation: ONE shuffle on
  *    the join key and a per-key sort, versus the naive
  *    join-then-filter-then-argmax which materializes every
  *    (left, right-before) pair (quadratic per key). This is how
  *    point-in-time correctness joins (feature stores, trade/quote)
  *    scale: cost is O(|L|+|R|) rows through one exchange.
  *  - rangeJoin buckets the time axis at the range width so each left
  *    row probes exactly 2 buckets: an equi-join on (key, bucket)
  *    carries the pruning a naive theta-join would leave to a
  *    post-cross filter. Output-proportional, never cross-product.
  */
object TemporalJoins {

  /** Generic as-of join: for each left row, the latest right row with
    * rTime <= lTime (inclusive), matched within `keys`. Right columns
    * come back null when no prior right row exists (LEFT OUTER as-of).
    *
    * `rightCols` are the right-side payload columns to carry; both
    * inputs must share the `keys` column names; `lTime`/`rTime` name
    * each side's event-time column.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               lTime: String, rTime: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == lTime).toSeq
    // Union schema: keys, t, side (1=left/probe, 0=right/build),
    // left payload (null on right rows), right payload carried as ONE
    // struct (null on left rows). A single running-last over the
    // struct keeps the matched row's columns together — per-column
    // last(ignoreNulls) would backfill a null payload VALUE from an
    // older right row, tearing columns from different rows.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c).copy(name = c)))
    val lNorm = left.select(
      keys.map(col) ++ Seq(col(lTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(rStructType).as("_r")) ++ leftCols.map(col): _*)
    val rNorm = right.select(
      keys.map(col) ++ Seq(col(rTime).as("_t"), lit(0).as("_side"),
        struct(rightCols.map(col): _*).as("_r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // Right rows sort before left rows at equal time => inclusive <=.
    // `_r` (the right payload struct, lexicographically ordered) breaks
    // ties among right rows sharing a key and timestamp, so the matched
    // row is deterministic across runs and partitionings: the struct
    // leads with the caller's first rightCol — an id column in every
    // call site — making "greatest id wins" the documented tie rule.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lNorm.unionByName(rNorm)
      .select((keys.map(col) ++ Seq(col("_t"), col("_side")) ++ leftCols.map(col) :+
        last(col("_r"), ignoreNulls = true).over(w).as("_r")): _*)
    joined.filter(col("_side") === 1)
      .select(keys.map(col) ++ leftCols.map(col) ++ Seq(col("_t").as(lTime)) ++
        rightCols.map(c => col("_r")(c).as(s"asof_$c")): _*)
  }

  /** Bounded range join: all (left, right) pairs within `keys` with
    * rTime in [lTime - rangeSeconds, lTime]. Implemented as an
    * equi-join on (key, time-bucket) with bucket width = range, so each
    * left row probes exactly its own and the previous bucket, then the
    * exact range predicate filters within the bucket-matched pairs. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                lTime: String, rTime: String, rangeSeconds: Long): DataFrame = {
    val widthMicros = rangeSeconds * 1000000L
    def bucket(t: Column): Column = floor(unix_micros(t) / widthMicros)
    // Normalize time columns before the join so the range predicate is
    // unambiguous even when both inputs name their time column the
    // same (e.g. events⋈events on "ts"). If the names collide, the
    // right side's comes back suffixed `_r`.
    val l = left.withColumnRenamed(lTime, "_lt").withColumn("_bucket",
      explode(array(bucket(col("_lt")), bucket(col("_lt")) - 1)))
    val r = right.withColumnRenamed(rTime, "_rt").withColumn("_bucket", bucket(col("_rt")))
    val rTimeOut = if (rTime == lTime) rTime + "_r" else rTime
    l.join(r, keys :+ "_bucket")
      .filter(col("_rt") >= col("_lt") - expr(s"INTERVAL $rangeSeconds SECONDS") &&
        col("_rt") <= col("_lt"))
      .drop("_bucket")
      .withColumnRenamed("_lt", lTime)
      .withColumnRenamed("_rt", rTimeOut)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row
    * with rTime >= lTime (inclusive) within `keys` — the "next
    * observation" direction (e.g. first fill after an order). Reduced
    * to the backward kernel by negating event time to epoch micros:
    * latest(-t_r <= -t_l) == earliest(t_r >= t_l), so it inherits the
    * same one-shuffle union + running-last plan and tie rule. */
  def asOfJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lTime: String, rTime: String,
                      rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_negt", -unix_micros(col(lTime)))
    val r = right.withColumn("_negt_r", -unix_micros(col(rTime)))
    asOfJoin(l, r, keys, "_negt", "_negt_r", rightCols).drop("_negt")
  }

  /** As-of query over events: each purchase matched to the user's most
    * recent view at-or-before the purchase time. */
  def lastViewBeforePurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event_id"),
        col("value").as("view_value"), col("ts"))
    asOfJoin(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("view_event_id", "view_value"))
      .select(col("event_id"), col("user_id"),
        col("asof_view_event_id").as("view_event_id"),
        round(col("asof_view_value"), 4).as("view_value"))
  }

  /** [[lastViewBeforePurchase]] through the CUSTOM physical as-of
    * operator ([[graft.plans.AsOfJoin]]) instead of the
    * union+running-last composition — the same semantics (and the same
    * DuckDB ASOF JOIN oracle), executed as one forward-only merge over
    * co-partitioned sorted children with a single buffered row of
    * state. The gate proves the custom operator end-to-end; the
    * tie-break column makes equal-timestamp matches deterministic
    * (greatest view_event_id, the composition's documented rule). */
  def lastViewBeforePurchaseCustom(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_event_id"),
        col("value").as("view_value"), col("ts").as("v_ts"))
    graft.plans.AsOfJoin(purchases, views,
        Seq("user_id"), Seq("v_user_id"), "ts", "v_ts", Seq("view_event_id"))
      .select(col("event_id"), col("user_id"), col("view_event_id"),
        round(col("view_value"), 4).as("view_value"))
  }

  /** Forward as-of query: each purchase matched to the user's FIRST
    * view at-or-after the purchase time (follow-up behavior). */
  def firstViewAfterPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_event_id"),
        col("value").as("view_value"), col("ts"))
    asOfJoinForward(purchases, views, Seq("user_id"), "ts", "ts",
        Seq("view_event_id", "view_value"))
      .select(col("event_id"), col("user_id"),
        col("asof_view_event_id").as("view_event_id"),
        round(col("asof_view_value"), 4).as("view_value"))
  }

  /** Range query over events: (purchase, error) pairs of the same user
    * where the error occurred within the hour before the purchase. */
  def errorsBeforePurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("e_ts"))
    rangeJoin(purchases, errors, Seq("user_id"), "p_ts", "e_ts", 3600L)
      .select(col("user_id"), col("purchase_id"), col("error_id"))
  }

  /** Interval-overlap self join: pairs of a customer's orders whose
    * processing windows [orderdate, orderdate + 3 + key%7 days]
    * overlap — the interval-join shape (booking conflicts, concurrent
    * sessions, overlapping campaigns) reduced to Spark primitives.
    * Reports pair counts and mean overlap length per region.
    *
    * Scale shape: the self join is EQUI-keyed on the customer — the
    * quadratic is per-key and bounded by orders-per-customer (~10 at
    * any TPC-H scale), never N². The overlap predicate is a residual
    * filter on the keyed join, and the rollup re-aggregates the
    * region-bounded frame. An unkeyed interval join would instead
    * bucket intervals to a calendar grain and equi-join on the
    * bucket — the same discipline, one level down. */
  def intervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
      col("o_orderdate").cast("date").as("st"),
      date_add(col("o_orderdate").cast("date"),
        (lit(3) + col("o_orderkey") % 7).cast("int")).as("en"))
    val b = o.select(col("ck").as("ck2"), col("ok").as("ok2"),
      col("st").as("st2"), col("en").as("en2"))
    val pairs = o.join(b, col("ck") === col("ck2") &&
        col("ok") < col("ok2") &&
        col("st") <= col("en2") && col("st2") <= col("en"))
      .select(col("ck"),
        (datediff(least(col("en"), col("en2")),
          greatest(col("st"), col("st2"))) + 1).as("overlap_days"))
    pairs
      .join(Tables.customer(s, dir), col("ck") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("n_pairs"),
        round4eps(avg(col("overlap_days"))).as("avg_overlap_days"),
        max(col("overlap_days")).cast("long").as("max_overlap_days"))
      .orderBy(col("region"))
  }

  /** Bitemporal monthly-revenue report: VALID time = the order month
    * a line belongs to, TRANSACTION (knowledge) time = the ship date
    * the line is recorded on. For each valid month × two knowledge
    * snapshots (the calendar midpoint and the final date): the
    * revenue as it was KNOWN at that snapshot and its share of the
    * final number — "what did March look like in June vs today", the
    * restatement view a finance mart must answer without rewriting
    * history (the query-side complement of the lake's snapshot time
    * travel, which versions FILES; this versions FACTS).
    *
    * Scale shape: one conditional-sum aggregation keyed by valid
    * month (calendar-bounded cells), the two snapshots as a ×2
    * explode of constants; cents-exact sums. */
  def bitemporalReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .select(trunc(col("o_orderdate"), "month").as("valid_month"),
        to_date(col("l_shipdate")).as("known_on"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val snaps = li.agg(
      date_add(min(col("known_on")),
        (datediff(max(col("known_on")), min(col("known_on"))) / 2)
          .cast("int")).as("mid"),
      max(col("known_on")).as("fin"))
    li.crossJoin(broadcast(snaps))
      .withColumn("known_at", explode(array(col("mid"), col("fin"))))
      .groupBy(col("valid_month"), col("known_at"))
      .agg(
        sum(when(col("known_on") <= col("known_at"), col("cents"))
          .otherwise(0L)).as("known_cents"),
        sum(col("cents")).as("final_cents"),
        sum(when(col("known_on") <= col("known_at"), 1L).otherwise(0L))
          .as("n_lines_known"))
      .select(col("valid_month"), col("known_at"),
        col("n_lines_known"), col("known_cents"),
        round4eps(col("known_cents").cast("double") /
          col("final_cents")).as("share_of_final"))
      .orderBy(col("valid_month"), col("known_at"))
  }
}
