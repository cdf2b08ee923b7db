package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Join surface. The reference implements zero joins (SURVEY §2.6 — its
  * mart is a single-table aggregate), but the 100 TB north-star workload
  * is star-schema enrichment, so joins are first-class here.
  *
  * Scale posture:
  *  - dimension tables (region 5 rows, nation 25, supplier, part) are
  *    explicitly broadcast — no shuffle of the fact side for those joins;
  *  - fact⋈fact (lineitem⋈orders) is a shuffled hash join on the key
  *    both sides are naturally keyed by; AQE handles skew at runtime;
  *  - semi/anti joins never materialize the probe payload.
  */
object Joins {

  /** Star-schema revenue rollup: fact lineitem enriched through
    * supplier→nation→region, all dims broadcast. One shuffle total
    * (the final groupBy), zero shuffles for the joins. */
  def starRevenue(s: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val reg = Tables.region(s, dir)
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Fact⋈fact: lineitem⋈orders⋈customer, revenue per market segment by
    * order year. lineitem⋈orders shuffles on the shared orderkey;
    * customer is broadcast-joined onto the aggregated side. */
  def segmentRevenue(s: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cus = Tables.customer(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"),
               year(col("o_orderdate")).as("order_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  /** Top-k join+agg: top 10 customers by total order value.
    * Aggregate BEFORE the dimension join (shrinks the join input from
    * |orders| to |customers|), then TakeOrderedAndProject for the top-k. */
  def topCustomers(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val cus = Tables.customer(s, dir)
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
           count(lit(1)).as("n_orders"))
    perCust.join(broadcast(cus), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  /** Left-semi: customers that placed at least one order. The probe side
    * (orders) contributes only existence — no payload shuffle. */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Left-anti: customers with no orders before 1996 (NOT EXISTS over
    * a date-filtered probe — the filter pushes into the orders scan). */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val ord95 = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    Tables.customer(s, dir)
      .join(ord95, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Multi-way: order priority vs line count, exercising join + grouped
    * count with a selective date filter pushed to the orders scan. */
  def priorityLineCounts(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           countDistinct(col("o_orderkey")).as("n_orders"))
  }

  /** Salted join — the manual skew-join pattern for when ONE build-side
    * key holds a pathological share of the probe rows and the build
    * side is too big to broadcast: the probe side gets a random salt in
    * [0, salts), the build side is replicated once per salt value, and
    * the join key becomes (key, salt) — the hot key's probe rows spread
    * over `salts` reducers instead of one straggler task. Identical
    * output to the plain join (each probe row matches exactly its
    * original row in exactly one replica). AQE's skew-join split is the
    * automatic variant; this is the explicit form for engines/configs
    * without it, exercised here as events⋈per-user-dimension. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    require(salts > 0, s"saltedJoin needs salts > 0, got $salts")
    // Internal column: a caller-owned column of the same name would be
    // silently overwritten (withColumn replaces) and then dropped —
    // changing the output schema/rows versus the plain join.
    val saltCol = "__graft_salt"
    require(!probe.columns.contains(saltCol) && !build.columns.contains(saltCol),
      s"saltedJoin inputs must not carry a $saltCol column")
    val salted = probe.withColumn(saltCol,
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = build.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Salted-join demonstration query: per-event user enrichment where
    * user_id is the (potentially skewed) key. Output equals the plain
    * broadcast/shuffle join — asserted in the spec. */
  def saltedUserTotals(s: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val ev = Tables.events(s, dir)
    val userDim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events"))
    saltedJoin(ev, userDim, "user_id", salts)
      .groupBy(col("event_type"))
      .agg(sum(col("user_events")).as("weight"), count(lit(1)).as("n"))
  }

  /** Bloom-filtered semi-join — the runtime-filter pattern for a
    * fact⋈selective-dimension join where the dimension key set is too
    * big to broadcast as rows but tiny as a sketch: build a Bloom
    * filter over the build-side keys (one partial-mergeable aggregate,
    * ~1 MB for 10^6 keys at 1% fpp), probe it in the fact scan (a
    * codegen'd scalar, false positives only), then run the exact semi
    * join over the ~99% smaller survivor set. This is what Spark's own
    * InjectRuntimeFilter does for shuffle joins; the explicit form
    * works on engines/configs without it and composes with any
    * downstream operator. Output is EXACTLY the plain semi join (the
    * bloom only pre-filters; the semi join removes false positives). */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedKeys: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    // torrent-broadcast the bitmap: tasks carry a stub, executors
    // fetch the ~1 MB filter once (embedding it in the expression
    // shipped it in EVERY task binary — the r11 bench-tail warning)
    val bloomBc = probe.sparkSession.sparkContext.broadcast(bloom)
    val pre = probe.filter(org.apache.spark.sql.GraftSql.column(
      graft.functions.BloomMightContain(
        org.apache.spark.sql.GraftSql.expression(col(probeKey)), bloomBc)))
    // alias the build key to an internal name so probeKey == buildKey
    // (the common fact⋈dimension call) doesn't make the join condition
    // ambiguous between the two sides
    val buildAlias = "__graft_bloom_key"
    require(!probe.columns.contains(buildAlias),
      s"bloomSemiJoin probe must not carry a $buildAlias column")
    pre.join(build.select(col(buildKey).as(buildAlias)),
      col(probeKey) === col(buildAlias), "left_semi")
  }

  /** Bloom semi-join demonstration query: lineitem rows belonging to
    * high-value orders. Equals the plain EXISTS semi join (the oracle). */
  def bloomHighValueLines(s: SparkSession, dir: String,
                          minTotal: Double = 300000.0): DataFrame = {
    val hot = Tables.orders(s, dir)
      .filter(col("o_totalprice") > minTotal)
      .select(col("o_orderkey"))
    bloomSemiJoin(Tables.lineitem(s, dir), hot, "l_orderkey", "o_orderkey")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"))
  }

  /** Promo revenue share (TPC-H Q14 shape): lineitem⋈part with part
    * broadcast, a month filter pushed to the fact scan, and a
    * conditional aggregate — the classic "percentage of revenue from a
    * part class" rollup exercising the `part` dimension. */
  def promoRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val pt = Tables.part(s, dir)
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100.0) *
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0))) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("promo_pct"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q6 shape — forecasting revenue change: the purest
    * pushdown showcase. One scan, three range predicates, one global
    * sum — every filter must reach the parquet reader (PushedFilters)
    * and the aggregate is a single map-side-combined fold; at 100 TB
    * this query's cost is IO alone, and any plan that shuffles row
    * data for it is wrong. */
  def forecastRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
        .as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q7 shape — volume shipping between two trading nations,
    * both directions, by ship year: the two-fact join co-partitions
    * on orderkey once; supplier/customer/nation all broadcast, and
    * the nation-pair filter applies at the (broadcast) dimension join
    * so the fact stream is filtered before the rollup. */
  def volumeShipping(s: SparkSession, dir: String,
      nationA: String = "NATION_1", nationB: String = "NATION_2"): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape — national market share: of all PROMO-part revenue
    * sold into one region, what fraction was supplied by one nation,
    * per order year. The share is a conditional-over-total aggregate
    * in ONE pass (no self-join of the filtered stream); part/supplier/
    * customer/nation/region broadcast; the region restriction applies
    * through the customer side exactly as in the spec query. */
  def marketShare(s: SparkSession, dir: String, region: String = "ASIA",
      nation: String = "NATION_2", ptype: String = "PROMO"): DataFrame = {
    val custRegion = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === ptype)),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === nation,
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape (adapted) — product-line profit by supplier nation
    * and order year for a part-name class. The testdata carries no
    * partsupp table, so the spec's supplycost term is absent and
    * profit reduces to discounted revenue — the JOIN SHAPE (two facts
    * on orderkey + three broadcast dimensions + LIKE-filtered part) is
    * the point; the missing term is one more broadcast column in a
    * warehouse that has it. */
  def productProfit(s: SparkSession, dir: String,
      nameFragment: String = "red"): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .filter(col("p_name").contains(nameFragment))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q15 shape — top supplier(s) by revenue over a quarter: the
    * view-then-max-then-equal pattern. The per-supplier rollup is one
    * shuffle; the scalar max broadcasts back (no window over the
    * rollup needed); ties all surface, suppkey-ordered, exactly like
    * the spec's correlated max. Revenue equality is computed within
    * ONE engine's aggregate output, so float determinism is safe. */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    // quantize BEFORE the max/equality so a cross-engine ulp in the
    // per-supplier sums can never flip which supplier wins
    def q4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      floor(c * 10000 + 0.5 + 1e-6) / 10000
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(q4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("total_rev"))
    val top = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** Join-elimination demonstration query: an orders rollup that joins
    * the customer dimension "just in case" (the view-building habit)
    * but uses none of its columns. With customer's primary key
    * declared ([[graft.plans.Constraints]]), the optimizer deletes the
    * join AND the customer scan from the plan — asserted in
    * JoinEliminationSpec; this gate pins that the rewritten plan still
    * returns exactly the un-eliminated result (the oracle replays the
    * join faithfully). */
  def prunedDimRollup(s: SparkSession, dir: String): DataFrame = {
    graft.plans.Constraints.declareKey(s"$dir/customer.parquet", "c_custkey")
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Blocked edit-distance fuzzy join — record linkage over part names:
    * pairs of parts in the same block (brand + first name word) whose
    * names are within `maxDist` Levenshtein edits. The standard
    * entity-resolution shape: blocking keys turn the quadratic
    * all-pairs into an equality join (ONE shuffle keyed by block), and
    * the expensive string metric runs only inside blocks — candidate
    * volume is sum of block_size^2, tracking true-match density, not
    * corpus^2. Levenshtein is the built-in codegen'd expression, so
    * verification stays inside whole-stage codegen.
    *
    * Blocking is part of the declared semantics here (pairs straddling
    * blocks are by definition not candidates) — the honest contract of
    * every blocked linkage system; recall beyond the block requires
    * more blocking passes (e.g. second word, phonetic key), each the
    * same plan. */
  def fuzzyNamePairs(s: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"),
      col("p_brand"), split(col("p_name"), " ").getItem(0).as("w1"))
    val a = p.select(col("p_brand"), col("w1"),
      col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("w1"),
      col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "w1"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("p_brand"), col("key_a"), col("key_b"), col("dist"))
  }

  /** Record-linkage entity resolution: [[fuzzyNamePairs]]'s blocked
    * match pairs closed under transitivity — if A~B and B~C, all three
    * are one entity even when A and C differ by more than the edit
    * bound. The classic ER pipeline (blocking → pairwise verify →
    * transitive closure), with the closure running on the same
    * size-adaptive connected-components primitive as near-dup
    * clustering ([[Dedup.componentsOf]]): single-task union-find for
    * small match graphs, pointer-jumping label propagation at scale.
    * Each entity is named by its minimum member key; n_members comes
    * from one entity-keyed window over the (tiny) clustered subset. */
  def entityClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = fuzzyNamePairs(s, dir)
      .select(col("key_a").as("doc_a"), col("key_b").as("doc_b"))
    val cc = graft.operators.Dedup.componentsOf(s, pairs)
    cc.select(col("cluster").as("entity_id"), col("doc_id").as("p_partkey"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("entity_id"))))
  }

  /** TPC-H Q5 shape — local-supplier volume: the 6-table join
    * (customer⋈orders⋈lineitem⋈supplier⋈nation⋈region) with the
    * correlation predicate c_nationkey = s_nationkey and a date-range
    * filter pushed to the orders scan. The two fact tables shuffle
    * once on orderkey; all four dimensions broadcast, so the only
    * exchanges in the plan are that one co-partitioning and the final
    * tiny rollup — the join order a 100 TB star schema demands. */
  def localSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q10 shape — returned-item revenue: which customers drive
    * the most lost revenue through returns. Fact⋈fact (lineitem⋈orders)
    * co-partitions on orderkey with the returnflag filter pushed to the
    * lineitem scan; the customer dimension broadcasts; top-N is a
    * TakeOrdered with custkey tie-break. */
  def returnedRevenue(s: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("lost_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(topN)
  }

  /** TPC-H Q3 shape — shipping priority: BUILDING-segment customers'
    * orders placed before the cutoff, restricted to lineitems shipped
    * after it, top 10 by revenue. All three predicates push into their
    * scans; the sort+limit fuses to TakeOrderedAndProject (no global
    * sort of the aggregate). */
  def shippingPriority(s: SparkSession, dir: String, cutoff: String = "1997-06-01"): DataFrame = {
    val cus = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cus), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4 shape — order-priority checking: orders from one year
    * where at least one line shipped more than `lateDays` after the
    * order date, counted by priority. The EXISTS subquery is a LEFT
    * SEMI join on orderkey with the lateness predicate as a join-side
    * filter; lineitem is pre-projected to two columns so the shuffled
    * semi-join build carries no payload. The date filter pushes into
    * the orders scan (PushedFilters on o_orderdate).
    * (Schema note: the testdata has no commit/receipt dates, so
    * "late" is defined against the order date — same plan shape.) */
  def orderPriorityCheck(s: SparkSession, dir: String,
      year: String = "1996", lateDays: Int = 60): DataFrame = {
    val lo = lit(s"$year-01-01").cast("timestamp")
    val hi = lit(s"${year.toInt + 1}-01-01").cast("timestamp")
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: how many
    * customers placed exactly N non-'F' orders, including the
    * zero-order bucket. Instead of the textbook outer join of raw
    * orders onto customer (|orders| rows through the join), orders are
    * aggregated to per-customer counts FIRST (one shuffle on custkey,
    * map-side combined), and the count table — |customer|-sized —
    * left-joins back; absent keys coalesce to 0. The final
    * distribution is a tiny second aggregate. */
  def orderCountDistribution(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .filter(col("o_orderstatus") =!= "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .groupBy(col("n_orders")).agg(count(lit(1)).as("n_custs"))
      .orderBy(col("n_custs").desc, col("n_orders").desc)
  }

  /** TPC-H Q16 shape — parts/supplier relationship: distinct supplier
    * counts per (brand, type, size) over selected sizes, excluding
    * brand 'Brand#1' and any supplier with a negative balance (the
    * NOT IN subquery). The excluded-supplier set is tiny → broadcast
    * LEFT ANTI (map-side, no shuffle); the part dimension filter is a
    * broadcast equi-join; COUNT(DISTINCT) is Spark's two-phase
    * partial-distinct aggregate keyed by the group columns.
    * (Schema note: no partsupp table in the testdata — lineitem is the
    * part↔supplier bridge, same join topology.) */
  def partSupplierCounts(s: SparkSession, dir: String): DataFrame = {
    val sizes = Seq(1, 5, 9, 13, 17, 21, 25, 29).map(lit(_))
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSupp = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q19 shape — disjunctive discounted revenue: three
    * brand/size/quantity disjuncts OR-ed together. The join key is
    * still the plain partkey equi-join; the disjunction rides as the
    * join filter. Crucially the build side is pre-pruned with the
    * hand-extracted CNF envelope of the disjunction (brand ∈ {…} AND
    * size ≤ max) — the optimization Catalyst cannot derive from an OR
    * across both sides — so the broadcast hash table holds only
    * eligible parts. */
  def disjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val brands = Seq("Brand#1", "Brand#2", "Brand#3")
    val parts = Tables.part(s, dir)
      .filter(col("p_brand").isin(brands.map(lit(_)): _*) &&
        col("p_size").between(1, 15))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val disjunction =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey") && disjunction)
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape — suppliers who kept orders waiting: for
    * finished ('F') orders with lines from ≥2 suppliers, find orders
    * where EXACTLY ONE supplier shipped late (> `lateDays` past the
    * order date) and charge that order to the late supplier. The
    * textbook formulation is two correlated self-joins of lineitem
    * (EXISTS + NOT EXISTS); at 100 TB those are two extra shuffles of
    * the fact table. This plan folds both into ONE per-order
    * aggregate — n distinct suppliers, n distinct late suppliers, and
    * min(late supplier) which is THE late supplier when the count is
    * 1 — so lineitem is shuffled once, on the key it shares with
    * orders. Supplier names broadcast at the end.
    * (Schema note: no commit/receipt dates — lateness is measured
    * against the order date, preserving the exists/not-exists shape.) */
  def waitingSuppliers(s: SparkSession, dir: String,
      lateDays: Int = 90, topN: Int = 20): DataFrame = {
    val ord = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val flagged = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
    // Two-level aggregate instead of two countDistincts: the distinct
    // grain is (order, supplier), so collapsing to it FIRST makes the
    // order-level counts plain (map-side-combinable) aggregates —
    // the single-aggregate Expand(×3) plan the multi-countDistinct
    // form compiles to tripled the shuffle for no semantic gain
    // (r10 receipt: 2.0 s → measured below, same oracle).
    val perOrderSupp = flagged.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    val perOrder = perOrderSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"),
        sum(col("late").cast("long")).as("n_late"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supps") > 1 && col("n_late") === 1)
    perOrder
      .join(broadcast(Tables.supplier(s, dir)),
        col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(topN)
  }

  /** TPC-H Q22 shape — global sales opportunity: customers whose
    * balance beats the average positive balance but who have no OPEN
    * ('O') order, profiled by market segment. The scalar AVG subquery
    * is a 1-row broadcast cross join (no second pass over customer);
    * the NOT EXISTS is a LEFT ANTI against the DISTINCT custkeys of
    * open orders — the status filter pushes into the scan and
    * distinct-ing first shrinks the anti-join build from |orders| to
    * |customers-with-open-orders| before the shuffle. (The testdata's
    * keyspace is dense — every customer has SOME order — so the
    * no-order-at-all predicate would gate on an empty result; open
    * orders keep the gate populated at every sf.) */
  def salesOpportunity(s: SparkSession, dir: String): DataFrame = {
    val cus = Tables.customer(s, dir)
    val avgBal = cus.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val activeCust = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey")).distinct()
    cus.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(activeCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_custs"),
        round(sum(col("c_acctbal")), 4).as("total_bal"))
      .orderBy(col("segment"))
  }

  /** Week-over-week top movers by brand revenue — the "what changed"
    * report (largest |Δ| between the final two calendar weeks).
    * Weekly revenues are quantized BEFORE the delta so the Δ ranking
    * compares exact values; brand breaks exact ties. One fact rollup
    * to (brand, week), a 1-row anchor scalar, a brand-bounded pivot. */
  def weeklyMovers(s: SparkSession, dir: String, topN: Int = 10): DataFrame = {
    def q4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + 0.5 + 1e-6) / 10000
    val mx = Tables.orders(s, dir)
      .agg(date_trunc("week", max(col("o_orderdate"))).cast("date").as("w1"))
    val wk = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        date_trunc("week", col("o_orderdate")).cast("date").as("w"))
      .agg(q4(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        .as("rev"))
    wk.crossJoin(broadcast(mx))
      .filter(col("w") === col("w1") || col("w") === date_sub(col("w1"), 7))
      .groupBy(col("p_brand"))
      .agg(sum(when(col("w") === date_sub(col("w1"), 7), col("rev"))
          .otherwise(0.0)).as("prev_rev"),
        sum(when(col("w") === col("w1"), col("rev")).otherwise(0.0))
          .as("cur_rev"))
      .select(col("p_brand"), col("prev_rev"), col("cur_rev"),
        q4(col("cur_rev") - col("prev_rev")).as("delta"))
      .orderBy(abs(col("cur_rev") - col("prev_rev")).desc, col("p_brand"))
      .limit(topN)
  }

  /** Per-part cross-supplier price dispersion: coefficient of
    * variation of the average unit price across suppliers (≥ 3
    * suppliers) — high CV flags arbitrage/mispricing or a data error.
    * Two keyed rollups: (part, supplier) then part; the top-k is a
    * TakeOrdered (rank-25 CV gap measured at 3e-3 — far above float
    * drift). */
  def priceDispersion(s: SparkSession, dir: String,
      minSuppliers: Int = 3, topN: Int = 25): DataFrame = {
    def q4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + 0.5 + 1e-6) / 10000
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(avg(col("l_extendedprice") / col("l_quantity")).as("up"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        (stddev_samp(col("up")) / avg(col("up"))).as("cv"))
      .filter(col("n_suppliers") >= minSuppliers)
      .select(col("p_partkey"), col("n_suppliers"), q4(col("cv")).as("price_cv"),
        col("cv"))
      .orderBy(col("cv").desc, col("p_partkey"))
      .limit(topN)
      .drop("cv")
  }

  /** Return rate per brand with a Wilson-score lower confidence bound
    * (z = 1.96) — ranking brands by RAW return share promotes
    * small-sample flukes (2/2 returned beats 400/1000); the Wilson
    * lower bound is the standard shrinkage that makes the ranking
    * sample-size honest. One broadcast part join + one brand-keyed
    * aggregate; the bound is closed-form arithmetic on exact integer
    * counts, 4-decimal-quantized at the output only. */
  def returnRateWilson(s: SparkSession, dir: String,
      z: Double = 1.96): DataFrame = {
    def q4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + 0.5 + 1e-6) / 10000
    val agg = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"))
    val n = col("n_lines").cast("double")
    val phat = col("n_returned").cast("double") / n
    val z2 = lit(z * z)
    val wilson = (phat + z2 / (n * 2) -
      lit(z) * sqrt(phat * (lit(1.0) - phat) / n + z2 / (n * n * 4))) /
      (lit(1.0) + z2 / n)
    agg.select(col("p_brand"), col("n_lines"), col("n_returned"),
        q4(phat).as("return_rate"), q4(wilson).as("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("p_brand"))
  }

  /** TPC-H Q2 shape — minimum-cost supplier per part within a region.
    * The testdata has no partsupp, so "supply cost" is the observed
    * average unit price (extendedprice/quantity) per (part, supplier)
    * from lineitem — the JOIN SHAPE is the spec's: region-restricted
    * supplier pool, per-part correlated MIN, dimension payload joined
    * after the winner is picked. The correlated subquery becomes a
    * min(struct(price, suppkey)) argmin — ONE aggregate, no window
    * and no self-join; the price is quantized to 4 decimals BEFORE
    * the argmin so a cross-engine ulp can never flip the winner
    * (suppkey breaks exact ties deterministically). Supplier pool and
    * part dim broadcast; the only fact-sized shuffle is the
    * (part,supplier) rollup. */
  def minCostSupplier(s: SparkSession, dir: String,
      region: String = "EUROPE", ptype: String = "PROMO",
      topN: Int = 50): DataFrame = {
    def q4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + 0.5 + 1e-6) / 10000
    val regionSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val unitPrice = Tables.lineitem(s, dir)
      .join(broadcast(regionSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(q4(avg(col("l_extendedprice") / col("l_quantity"))).as("unit_price"))
    val winner = unitPrice
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("unit_price"), col("l_suppkey"))).as("w"))
      .select(col("l_partkey"), col("w.unit_price").as("min_price"),
        col("w.l_suppkey").as("win_supp"))
    winner
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === ptype)),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionSupp), col("win_supp") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("min_price"))
      .orderBy(col("min_price").desc, col("p_partkey"))
      .limit(topN)
  }

  /** TPC-H Q11 shape — "important stock": parts whose traded value
    * through one nation's suppliers exceeds a fixed fraction of that
    * nation's total. Two passes over ONE persisted per-part rollup
    * (the second is a 1-row scalar broadcast back), exactly the spec's
    * HAVING > SUM(...)*frac — never a re-scan of lineitem. The
    * comparison runs on raw doubles but the published value is
    * quantized; frac is chosen so no part sits within 1e-4 of the
    * boundary at gate scale (margin measured: 1372 at sf0.01). */
  def importantParts(s: SparkSession, dir: String,
      nation: String = "NATION_3", frac: Double = 0.002): DataFrame = {
    def q4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + 0.5 + 1e-6) / 10000
    val natSupp = Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === nation)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = Tables.lineitem(s, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("val"))
      .persistMemDisk
    val total = perPart.agg(sum(col("val")).as("tot"))
    val out = perPart.crossJoin(broadcast(total))
      .filter(col("val") > lit(frac) * col("tot"))
      .select(col("p_partkey"), q4(col("val")).as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
    out
  }

  /** TPC-H Q20 shape — promotion-capable suppliers: suppliers whose
    * shipped quantity of a name-class of parts over a date window
    * beats 1.2× the mean across shipping suppliers. The spec's nested
    * EXISTS chain becomes: broadcast semi on the part class → one
    * supplier-keyed rollup → scalar mean broadcast back → dim join.
    * Quantities are integral doubles, so the rollup sums are EXACT in
    * any summation order and the threshold compare is deterministic
    * across engines without quantization (avg = exact-sum / count is
    * one IEEE division — bit-identical). */
  def promoSuppliers(s: SparkSession, dir: String,
      nameFragment: String = "blue", factor: Double = 1.2): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_name").contains(nameFragment))
      .select(col("p_partkey"))
    val perSupp = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("qty"))
      .persistMemDisk
    val meanQ = perSupp.agg(avg(col("qty")).as("avg_q"))
    perSupp.crossJoin(broadcast(meanQ))
      .filter(col("qty") > lit(factor) * col("avg_q"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("qty"))
      .orderBy(col("s_suppkey"))
  }

  /** Laspeyres / Paasche / Fisher price indices between the first and
    * last order year over the parts traded in BOTH (the classic
    * "how much did prices move, holding the basket fixed" economics
    * readout): unit prices are revenue/quantity at the (part, year)
    * grain, Laspeyres weights by base-year quantities, Paasche by
    * current-year, Fisher is their geometric mean.
    *
    * Scale shape: one (part, year)-keyed rollup of the two boundary
    * years (filter pushed to the scan), one part-keyed join of the
    * two year slices, then a single aggregate of products of
    * quantized part-grain values — exact-ratio economics, no window,
    * no sort. */
  def priceIndex(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(year(col("o_orderdate")).as("y"), col("l_partkey"),
        col("l_extendedprice").as("ext"), col("l_quantity").as("qty"))
    val yr = li.agg(min(col("y")).as("y0"), max(col("y")).as("y1"))
    val py = li.crossJoin(broadcast(yr))
      .filter(col("y") === col("y0") || col("y") === col("y1"))
      .groupBy(col("l_partkey"), (col("y") === col("y0")).as("base"))
      .agg(round4eps(sum(col("ext")) / sum(col("qty"))).as("p"),
        round4eps(sum(col("qty"))).as("q"))
    val b = py.filter(col("base"))
      .select(col("l_partkey").as("pk"), col("p").as("p0"), col("q").as("q0"))
    val c = py.filter(!col("base"))
      .select(col("l_partkey").as("pk2"), col("p").as("p1"), col("q").as("q1"))
    val lasp = sum(col("p1") * col("q0")) / sum(col("p0") * col("q0"))
    val paas = sum(col("p1") * col("q1")) / sum(col("p0") * col("q1"))
    b.join(c, col("pk") === col("pk2"))
      .crossJoin(broadcast(yr))
      .agg(max(col("y0")).as("year_base"), max(col("y1")).as("year_now"),
        count(lit(1)).as("n_common_parts"),
        round4eps(lasp).as("laspeyres"),
        round4eps(paas).as("paasche"),
        round4eps(sqrt(lasp * paas)).as("fisher"))
  }

  /** Brand-switching matrix: each order's dominant brand (max
    * quantity, brand-name tie-break), then consecutive-order brand
    * transitions per customer — the loyalty/churn readout CPG teams
    * run (the diagonal is loyalty, off-diagonal flows are switching).
    * Top 10 transitions with the share of all pairs.
    *
    * Scale shape: order-grain argmax via min(struct) (one keyed
    * shuffle), ONE customer-keyed window for the lag, and a
    * brand²-bounded count frame for the output. */
  def brandSwitching(s: SparkSession, dir: String, topN: Int = 10):
      DataFrame = {
    import graft.functions.Rounding.round4eps
    val ob = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_brand"))
      .agg(sum(col("l_quantity")).as("q"))
      .groupBy(col("l_orderkey"))
      .agg(min(struct((-col("q")).as("nq"), col("p_brand").as("b")))
        .as("w"))
      .select(col("l_orderkey"), col("w.b").as("brand"))
    val seq0 = ob.join(Tables.orders(s, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("o_orderdate").as("d"),
        col("o_orderkey").as("ok"), col("brand"))
    val w = Window.partitionBy(col("ck")).orderBy(col("d"), col("ok"))
    val pairs = seq0.withColumn("prev", lag(col("brand"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_brand"), col("brand").as("to_brand"))
      .agg(count(lit(1)).as("n"))
      .persistMemDisk
    val tot = pairs.agg(sum(col("n")).as("tn"))
    pairs.crossJoin(broadcast(tot))
      .select(col("from_brand"), col("to_brand"), col("n"),
        round4eps(col("n").cast("double") / col("tn")).as("share"),
        (col("from_brand") === col("to_brand")).as("loyal"))
      .orderBy(col("n").desc, col("from_brand"), col("to_brand"))
      .limit(topN)
  }

  /** Adoption velocity: for every part with at least 10 orders, the
    * days from its FIRST order to its TENTH — the new-product
    * traction readout ("which parts caught on fastest"). Top 10 by
    * velocity with deterministic tie-breaks.
    *
    * Scale shape: order dates rank inside a part-keyed window
    * (bounded by orders-per-part), then one part-grain aggregate —
    * no global sort until the TakeOrdered top-k. */
  def adoptionVelocity(s: SparkSession, dir: String, kth: Int = 10,
      topN: Int = 10): DataFrame = {
    val po = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), col("o_orderdate").cast("date").as("d"),
        col("o_orderkey").as("ok"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("d"), col("ok"))
    val ranked = po.withColumn("rn", row_number().over(w))
    ranked.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("d")).as("first_day"),
        min(when(col("rn") === kth, col("d"))).as("kth_day"))
      .filter(col("kth_day").isNotNull)
      .select(col("l_partkey"), col("n_orders"), col("first_day"),
        datediff(col("kth_day"), col("first_day")).cast("long")
          .as("days_to_10th"))
      .orderBy(col("days_to_10th"), col("l_partkey"))
      .limit(topN)
  }

  /** Cross-price elasticity between two brands: ln(monthly quantity
    * of brand A) regressed on ln(monthly mean unit price of brand B)
    * — a positive slope says B's price hikes push buyers to A
    * (substitutes). The own-price elasticity of A rides along for
    * contrast. Closed-form slope from one moment pass over the
    * calendar-bounded monthly frame; prices and quantities are
    * quantized before the logs. */
  def crossElasticity(s: SparkSession, dir: String,
      brandA: String = "Brand#11", brandB: String = "Brand#12"):
      DataFrame = {
    import graft.functions.Rounding.{round4eps, round6eps}
    val li = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("p_brand").isin(brandA, brandB))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("m"), col("p_brand"))
      .agg(round4eps(sum(col("l_quantity"))).as("q"),
        round4eps(sum(col("l_extendedprice")) / sum(col("l_quantity")))
          .as("p"))
    val a = li.filter(col("p_brand") === brandA)
      .select(col("m"), log(col("q")).as("lqa"), log(col("p")).as("lpa"))
    val b = li.filter(col("p_brand") === brandB)
      .select(col("m").as("m2"), log(col("p")).as("lpb"))
    val j = a.join(b, col("m") === col("m2"))
    val mom = j.agg(count(lit(1)).cast("double").as("n"),
      sum(col("lqa")).as("sq"), sum(col("lpb")).as("sb"),
      sum(col("lpa")).as("sa"),
      sum(col("lqa") * col("lpb")).as("sqb"),
      sum(col("lpb") * col("lpb")).as("sbb"),
      sum(col("lqa") * col("lpa")).as("sqa"),
      sum(col("lpa") * col("lpa")).as("saa"))
    mom.select(col("n").cast("long").as("n_months"),
      round4eps((col("sqb") - col("sq") * col("sb") / col("n")) /
        (col("sbb") - col("sb") * col("sb") / col("n")))
        .as("cross_elasticity"),
      round4eps((col("sqa") - col("sq") * col("sa") / col("n")) /
        (col("saa") - col("sa") * col("sa") / col("n")))
        .as("own_elasticity"))
  }

  /** Brand beta against the market: cov(brand, market)/var(market)
    * over monthly revenues — which brands amplify market swings
    * (β > 1) vs act defensively (β < 1), the factor-exposure lens on
    * a product portfolio. Top 10 by β with the brand's mean share.
    *
    * Scale shape: one (brand × month) rollup; the market series is a
    * month-grain re-aggregate broadcast back; each brand's β is a
    * moment pass over its calendar-bounded month row set. */
  def brandBeta(s: SparkSession, dir: String, topN: Int = 10):
      DataFrame = {
    import graft.functions.Rounding.round4eps
    val mb = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("m"), col("p_brand"))
      .agg(round4eps(sum(col("l_extendedprice") *
        (lit(1.0) - col("l_discount"))) / lit(1e6)).as("rev"))
      .persistMemDisk
    val mkt = mb.groupBy(col("m"))
      .agg(round4eps(sum(col("rev"))).as("mrev"))
    val j = mb.join(broadcast(mkt), "m")
    val mom = j.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("rev")).as("sb"), sum(col("mrev")).as("sm"),
        sum(col("rev") * col("mrev")).as("sbm"),
        sum(col("mrev") * col("mrev")).as("smm"))
    mom.select(col("p_brand").as("brand"),
        col("n").cast("long").as("n_months"),
        round4eps((col("sbm") - col("sb") * col("sm") / col("n")) /
          (col("smm") - col("sm") * col("sm") / col("n"))).as("beta"),
        round4eps(col("sb") / col("sm")).as("mean_share"))
      .orderBy(col("beta").desc, col("brand"))
      .limit(topN)
  }

  /** Warehouse reconciliation tie-out per order year: the order-header
    * totals against the summed line-level net revenue, with coverage
    * counts (orders carrying at least one line) — the finance-close
    * report that catches silently-dropped lines or double-loaded
    * headers long before anyone reads a dashboard. Complements the
    * key-level q_ri_audit with the AGGREGATE tie-out.
    *
    * Scale shape: one order-grain line rollup, one left join back to
    * headers (order-keyed), one year re-aggregate. */
  def reconcile(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val lineAgg = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("line_net"), count(lit(1)).as("n_lines"))
    Tables.orders(s, dir)
      .join(lineAgg, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("l_orderkey")).as("n_with_lines"),
        round4eps(sum(col("o_totalprice")) / lit(1e6)).as("header_total_m"),
        round4eps(coalesce(sum(col("line_net")), lit(0.0)) / lit(1e6))
          .as("line_net_total_m"),
        round4eps(coalesce(sum(col("line_net")), lit(0.0)) /
          sum(col("o_totalprice"))).as("net_to_header_ratio"))
      .orderBy(col("yr"))
  }

  /** Price-tier revenue mix by year: fixed tier boundaries come from
    * the FIRST year's exact order-total quartiles (distribution
    * collapse — no buffering percentile), then every year's revenue
    * is binned against those frozen boundaries — the premiumization
    * readout ("is the mix drifting toward the top tier"), comparable
    * across years precisely because the boundaries never move. */
  def priceTierMix(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val o = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("yr"),
        floor(col("o_totalprice") / 1000).cast("long").as("v"),
        col("o_totalprice"))
      .persistMemDisk
    val y0 = o.agg(min(col("yr")).as("y0"))
    val cells = o.crossJoin(broadcast(y0)).filter(col("yr") === col("y0"))
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cc", sum(col("c")).over(w))
      .withColumn("ng", sum(col("c")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val bounds = cum.agg(
      min(when(col("cc") >= ceil(col("ng") * 0.25), col("v"))).as("q1"),
      min(when(col("cc") >= ceil(col("ng") * 0.5), col("v"))).as("q2"),
      min(when(col("cc") >= ceil(col("ng") * 0.75), col("v"))).as("q3"))
    val tiered = o.crossJoin(broadcast(bounds))
      .select(col("yr"),
        when(col("v") <= col("q1"), "T1_budget")
          .when(col("v") <= col("q2"), "T2_mid")
          .when(col("v") <= col("q3"), "T3_upper")
          .otherwise("T4_premium").as("tier"),
        col("o_totalprice"))
    val yt = tiered.groupBy(col("yr"), col("tier"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
      .persistMemDisk
    val tot = yt.groupBy(col("yr")).agg(sum(col("rev")).as("yr_total"))
    yt.join(broadcast(tot), "yr")
      .select(col("yr"), col("tier"),
        round4eps(col("rev") / col("yr_total")).as("rev_share"))
      .orderBy(col("yr"), col("tier"))
  }

  /** Line-position profile: how the basket changes down the order —
    * per line number, the line count, mean quantity, mean net price
    * and return rate (a falling quantity curve says the first line is
    * the anchor purchase and the tail is add-ons; a rising return
    * rate down the tail flags impulse adds). One position-keyed count
    * pass; positions are a tiny fixed vocabulary (1..7 in TPC-H). */
  def linePosition(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    Tables.lineitem(s, dir)
      .groupBy(col("l_linenumber").as("line_no"))
      .agg(count(lit(1)).as("n_lines"),
        round4eps(avg(col("l_quantity"))).as("mean_quantity"),
        round4eps(avg(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")))).as("mean_net_price"),
        round4eps(avg(when(col("l_returnflag") === "R", 1.0)
          .otherwise(0.0))).as("return_rate"))
      .orderBy(col("line_no"))
  }

  /** Brand leaderboard volatility: month-over-month absolute rank
    * change of every brand's revenue position — "how churny is the
    * top-25" (a stable leaderboard and a reshuffling one need
    * different merchandising). Ranks are TOTAL orders (quantized
    * revenue, brand tie-break), so both engines assign identical
    * positions.
    *
    * Scale shape: one (month × brand) rollup; rank windows partition
    * per month (25 rows each); the lag is brand-keyed over the
    * calendar-bounded month frame. */
  def rankVolatility(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val mb = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("m"), col("p_brand"))
      .agg(round4eps(sum(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")))).as("rev"))
    val wm = Window.partitionBy(col("m"))
      .orderBy(col("rev").desc, col("p_brand"))
    val ranked = mb.withColumn("rk", row_number().over(wm))
    val wb = Window.partitionBy(col("p_brand")).orderBy(col("m"))
    val deltas = ranked
      .withColumn("prev_rk", lag(col("rk"), 1).over(wb))
      .filter(col("prev_rk").isNotNull)
      .select((abs(col("rk") - col("prev_rk"))).cast("long").as("d"))
    deltas.agg(count(lit(1)).as("n_pairs"),
      round4eps(avg(col("d").cast("double"))).as("mean_abs_change"),
      max(col("d")).as("max_jump"),
      round4eps(avg(when(col("d") === 0, 1.0).otherwise(0.0)))
        .as("stay_rate"))
  }

  /** Agreement between two part rankings — by total quantity vs by
    * net revenue: Spearman ρ on the exact integer ranks (total orders
    * via the part-key tie-break, so Σd² is exact integer arithmetic,
    * bit-identical cross-engine) plus the top-100 overlap share — the
    * "do our two definitions of 'top part' even agree" audit.
    *
    * Scale shape: one part-grain rollup; both rank windows run over
    * the part-cardinality-bounded frame (the documented abcParts
    * bound); the ρ formula is one aggregate. */
  def rankAgreement(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val pp = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(round4eps(sum(col("l_quantity"))).as("qty"),
        round4eps(sum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount")))).as("rev"))
    // part-cardinality-bounded windows (see abcParts note)
    val rq = row_number().over(
      Window.orderBy(col("qty").desc, col("l_partkey")))
    val rr = row_number().over(
      Window.orderBy(col("rev").desc, col("l_partkey")))
    val ranked = pp.withColumn("rkq", rq).withColumn("rkr", rr)
      .select(col("l_partkey"),
        col("rkq").cast("long").as("rkq"),
        col("rkr").cast("long").as("rkr"))
    ranked.agg(count(lit(1)).as("n_parts"),
        sum((col("rkq") - col("rkr")) * (col("rkq") - col("rkr")))
          .as("sd2"),
        sum(when(col("rkq") <= 100 && col("rkr") <= 100, 1L)
          .otherwise(0L)).as("top100_both"))
      .select(col("n_parts"),
        round4eps(lit(1.0) - lit(6.0) * col("sd2") /
          (col("n_parts").cast("double") *
            (col("n_parts").cast("double") *
              col("n_parts").cast("double") - 1)))
          .as("spearman_rho"),
        round4eps(col("top100_both").cast("double") / 100)
          .as("top100_overlap"))
  }

  /** Empirical-Bayes (James-Stein / beta-binomial) shrinkage of
    * per-brand return rates toward the pooled rate: the prior
    * strength M comes from the method of moments on the between-brand
    * rate variance (M = μ(1−μ)/Var_between − 1, floored at 1), and
    * each brand's posterior is (x + Mμ)/(n + M) — the small-sample
    * correction that stops a 3-line brand from topping the returns
    * leaderboard. Reports the most-shrunk brands.
    *
    * Scale shape: one brand-grain count rollup, one moment
    * re-aggregate of that dimension-bounded frame, broadcast back;
    * μ and M are q6-pinned before the posterior so both engines walk
    * identical arithmetic. Ranked on the QUANTIZED shrink delta with
    * the brand tie-break. */
  def jamesStein(s: SparkSession, dir: String, topN: Int = 10):
      DataFrame = {
    import graft.functions.Rounding.{round4eps, round6eps}
    val b = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
      .persistMemDisk
    val mom = b.agg(
      round6eps(sum(col("x")).cast("double") / sum(col("n"))).as("mu"),
      count(lit(1)).cast("double").as("k"),
      sum((col("x").cast("double") / col("n")) *
        (col("x").cast("double") / col("n"))).as("sr2"),
      sum(col("x").cast("double") / col("n")).as("sr"))
    val varB = col("sr2") / col("k") -
      (col("sr") / col("k")) * (col("sr") / col("k"))
    val prior = mom.select(col("mu"),
      round6eps(greatest(lit(1.0),
        col("mu") * (lit(1.0) - col("mu")) / varB - 1)).as("m"))
    val post = (col("x") + col("m") * col("mu")) / (col("n") + col("m"))
    val raw = col("x").cast("double") / col("n")
    b.crossJoin(broadcast(prior))
      .select(col("brand"), col("n"), col("x").as("returns"),
        round4eps(raw).as("raw_rate"),
        round4eps(post).as("posterior_rate"),
        round4eps(abs(post - raw)).as("shrink"))
      .orderBy(col("shrink").desc, col("brand"))
      .limit(topN)
  }

  /** Revenue bridge (waterfall) between the first and last order
    * year: ΔR decomposed into price effect Σ(p₁−p₀)q₀, volume effect
    * Σ(q₁−q₀)p₀, the price×volume cross term, plus revenue from parts
    * new in year 1 and lost from parts churned after year 0 — and the
    * identity Σcomponents = ΔR holds EXACTLY (spec-pinned), which is
    * the whole point of a bridge: nothing leaks.
    *
    * Scale shape: same skeleton as [[priceIndex]] — one boundary-year
    * (part, year) rollup, one part-keyed FULL OUTER join (common,
    * new, churned all fall out of the null pattern), one aggregate of
    * quantized part-grain terms. */
  def revenueBridge(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(year(col("o_orderdate")).as("y"), col("l_partkey"),
        col("l_extendedprice").as("ext"), col("l_quantity").as("qty"))
    val yr = li.agg(min(col("y")).as("y0"), max(col("y")).as("y1"))
    val py = li.crossJoin(broadcast(yr))
      .filter(col("y") === col("y0") || col("y") === col("y1"))
      .groupBy(col("l_partkey"), (col("y") === col("y0")).as("base"))
      .agg(round4eps(sum(col("ext")) / sum(col("qty"))).as("p"),
        round4eps(sum(col("qty"))).as("q"))
    val b = py.filter(col("base"))
      .select(col("l_partkey").as("pk"), col("p").as("p0"), col("q").as("q0"))
    val c = py.filter(!col("base"))
      .select(col("l_partkey").as("pk2"), col("p").as("p1"), col("q").as("q1"))
    val j = b.join(c, col("pk") === col("pk2"), "full_outer")
    val common = col("pk").isNotNull && col("pk2").isNotNull
    j.agg(
        round4eps(sum(when(common, (col("p1") - col("p0")) * col("q0"))))
          .as("price_effect"),
        round4eps(sum(when(common, (col("q1") - col("q0")) * col("p0"))))
          .as("volume_effect"),
        round4eps(sum(when(common,
          (col("p1") - col("p0")) * (col("q1") - col("q0")))))
          .as("cross_effect"),
        round4eps(coalesce(sum(when(col("pk").isNull,
          col("p1") * col("q1"))), lit(0.0))).as("new_parts"),
        round4eps(coalesce(sum(when(col("pk2").isNull,
          -col("p0") * col("q0"))), lit(0.0))).as("churned_parts"),
        round4eps(sum(coalesce(col("p1") * col("q1"), lit(0.0)) -
          coalesce(col("p0") * col("q0"), lit(0.0))))
          .as("delta_revenue"))
  }

  /** Ship lead-time distribution per order priority: exact p50/p90 of
    * (shipdate − orderdate) in days plus the mean — the operational
    * SLA readout. Latencies are small integers, so the exact
    * percentiles come from the distribution collapse (cumulative
    * counts over the ≤~120-value latency domain per priority), never
    * a sort or a buffering percentile aggregate. */
  def leadTime(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val lat = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("v"))
    val cells = lat.groupBy(col("prio"), col("v")).agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy(col("prio")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells.withColumn("cc", sum(col("c")).over(wg))
      .withColumn("ng", sum(col("c")).over(Window.partitionBy(col("prio"))))
    cum.groupBy(col("prio"))
      .agg(max(col("ng")).as("n_lines"),
        min(when(col("cc") >= ceil(col("ng") * 0.5), col("v")))
          .as("p50_days"),
        min(when(col("cc") >= ceil(col("ng") * 0.9), col("v")))
          .as("p90_days"),
        round4eps(sum(col("v") * col("c")).cast("double") / max(col("ng")))
          .as("mean_days"))
      .orderBy(col("prio"))
  }

  /** Suspected duplicate invoices: pairs of orders with the SAME
    * integer-dollar total within 30 days of each other — the
    * books-audit double-entry screen. The join is EQUI-keyed on the
    * dollar amount: the quadratic is per amount cell (collision
    * density itself — near-zero for a high-cardinality amount
    * domain), with the date window as a residual filter; no fuzzy
    * all-pairs exists anywhere. */
  def dupeInvoices(s: SparkSession, dir: String, topN: Int = 20):
      DataFrame = {
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
      col("o_orderdate").cast("date").as("d"),
      floor(col("o_totalprice")).cast("long").as("dollars"))
    val b = o.select(col("ck").as("ck2"), col("ok").as("ok2"),
      col("d").as("d2"), col("dollars").as("dollars2"))
    o.join(b, col("dollars") === col("dollars2") &&
        col("ok") < col("ok2") &&
        abs(datediff(col("d2"), col("d"))) <= 30)
      .select(col("ok").as("order_a"), col("ok2").as("order_b"),
        col("ck").as("cust_a"), col("ck2").as("cust_b"),
        col("dollars").as("amount_dollars"),
        abs(datediff(col("d2"), col("d"))).as("days_apart"))
      .orderBy(col("order_a"), col("order_b"))
      .limit(topN)
  }

  /** Catalog coverage per brand: how many parts have NEVER been
    * ordered — the dead-inventory / cold-start readout, and the
    * repo's canonical LEFT ANTI join shape (the "what's missing"
    * question NOT EXISTS answers).
    *
    * Scale shape: the fact side collapses to DISTINCT part keys first
    * (one map-side-combinable shuffle — the anti join then probes a
    * key set, never the fact table), the anti join is key-partitioned
    * (SMJ at scale, broadcast when the key set fits), and the rollup
    * re-aggregates the dimension-bounded brand frame. */
  def partCoverage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val ordered = Tables.lineitem(s, dir).select(col("l_partkey")).distinct()
    val part = Tables.part(s, dir)
    val never = part.join(ordered,
        col("p_partkey") === col("l_partkey"), "left_anti")
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n_never"))
    part.groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
      .join(never, Seq("p_brand"), "left")
      .select(col("p_brand").as("brand"), col("n_parts"),
        coalesce(col("n_never"), lit(0L)).as("n_never"),
        round4eps(lit(1.0) - coalesce(col("n_never"), lit(0L))
          .cast("double") / col("n_parts")).as("coverage"))
      .orderBy(col("brand"))
  }

  /** Single-source supply risk: per-part supplier HHI over shipped
    * quantity — HHI = 1 means one supplier carries the whole part (the
    * procurement risk a resilience review hunts). Reported as the
    * top-k most-concentrated parts (HHI desc, volume desc) — ranked,
    * not thresholded, because a healthy multi-sourced catalog (this
    * one) would make any fixed cutoff degenerate. Exact integer
    * quantities make the share squares deterministic; one fact rollup
    * to (part, supplier), part-grain collapse, top-k heap. */
  def singleSourceRisk(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import graft.functions.Rounding.round4eps
    val ps = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("q"))
    ps.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("q")).as("total_q"),
        sum(col("q") * col("q")).as("sum_q2"))
      .withColumn("hhi", round4eps(
        col("sum_q2") / (col("total_q") * col("total_q"))))
      .select(col("l_partkey"), col("n_suppliers"),
        col("total_q").cast("long").as("total_qty"), col("hhi"))
      .orderBy(col("hhi").desc, col("total_qty").desc, col("l_partkey"))
      .limit(k)
  }

  /** Revealed comparative advantage (Balassa index) per
    * (supplier nation, part type): RCA = (x_cs/x_c) / (x_ws/x_w) —
    * the trade-economics index of what a nation is RELATIVELY good at
    * supplying, > 1 meaning over-indexed vs the world mix. All four
    * terms come from ONE fact rollup to the (nation, type) grid
    * (25×6 cells) with the margins as window sums over that constant
    * grid; the only fact-scale work is the first aggregate. */
  def revealedComparativeAdvantage(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val x = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name").as("nation"), col("p_type").as("ptype"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("x_cs"))
    val wNation = Window.partitionBy(col("nation"))
    val wType = Window.partitionBy(col("ptype"))
    val wAll = Window.partitionBy()
    x.withColumn("x_c", sum(col("x_cs")).over(wNation))
      .withColumn("x_ws", sum(col("x_cs")).over(wType))
      .withColumn("x_w", sum(col("x_cs")).over(wAll))
      .select(col("nation"), col("ptype"),
        round4eps(col("x_cs")).as("export_rev"),
        round4eps((col("x_cs") / col("x_c")) /
          (col("x_ws") / col("x_w"))).as("rca"))
      .orderBy(col("nation"), col("ptype"))
  }

  /** Little's Law audit — L = λ·W over the order pipeline: average
    * work-in-progress (orders placed but not fully shipped) must equal
    * arrival rate × average flow time. Measured over the full calendar
    * span with every order completing inside it, the identity is EXACT
    * (Fubini: Σ_days WIP(d) = Σ_orders duration), so the gate's
    * `ratio` column is an exact-identity check like growth_decomp —
    * any pipeline losing or double-counting orders breaks it.
    *
    * WIP is integrated event-wise: +1 at order date, −1 at completion
    * (= max lineitem ship date; in-flight on [start, complete)),
    * running sum over the collapsed event-day axis × interval lengths
    * — never a days×orders product. All terms are exact integers
    * until the final divisions. */
  def littleLawAudit(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val comp = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("complete"))
    val ord = Tables.orders(s, dir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("start"))
      .join(comp, col("o_orderkey") === col("l_orderkey"))
      .select(col("start"), col("complete"))
    val span = ord.agg(min(col("start")).as("d0"),
      max(col("complete")).as("d1"),
      count(lit(1)).as("n_orders"),
      sum(datediff(col("complete"), col("start"))).as("sum_dur"))
    val deltas = ord.select(col("start").as("d"), lit(1L).as("delta"))
      .unionByName(ord.select(col("complete").as("d"),
        lit(-1L).as("delta")))
      .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
    val w = Window.orderBy(col("d")) // collapsed event-day axis
    val integral = deltas
      .withColumn("wip", sum(col("delta")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("gap", datediff(lead(col("d"), 1).over(w), col("d")))
      .agg(sum(when(col("gap").isNotNull, col("wip") * col("gap"))
        .otherwise(0L)).as("wip_days"))
    integral.crossJoin(broadcast(span))
      .withColumn("span_days",
        datediff(col("d1"), col("d0")).cast("double"))
      .withColumn("lam", col("n_orders").cast("double") / col("span_days"))
      .withColumn("w_days",
        col("sum_dur").cast("double") / col("n_orders").cast("double"))
      .withColumn("l_avg",
        col("wip_days").cast("double") / col("span_days"))
      .select(col("n_orders"),
        col("span_days").cast("long").as("span_days"),
        round4eps(col("lam")).as("lambda"),
        round4eps(col("w_days")).as("w_days"),
        round4eps(col("l_avg")).as("l_avg"),
        round4eps(col("l_avg") / (col("lam") * col("w_days"))).as("ratio"))
  }

  /** Assortment turnover: month-over-month Jaccard of the top-20
    * revenue parts — "how much of the leaderboard churned" (high
    * turnover = volatile demand or an assortment reset; flat = stale
    * catalog). The top-20 sets are rank-windows over the
    * (month, part) rollup with (revenue desc, partkey) tie-breaks —
    * cents-quantized revenue so the rank order itself is
    * cross-engine-identical; the month axis is calendar-bounded and
    * the per-month sets are k-bounded, so the self-join over
    * consecutive months is constant-size at any corpus. */
  def assortmentTurnover(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import graft.functions.Rounding.round4eps
    val byMonth = Tables.lineitem(s, dir)
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("m"),
        col("l_partkey"))
      .agg((floor(sum(col("l_extendedprice") *
        (lit(1.0) - col("l_discount"))) * 100 + 0.5) / 100).as("rev"))
    val wRank = Window.partitionBy(col("m"))
      .orderBy(col("rev").desc, col("l_partkey"))
    val tops = byMonth
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= k)
      .select(col("m"), col("l_partkey"))
      .persistMemDisk
    val months = tops.select(col("m")).distinct()
      .withColumn("prev_m",
        lag(col("m"), 1).over(Window.orderBy(col("m"))))
      .filter(col("prev_m").isNotNull)
    val cur = tops.select(col("m"), col("l_partkey").as("pk"))
    val prev = tops.select(col("m").as("prev_m"), col("l_partkey").as("pk"))
    val sizes = tops.groupBy(col("m")).agg(count(lit(1)).as("sz"))
    months.join(cur, Seq("m"), "left")
      .join(prev.withColumn("in_prev", lit(1L)), Seq("prev_m", "pk"), "left")
      .groupBy(col("m"), col("prev_m"))
      .agg(count(lit(1)).as("n_top"),
        sum(coalesce(col("in_prev"), lit(0L))).as("n_kept"))
      .join(sizes.select(col("m").as("prev_m"), col("sz").as("sz_prev")),
        "prev_m")
      // sparse months can rank fewer than k parts: |A ∪ B| uses the
      // actual set sizes, not 2k
      .select(col("m"), col("n_kept"),
        (col("n_top") - col("n_kept")).as("n_new"),
        round4eps(col("n_kept").cast("double") /
          (col("n_top") + col("sz_prev") - col("n_kept")).cast("double"))
          .as("jaccard"))
      .orderBy(col("m"))
  }

  /** Trade gravity model over the nation-pair flow matrix:
    * ln(flowᶜˢ) = a + b₁·ln(Mᶜ) + b₂·ln(Mˢ) fitted by the olsMulti
    * Cramer solve over the ≤25×25 cells with positive flow (masses =
    * each nation's total as customer / as supplier) — Tinbergen's
    * gravity equation, the canonical screen for "does trade scale
    * with economic mass" on any origin×destination panel. Elasticity
    * coefficients near 1 mean proportional scaling.
    *
    * Scale shape: ONE fact rollup to the taxonomy-bounded pair matrix
    * (exact whole-dollar flows, map-side combined), then moment OLS
    * on ≤625 rows. */
  def gravityModel(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Rounding.round4eps
    val flows = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey").as("cn"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey").as("sn"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("cn"), col("sn"))
      .agg(sum(round(col("l_extendedprice")).cast("long")).as("flow"))
      .persistMemDisk
    val mc = flows.groupBy(col("cn"))
      .agg(sum(col("flow")).as("mass_c"))
    val ms = flows.groupBy(col("sn"))
      .agg(sum(col("flow")).as("mass_s"))
    val cells = flows.filter(col("flow") > 0)
      .join(broadcast(mc), "cn").join(broadcast(ms), "sn")
      .select(log(col("flow").cast("double")).as("y"),
        log(col("mass_c").cast("double")).as("x1"),
        log(col("mass_s").cast("double")).as("x2"))
    val m = cells.agg(count(lit(1)).cast("double").as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    val c11 = col("s11") - col("s1") * col("s1") / col("n")
    val c12 = col("s12") - col("s1") * col("s2") / col("n")
    val c22 = col("s22") - col("s2") * col("s2") / col("n")
    val c1y = col("s1y") - col("s1") * col("sy") / col("n")
    val c2y = col("s2y") - col("s2") * col("sy") / col("n")
    val cyy = col("syy") - col("sy") * col("sy") / col("n")
    val det = c11 * c22 - c12 * c12
    val b1 = (c1y * c22 - c2y * c12) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    m.select(col("n").cast("long").as("n_pairs"),
      round4eps((col("sy") - b1 * col("s1") - b2 * col("s2")) / col("n"))
        .as("intercept"),
      round4eps(b1).as("b_customer_mass"),
      round4eps(b2).as("b_supplier_mass"),
      round4eps(lit(1.0) - (cyy - b1 * c1y - b2 * c2y) / cyy).as("r2"))
  }
}
