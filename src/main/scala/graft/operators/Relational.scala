package graft.operators

import graft.Caching.CachingOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Core relational operator surface re-expressed Spark-first.
  *
  * Reference parity (SURVEY.md §2): the reference's entire declared query
  * set is scans (S5), project+rename (P1, README.md:372-381), COALESCE
  * null-normalization (P2, README.md:375-380), DATE truncation (P3,
  * README.md:381), one group-by aggregate (A1, README.md:390-399),
  * LIMIT (O1, README.md:297) and ORDER BY … DESC LIMIT n (O2,
  * extract_bitcoin_prices.py:203). Each is mapped here onto the driver
  * testdata tables so the DuckDB oracle can hash-check it; the
  * reference-faithful Bitcoin versions run in graft.pipeline.
  *
  * Scale notes (100 TB posture):
  *  - every query is a declarative DataFrame plan → Catalyst pushes
  *    filters/projections into the parquet scan (verified via
  *    .explain: PushedFilters / ReadSchema);
  *  - aggregates are partial (map-side) + final automatically
  *    (HashAggregateExec pair), so the shuffle carries only
  *    grouped partials, never raw rows;
  *  - sort+limit fuses to TakeOrderedAndProject — no global sort.
  *
  * Double-valued aggregate outputs are rounded to 4 decimals so the
  * driver's hash compare is insensitive to summation order (Spark
  * partial-agg tree vs DuckDB's single-node sum).
  */
object Relational {


  /** O1+deterministic order: first 10 lineitems by key. LIMIT alone is
    * non-deterministic across engines, so the oracle-able form orders by
    * the unique key first (TakeOrderedAndProjectExec — no global sort). */
  def scanLimit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(10)

  /** O2: the reference's verify query — latest 5 rows by timestamp
    * (extract_bitcoin_prices.py:203) — on events, with event_id as
    * tie-break for determinism. */
  def latestEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(5)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** P1: staging-style project+rename (README.md:372-381 renames
    * source→data_source etc.), mapped onto documents. */
  def projectRename(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id").as("document_id"),
      col("lang").as("language"),
      col("source").as("data_source"),
      col("n_chars"))

  /** P2+P3: COALESCE null-normalization + DATE() truncation, the staging
    * model's whole scalar surface (README.md:375-382), on events. */
  def coalesceNorm(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      col("user_id"),
      coalesce(col("value"), lit(0.0)).as("value_filled"),
      to_date(col("ts")).as("event_date"))

  /** A1: the daily mart aggregate (README.md:388-400) — grain
    * (date, source-ish key), measures min/max/avg/count — on events.
    * Partial agg happens map-side; the shuffle carries one row per
    * (date, event_type) per input partition. */
  def dailyMart(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"),
        round4eps(avg(col("value"))).as("avg_value"),
        count(lit(1)).as("records"))

  /** TPC-H Q1-shaped pricing summary: the canonical wide aggregate.
    * All measures compute in one pass over the scan; only
    * (returnflag, linestatus) partials shuffle. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round4eps(avg(col("l_extendedprice"))).as("avg_price"),
        round4eps(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Filter pushdown showcase: selective predicate + narrow projection.
    * .explain shows PushedFilters on l_shipdate/l_quantity and a
    * 4-column ReadSchema — at 100 TB this is the difference between
    * scanning 100 TB and scanning a few hundred GB. */
  def filteredAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_rows"))

  /** Set op: UNION ALL of two filtered projections then re-aggregate
    * (the reference's multi-source append, extract.py:150-193, is
    * semantically UNION ALL — SURVEY §2.8). */
  def unionSources(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("value"))
    purchases.unionByName(errors)
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("total_value"),
           count(lit(1)).as("n_events"))
  }

  /** DISTINCT aggregates: exact distinct counts (shuffled expand) —
    * the approx variant for 100 TB lives in approxDistinct. */
  def distinctCounts(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(col("event_type")).as("n_types"),
      count(lit(1)).as("n_events"))

  /** Grouping sets / rollup — beyond-reference but table-stakes for a
    * mart layer: per (date,type), per date, and grand total in one pass. */
  def rollupMart(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .rollup(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("records"), round(sum(col("value")), 4).as("total_value"))

  /** Approximate distinct counts (HyperLogLog++): the 100 TB default
    * for cardinality questions — one map-side-combinable sketch per
    * partition instead of the exact variant's shuffled expand. rsd=2%.
    * Not oracle-hashable (sketch estimates differ across engines);
    * the spec bounds its error against the exact counts. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).agg(
      approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"),
      approx_count_distinct(col("event_type"), 0.02).as("n_types_approx"),
      count(lit(1)).as("n_events"))

  /** Oracle-checkable error gate over [[approxDistinct]]: the HLL
    * estimate itself is sketch-implementation-specific (no cross-engine
    * hash), but its BOUNDED-ERROR property is checkable — compute both
    * the sketch and the exact count in one pass and assert the
    * relative error stays within 5% (2.5x the configured rsd=2%;
    * observed ≤0.4% on the test corpus). The oracle recomputes the
    * exact counts and replays the expected verdicts. */
  def approxDistinctGate(s: SparkSession, dir: String, relTol: Double = 0.05): DataFrame =
    Tables.events(s, dir).agg(
      countDistinct(col("user_id")).as("n_users_exact"),
      countDistinct(col("event_type")).as("n_types_exact"),
      count(lit(1)).as("n_events"),
      (abs(approx_count_distinct(col("user_id"), 0.02).cast("double")
          - countDistinct(col("user_id")))
        <= countDistinct(col("user_id")) * relTol).as("users_err_ok"),
      (abs(approx_count_distinct(col("event_type"), 0.02).cast("double")
          - countDistinct(col("event_type")))
        <= countDistinct(col("event_type")) * relTol).as("types_err_ok"))

  /** Mergeable-sketch gate (Apache DataSketches HLL, built into Spark
    * 4 as `hll_sketch_agg`/`hll_union_agg`): the property that makes
    * sketches THE 100 TB cardinality tool is that partial sketches are
    * persistable artifacts — build one per source/partition/day, union
    * them later, and the union of the parts IS the sketch of the whole
    * (register state is max-merge associative). This gate proves that
    * exactly: per-event-type sketches unioned must estimate IDENTICALLY
    * (not approximately — same registers, same estimate to the bit) to
    * one sketch built directly over the corpus, and that estimate must
    * sit within 5% of the exact distinct count. The estimates
    * themselves are sketch-implementation-specific, so (like
    * [[approxDistinctGate]]) the oracle replays the exact count and
    * the expected verdicts. */
  def hllUnionGate(s: SparkSession, dir: String, relTol: Double = 0.05): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"))
    val unioned = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union"))
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_direct"),
      countDistinct(col("user_id")).as("n_users_exact"))
    direct.crossJoin(unioned).select(
      col("n_users_exact"),
      (col("est_union") === col("est_direct")).as("union_eq_direct"),
      (abs(col("est_direct").cast("double") - col("n_users_exact"))
        <= col("n_users_exact") * relTol).as("est_err_ok"))
  }

  /** Population stability index — the standard data-drift monitor a
    * production pipeline runs between a reference cohort and the
    * current one (feature monitoring / training-serving skew): bin the
    * value range, compare the two cohorts' bin shares with
    * PSI = Σ (p−q)·ln(p/q). Cohorts here are the deterministic
    * even/odd event_id halves (scale-free stand-ins for
    * yesterday-vs-today snapshots); bins are `bins` fixed-width cells
    * over the per-type [min,max], with add-1 smoothing over the FULL
    * bin spine so empty cells contribute their smoothed mass instead
    * of silently vanishing (the spine is generated, not grouped — a
    * groupBy would drop absent bins and understate drift).
    *
    * Rule of thumb the output feeds: PSI < 0.1 stable, 0.1–0.25
    * moderate shift, > 0.25 investigate.
    *
    * Scale shape: one count aggregation per (type, bin), a broadcast
    * of the #types-row bounds, and a #types×bins spine join — nothing
    * scales with row count except the first aggregation. */
  def psiDrift(s: SparkSession, dir: String, bins: Int = 10): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        (col("event_id") % 2 === 0).as("is_ref"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val counts = ev.join(broadcast(bounds), "event_type")
      .withColumn("bin", when(col("hi") === col("lo"), lit(0)).otherwise(
        least(floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / bins)),
          lit(bins - 1))).cast("int"))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c_cur"))
    val spine = bounds.select(col("event_type"),
      explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val totals = counts.groupBy(col("event_type"))
      .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"))
    spine.join(counts, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("c_ref", "c_cur"))
      .join(broadcast(totals), "event_type")
      .withColumn("p", (col("c_ref") + lit(1.0)) / (col("n_ref") + lit(bins)))
      .withColumn("q", (col("c_cur") + lit(1.0)) / (col("n_cur") + lit(bins)))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        graft.functions.Rounding.round4eps(
          sum((col("p") - col("q")) * log(col("p") / col("q")))).as("psi"))
  }

  /** Salted high-cardinality aggregation — the skew pattern for keys
    * whose row counts are pathological at scale: stage 1 aggregates on
    * (key, salt) spreading one hot key over `salts` reducers, stage 2
    * merges the partials per key. Same result as a direct groupBy
    * (sum/count are associative), two small shuffles instead of one
    * skewed one. */
  def saltedTypeTotals(s: SparkSession, dir: String, salts: Int = 8): DataFrame =
    Tables.events(s, dir)
      .withColumn("_salt", pmod(hash(col("event_id")), lit(salts)))
      .groupBy(col("event_type"), col("_salt"))
      .agg(sum(col("value")).as("pv"), count(lit(1)).as("pc"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("pv")), 4).as("total_value"), sum(col("pc")).as("records"))

  /** CUBE: all grouping-set combinations of (date, type) in one pass —
    * the remaining multi-dimensional aggregate shape next to rollup. */
  def cubeMart(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .cube(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("records"), round(sum(col("value")), 4).as("total_value"))

  /** Exact continuous percentiles of event value per type —
    * `percentile` (exact linear interpolation, matching DuckDB
    * quantile_cont), not percentile_approx: the oracle hash-compares.
    * At 100 TB the approx sketch is the right default; exact is the
    * correctness anchor. */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.75)"), 4).as("p75"),
        count(col("value")).as("n_valued"))

  /** Statistical aggregate family: sample/population variance, stddev,
    * and Pearson correlation against event time. All single-pass
    * partial-mergeable aggregates (Catalyst computes them with the
    * same partial+final HashAggregate pair as sum/count — no second
    * scan); round4eps absorbs the summation-order ulp between Spark's
    * tree merge and DuckDB's sequential fold. */
  def statsAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round4eps(var_samp(col("value"))).as("var_value"),
        round4eps(stddev_samp(col("value"))).as("std_value"),
        round4eps(var_pop(col("value"))).as("varp_value"),
        round4eps(corr(col("value"),
          unix_timestamp(col("ts")).cast("double"))).as("corr_ts"),
        count(col("value")).as("n_valued"))

  /** Event types present in the testdata — pinned so the pivot schema
    * is static (a dynamic pivot would need a driver-side distinct scan
    * before planning; at 100 TB the value list is always declared). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: one column per event type with the day's summed value.
    * With explicit pivot values this is a single pass — a conditional
    * aggregate per output column, no extra shuffle beyond the groupBy. */
  def pivotDailyType(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .pivot("event_type", EventTypes)
      .agg(round(sum(col("value")), 4))

  /** GROUPING SETS: the explicit-sets sibling of rollup/cube — per
    * (date, type), per type, and grand total in ONE aggregation pass
    * (Expand + single shuffle), not three scans unioned. */
  def groupingSetsMart(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(to_date(col("ts")).as("event_date"), col("event_type"), col("value"))
      .groupingSets(
        Seq(Seq(col("event_date"), col("event_type")), Seq(col("event_type")), Seq()),
        col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("records"), round(sum(col("value")), 4).as("total_value"))

  /** FULL OUTER join: per-(user, day) purchase totals against error
    * totals — both sides aggregated BEFORE the join so the shuffle
    * carries one row per key per side, and the join keys coalesce. */
  def fullOuterDaily(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("event_date"),
        col("event_type"), col("value"))
    def side(t: String, out: String) =
      ev.filter(col("event_type") === t)
        .groupBy(col("user_id"), col("event_date"))
        .agg(round(sum(col("value")), 4).as(out))
    side("purchase", "purchase_value")
      .join(side("error", "error_value"), Seq("user_id", "event_date"), "full_outer")
  }

  /** INTERSECT (set semantics): users who both purchased and errored. */
  def intersectUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"))
    users("purchase").intersect(users("error"))
  }

  /** EXCEPT (set semantics): (user, day) pairs with a purchase but no
    * error that day. Plans as aggregate/anti-join on the composite key
    * — one shuffle, no distinct-then-join two-pass. (Keyed at day
    * grain deliberately: on this corpus every user has every event
    * TYPE, so a user-level except would compare empty against empty —
    * a gate that can't catch anything.) */
  def exceptUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def userDays(t: String) =
      ev.filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("d"))
    userDays("purchase").except(userDays("error"))
  }

  /** Correlated scalar subquery + EXISTS, through the SQL surface
    * (entry point C): customers above their segment's average balance
    * that have at least one order. Catalyst decorrelates both into
    * joins (the subquery rewrite 100 TB plans depend on — never a
    * per-row re-execution). */
  def subqueryCustomers(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer c2
                         WHERE c2.c_mktsegment = c.c_mktsegment)
        AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """)
  }

  /** Approximate quantiles (KLL-style sketch): the 100 TB companion to
    * the exact percentile query — mergeable fixed-size sketch per
    * partition instead of a full sort/collect of the group. No oracle
    * (DuckDB's approx_quantile is a different sketch); the exact
    * valuePercentiles query anchors correctness, this anchors the
    * sketch API. */
  def approxQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("approx_percentile(value, 0.5, 10000)"), 4).as("ap50"),
        round(expr("approx_percentile(value, 0.9, 10000)"), 4).as("ap90"),
        round(expr("approx_percentile(value, 0.99, 10000)"), 4).as("ap99"),
        count(col("value")).as("n_valued"))

  /** Oracle-checkable rank-error gate over [[approxQuantiles]]: a GK
    * sketch at accuracy 10000 guarantees rank error ≤ n/10000, so each
    * approximate percentile must land between the exact percentiles at
    * p ± 0.02 — a 100x margin. The sketch values themselves are
    * implementation-specific; the bounded-rank-error property is the
    * portable contract, asserted per group as a boolean the oracle
    * replays. */
  def approxQuantilesGate(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(col("value")).as("n_valued"),
        expr("approx_percentile(value, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(value, 0.9, 10000)").as("ap90"),
        expr("approx_percentile(value, 0.99, 10000)").as("ap99"),
        expr("percentile(value, 0.48)").as("lo50"),
        expr("percentile(value, 0.52)").as("hi50"),
        expr("percentile(value, 0.88)").as("lo90"),
        expr("percentile(value, 0.92)").as("hi90"),
        expr("percentile(value, 0.97)").as("lo99"),
        expr("percentile(value, 1.0)").as("hi99"))
      .select(col("event_type"), col("n_valued"),
        col("ap50").between(col("lo50"), col("hi50")).as("ok50"),
        col("ap90").between(col("lo90"), col("hi90")).as("ok90"),
        col("ap99").between(col("lo99"), col("hi99")).as("ok99"))

  /** Error-bound gate for the CUSTOM t-digest quantile sketch
    * (functions/TDigest.scala — the engine's own mergeable quantile
    * aggregate, vs approxQuantilesGate's builtin approx_percentile):
    * each estimated quantile must land inside a ±0.02 rank band of
    * the exact percentile — far looser than the sketch's theoretical
    * q(1−q)·4/δ rank error at δ = 100, so the gate is deterministic
    * under any partial-merge order while still failing a broken
    * estimator. */
  def tdigestQuantilesGate(s: SparkSession, dir: String): DataFrame = {
    val td = graft.functions.TDigestFunctions
      .tdigestQuantiles(col("value"), Seq(0.5, 0.9, 0.99))
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(col("value")).as("n_valued"),
        td.as("tq"),
        expr("percentile(value, 0.48)").as("lo50"),
        expr("percentile(value, 0.52)").as("hi50"),
        expr("percentile(value, 0.88)").as("lo90"),
        expr("percentile(value, 0.92)").as("hi90"),
        expr("percentile(value, 0.97)").as("lo99"),
        expr("percentile(value, 1.0)").as("hi99"))
      .select(col("event_type"), col("n_valued"),
        element_at(col("tq"), 1).between(col("lo50"), col("hi50")).as("ok50"),
        element_at(col("tq"), 2).between(col("lo90"), col("hi90")).as("ok90"),
        element_at(col("tq"), 3).between(col("lo99"), col("hi99")).as("ok99"))
  }

  /** Collecting aggregates: per-user distinct event types as a SORTED
    * csv (collect_set is unordered — sort before joining so output is
    * deterministic and portable), plus min_by (the value at the minimal
    * unique ordering key — argmin, deterministic because event_id is
    * unique). collect_set state is bounded by the value domain, not the
    * group size — safe at 100 TB for low-cardinality columns only. */
  def userTypeProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(",", sort_array(collect_set(col("event_type")))).as("types_csv"),
        size(collect_set(col("event_type"))).as("n_types"),
        min_by(col("event_type"), col("event_id")).as("first_type"),
        count(lit(1)).as("n_events"))

  /** Covariance family against event time — completes the two-variable
    * statistical aggregates next to corr in statsAgg. Same single-pass
    * partial-merge shape. */
  def covarAgg(s: SparkSession, dir: String): DataFrame = {
    val t = unix_timestamp(col("ts")).cast("double")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round4eps(covar_samp(col("value"), t)).as("covs_ts"),
        round4eps(covar_pop(col("value"), t)).as("covp_ts"),
        count(col("value")).as("n_valued"))
  }

  /** LATERAL correlated subquery through the SQL surface: top-2 orders
    * per customer, the "top-N related rows per outer row" idiom.
    * Catalyst decorrelates the lateral limit into a window/join plan —
    * no per-row subplan execution at any scale. */
  def lateralTopOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT c_custkey, o_orderkey, o_total
      FROM customer c,
      LATERAL (SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_total
               FROM orders WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """)
  }

  /** EXCEPT ALL — bag (multiset) difference, keeping surplus
    * multiplicity: event occurrences by purchase users minus error
    * users. The bag variants plan as one aggregation computing both
    * sides' counts, not a distinct-then-join. */
  def exceptAllUsers(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def users(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id"))
    users("purchase").exceptAll(users("error"))
  }

  /** CROSS JOIN (cartesian product) of the two smallest dimensions —
    * the one join type the matrix was missing; only ever sane when one
    * side is tiny, so the plan must be a broadcast nested loop. */
  def regionNationCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_name"))
      .crossJoin(Tables.nation(s, dir).select(col("n_name")))

  /** Two-pass standardization + outlier gate: per-type mean/stddev
    * aggregate (tiny — one row per type) broadcast back onto the fact
    * stream, flag |z| above the threshold. The aggregate side never
    * shuffles the fact table a second time — the join is a broadcast
    * of a handful of rows, so at 100 TB this is one fact scan + one
    * map-side join. z is eps-rounded BEFORE the threshold compare so
    * the flag is stable across engines' summation order. */
  def zscoreOutliers(s: SparkSession, dir: String, threshold: Double = 2.5): DataFrame = {
    val ev = Tables.events(s, dir)
    val stats = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean_v"), stddev_samp(col("value")).as("std_v"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", round4eps((col("value") - col("mean_v")) / col("std_v")))
      .filter(abs(col("z")) > threshold)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"), col("z"))
  }

  /** Fixed-width histogram of document lengths: bucket lower bound,
    * count, and per-bucket min/max — one partial-aggregated pass
    * (bucketing is a scalar floor, the groupBy key is dense and tiny). */
  def charHistogram(s: SparkSession, dir: String, width: Int = 100): DataFrame =
    Tables.documents(s, dir)
      .groupBy((floor(col("n_chars") / width) * width).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Fixed-width price histogram with a clamped top bucket: bucket id =
    * min(floor(price/width), buckets-1). The bucketing is a scalar
    * projection, so the aggregate is one partial-merged pass with a
    * ~`buckets`-row result — the distribution profile that sizes
    * range-partition boundaries before a 100 TB sort/write. */
  def priceHistogram(s: SparkSession, dir: String,
                     width: Double = 10000.0, buckets: Int = 10): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(least(floor(col("l_extendedprice") / width), lit(buckets - 1))
        .cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 4).as("sum_price"),
        round4eps(avg(col("l_extendedprice"))).as("avg_price"))

  /** Unpivot (wide→long melt) of the daily mart: each metric column
    * becomes a (metric, metric_value) row — the inverse of pivot,
    * via the native Dataset.unpivot operator (a Generate-based
    * row-expansion, no shuffle beyond the mart's own aggregate). */
  def unpivotDaily(s: SparkSession, dir: String): DataFrame =
    dailyMart(s, dir).unpivot(
      Array(col("event_date"), col("event_type")),
      Array(col("min_value"), col("max_value"), col("avg_value")),
      "metric", "metric_value")

  /** MAD-based robust outlier profile: per event type, values whose
    * absolute deviation from the median exceeds 3x the median absolute
    * deviation (MAD) — the standard robust alternative to z-scores
    * (zscoreOutliers), immune to the outliers inflating their own
    * threshold, which is what a curation gate wants on heavy-tailed
    * quality signals.
    *
    * Plan: two exact-percentile aggregation passes (median, then MAD of
    * deviations), each a tiny per-type result broadcast back onto the
    * events scan — the fact table is scanned twice, shuffled never
    * (both joins are broadcasts, both aggregates partial-merge to
    * #types rows). Exact percentile keeps the oracle bit-comparable
    * (same linear interpolation as DuckDB quantile_cont, proven by
    * q_percentiles); at 100 TB the drop-in scale path is
    * approx_percentile with documented error, same plan shape. */
  def madOutliers(s: SparkSession, dir: String, nMads: Double = 3.0): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mads = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mads), "event_type")
      .filter(col("adev") > lit(nMads) * col("mad"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
        round(min(col("value")), 4).as("min_outlier"),
        round(max(col("value")), 4).as("max_outlier"))
  }

  /** Winsorized statistics: per event type, values CLAMPED to the
    * [p05, p95] band before aggregating — the transformation sibling of
    * the outlier filters (madOutliers drops rows; winsorizing keeps
    * them at the boundary, the usual choice when the row itself is
    * valid and only the magnitude is suspect). Same plan shape:
    * exact-percentile aggregate → broadcast back → one clamped pass. */
  def winsorizedStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("clamped", greatest(col("lo"), least(col("hi"), col("value"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_valued"),
        round4eps(avg(col("clamped"))).as("avg_wins"),
        round(min(col("clamped")), 4).as("min_wins"),
        round(max(col("clamped")), 4).as("max_wins"),
        count(when(col("clamped") =!= col("value"), lit(1))).as("n_clamped"))
  }

  /** Global multi-column sort — the one ordering operator the hash
    * oracle cannot see (it sorts both sides before comparing), so the
    * ordering contract is asserted in RelationalExtSpec instead; the
    * gate checks content, the bench measures the sort. Spark executes
    * this as a RangePartitioning exchange (sampled split points) +
    * per-partition sort — the 100 TB total-order primitive (no single
    * reducer ever sees the whole data), and what a sorted-parquet
    * export rides on. */
  def globalSort(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))

  /** Linear-regression aggregates: value regressed on event time per
    * event type (slope = drift per second). The regr_* family is one
    * pass of partial-mergeable moment sums — the same shuffle shape as
    * any hash aggregate, so it scales like SUM, not like a solver. */
  def regrAgg(s: SparkSession, dir: String): DataFrame = {
    val t = unix_timestamp(col("ts")).cast("double")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round4eps(regr_slope(col("value"), t) * lit(1e6)).as("slope_us"),
        round4eps(regr_intercept(col("value"), t)).as("intercept"),
        round4eps(regr_r2(col("value"), t)).as("r2"),
        regr_count(col("value"), t).cast("long").as("n_pairs"))
  }

  /** Higher-moment shape statistics per event type. Spark's skewness /
    * kurtosis are the population g1 and excess-g2 moments computed with
    * single-pass stable recurrences; the oracle replays them two-pass
    * (mean join + central-moment averages), so agreement also validates
    * the numerics across summation orders. */
  def skewKurt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        round4eps(skewness(col("value"))).as("skew"),
        round4eps(kurtosis(col("value"))).as("kurt"),
        count(col("value")).as("n_valued"))

  /** TPC-H Q17 shape — small-quantity-order revenue for one brand
    * (`README.md` of the reference has no TPC-H surface; this is
    * beyond-reference analytics breadth). The classic formulation is a
    * correlated scalar subquery (avg quantity per part); the scalable
    * plan is its decorrelation: restrict lineitem to the brand's parts
    * FIRST (broadcast the brand key set — parts-of-one-brand is
    * dimension-sized), compute the per-part average once as a
    * partkey-keyed aggregate, and hash-join it back — never a per-row
    * subquery execution, and the full-table average work is skipped
    * for the ~99% of parts outside the brand. */
  def smallQtyRevenue(s: SparkSession, dir: String,
      brand: String = "Brand#1"): DataFrame = {
    val brandParts = Tables.part(s, dir)
      .filter(col("p_brand") === brand).select(col("p_partkey"))
    val brandLines = Tables.lineitem(s, dir)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val avgQty = brandLines.groupBy(col("l_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    brandLines.join(avgQty, "l_partkey")
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round4eps(sum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q18 shape — large-volume customers: orders whose summed
    * line quantity clears a threshold (the HAVING subquery), joined
    * back to orders and customers, top-k by order value. The
    * order-keyed quantity aggregate doubles as the semi-join filter —
    * one shuffle keyed by orderkey feeds both the HAVING and the join,
    * and the top-k is a TakeOrdered, never a global sort. */
  def largeVolumeCustomers(s: SparkSession, dir: String,
      minQty: Double = 180, k: Int = 100): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    Tables.orders(s, dir).join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(k)
  }

  /** Benford's-law conformance profile of order totals: observed
    * leading-digit frequencies vs the log-law expectation
    * P(d) = log10(1 + 1/d), with per-digit chi-square contributions
    * ((O_d - E_d)^2 / E_d on counts) — the standard fraud/synthetic-
    * data screen for financial magnitude columns. One map pass to the
    * leading digit, one 9-key aggregate, a broadcast of the scalar
    * total; constants are computed as ln(1+1/d)/ln(10) so the oracle
    * replays them bit-for-bit. */
  def benfordProfile(s: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 0)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"),
        1, 1).cast("int").as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("exp_frac_raw", log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      .withColumn("exp_n", col("exp_frac_raw") * col("total"))
      .select(col("digit"), col("n"),
        round4eps(col("n").cast("double") / col("total")).as("obs_frac"),
        round4eps(col("exp_frac_raw")).as("exp_frac"),
        round4eps((col("n") - col("exp_n")) * (col("n") - col("exp_n"))
          / col("exp_n")).as("chi2_term"))
  }

  /** 2-D skyline (Pareto frontier) — parts no other part dominates,
    * minimizing p_retailprice while maximizing p_size (Börzsönyi,
    * Kossmann & Stocker, ICDE 2001). The naive formulation is a
    * quadratic NOT-EXISTS self-join; the scalable plan is the
    * sort-sweep decomposition: (1) one aggregate collapses the table
    * to ndv(size) rows (best price per size), (2) a sweep over that
    * tiny frame keeps sizes whose best price strictly beats every
    * larger size's running minimum, (3) a broadcast join recovers the
    * winning rows. The table is touched exactly twice, both times as a
    * streamed scan — no self-join of the fact ever happens. The sweep
    * window runs over the post-aggregate frame (cardinality = distinct
    * sizes, bounded), not the raw table — a continuous dominance
    * dimension would be quantized or range-partition-swept the same
    * way. Ties: equal (size, price) rows don't dominate each other
    * (dominance is strict in at least one dimension), so all survive. */
  def skyline(s: SparkSession, dir: String): DataFrame = {
    val best = Tables.part(s, dir).groupBy(col("p_size"))
      .agg(min(col("p_retailprice")).as("best_price"))
    val sweep = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best
      .withColumn("better_above", min(col("best_price")).over(sweep))
      .filter(col("better_above").isNull ||
        col("best_price") < col("better_above"))
      .select(col("p_size").as("sky_size"), col("best_price"))
    Tables.part(s, dir)
      .join(broadcast(frontier), col("p_size") === col("sky_size") &&
        col("p_retailprice") === col("best_price"))
      .select(col("p_partkey"), col("p_size"),
        round4eps(col("p_retailprice")).as("price"))
  }

  /** ANALYZE-style table statistics in one pass — per numeric column:
    * value/null counts, exact NDV, min, max, mean. This is the stats
    * collection a cost-based optimizer feeds on, and the first thing a
    * data-quality sweep runs over a new 100 TB drop. All aggregates
    * for all columns ride ONE aggregation over one scan: Spark
    * rewrites the multi-column COUNT(DISTINCT) into a single Expand
    * (rows ×#cols tagged by group id) feeding one shuffle partitioned
    * by (gid, value) — evenly distributed, no per-column table scans.
    * The wide 1-row result is then unpivoted driver-free via `stack`. */
  def analyzeStats(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // r15 (guide §2.3): FOUR countDistinct aggregates in one Aggregate
    // forced the multi-distinct Expand rewrite — every fact row
    // duplicated 5× into the shuffle. Split instead into one
    // distinct-free pass for the moment stats plus one SINGLE-distinct
    // aggregate per column (each plans as a two-phase distinct with
    // NDV-bounded shuffle, no Expand), recombined with 1-row broadcast
    // cross joins. Same values, same output schema; Expand gone from
    // the plan (plans/r15/q_analyze_stats_{before,after}.txt).
    val momentAggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"),
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        round4eps(min(col(c))).as(s"${c}_min"),
        round4eps(max(col(c))).as(s"${c}_max"),
        round4eps(avg(col(c))).as(s"${c}_mean"))
    }
    val basic = Tables.lineitem(s, dir).agg(momentAggs.head,
      momentAggs.tail: _*)
    val withNdv = cols.foldLeft(basic) { (df, c) =>
      df.crossJoin(broadcast(Tables.lineitem(s, dir)
        .agg(countDistinct(col(c)).as(s"${c}_ndv"))))
    }
    val stackArgs = cols.map(c =>
      s"'$c', ${c}_n, ${c}_nulls, ${c}_ndv, ${c}_min, ${c}_max, ${c}_mean")
      .mkString(", ")
    withNdv.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(col_name, n_values, n_nulls, ndv, min_val, max_val, mean_val)")
  }

  /** Equi-depth histogram of order totals — the other half of CBO
    * statistics beside [[analyzeStats]] (equi-depth bounds per-bucket
    * selectivity error where equi-width collapses under skew; this is
    * the histogram ANALYZE actually stores). Bucket boundaries are the
    * exact interpolated k-quantiles, 1e-6-quantized so both engines
    * compare rows against bit-identical bounds; rows tie to the lower
    * bucket. Scale shape: one exact-percentile aggregate (production
    * swaps in approx_percentile, same plan shape), then a map-only
    * bucket assignment against the broadcast 7-value boundary array
    * and a k-row aggregate — the table is scanned twice, never
    * shuffled at row grain. */
  def equiDepthHist(s: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    import graft.functions.Rounding.round6eps
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = Tables.orders(s, dir)
      .agg(expr(s"percentile(o_totalprice, array(${probs.mkString(", ")}))")
        .as("bs"))
      .select(transform(col("bs"), b => round6eps(b)).as("bs"))
    Tables.orders(s, dir).crossJoin(broadcast(bounds))
      .select(col("o_totalprice").as("v"),
        (size(filter(col("bs"), b => col("o_totalprice") > b)) + 1).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round4eps(min(col("v"))).as("lo"),
        round4eps(max(col("v"))).as("hi"))
  }

  /** KMV distinct-count sketch over a join key ([[graft.functions.KmvMins]]):
    * estimate NDV(l_partkey) from the k smallest portable-md5 hash
    * values — the constant-state alternative to COUNT(DISTINCT) for
    * CBO cardinality stats at 100 TB (the exact path shuffles every
    * distinct key; the sketch's partials are k longs each and merge
    * losslessly). The exact NDV rides along as the verification
    * column — production drops it; here the gate asserts the estimate
    * lands within the sketch's analytic error, and the oracle replays
    * the mins deterministically as ORDER BY hash LIMIT k (KMV's output
    * is a pure function of the input set — no seed, no merge-order
    * dependence, unlike HLL registers). */
  def kmvDistinct(s: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val h = Tables.lineitem(s, dir).select(
      conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    h.agg(
        graft.functions.FreqSketchFunctions.kmvMins(col("h"), k).as("mins"),
        countDistinct(col("h")).as("exact_ndv"))
      .select(lit(k.toLong).as("k"),
        size(col("mins")).cast("long").as("n_retained"),
        round4eps(when(size(col("mins")) < k,
          size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("mins"), k).cast("double") / lit(math.pow(2.0, 60)))))
          .as("est_ndv"),
        col("exact_ndv"))
  }

  /** Per-day distinct-user KMV sketches — [[kmvDistinct]] grouped: one
    * k-long mergeable sketch PER GROUP, the shape a daily-actives
    * dashboard runs at 100 TB (the exact per-day COUNT(DISTINCT)
    * shuffles every (day, user) pair; the sketch shuffles k longs per
    * day regardless of traffic). The exact count rides along as the
    * verification column, same contract as the global variant; the
    * oracle replays each day's retained mins as a per-day
    * ORDER BY hash LIMIT k. */
  def kmvDaily(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val h = Tables.events(s, dir).select(to_date(col("ts")).as("d"),
      conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
    h.groupBy(col("d"))
      .agg(graft.functions.FreqSketchFunctions.kmvMins(col("h"), k).as("mins"),
        countDistinct(col("h")).as("exact_users"))
      .select(col("d"),
        size(col("mins")).cast("long").as("n_retained"),
        round4eps(when(size(col("mins")) < k,
          size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("mins"), k).cast("double") / lit(math.pow(2.0, 60)))))
          .as("est_users"),
        col("exact_users"))
      .orderBy(col("d"))
  }

  /** Full-batch logistic regression by gradient descent — predict
    * urgent order priority from the standardized order total. The
    * point is the iterative-optimization loop as an engine primitive
    * (the same dataflow as any distributed GD/L-BFGS fit): each round
    * is ONE aggregate over the corpus producing a constant-size
    * parameter row that broadcasts into the next round — never a
    * driver-side collect, never a per-row model join. Parameters are
    * 1e-6-quantized between rounds (the kmeans/PCA trick) so
    * cross-engine libm ulps can't compound across iterations, making
    * the whole fit oracle-replayable. The standardized input is
    * persisted once and re-streamed per round. */
  def logisticGd(s: SparkSession, dir: String,
      iters: Int = 3, lr: Double = 0.5): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val o = Tables.orders(s, dir).select(col("o_totalprice"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1.0))
        .otherwise(lit(0.0)).as("y"))
    val stats = o.agg(q6(avg(col("o_totalprice"))).as("mu"),
      q6(stddev_pop(col("o_totalprice"))).as("sigma"))
    val xy = o.crossJoin(broadcast(stats))
      .select(((col("o_totalprice") - col("mu")) / col("sigma")).as("x"),
        col("y"))
      .persistMemDisk
    def p: Column =
      lit(1.0) / (lit(1.0) + exp(-(col("w") * col("x") + col("b"))))
    var params = s.range(1).select(lit(0.0).as("w"), lit(0.0).as("b"))
    for (_ <- 1 to iters)
      params = xy.crossJoin(broadcast(params))
        .agg(q6(max(col("w")) - lit(lr) * avg((p - col("y")) * col("x"))).as("w"),
          q6(max(col("b")) - lit(lr) * avg(p - col("y"))).as("b"))
    xy.crossJoin(broadcast(params))
      .groupBy(col("w"), col("b"))
      .agg(round4eps(avg(-(col("y") * log(p) +
        (lit(1.0) - col("y")) * log(lit(1.0) - p)))).as("log_loss"),
        count(lit(1)).as("n"))
      .select(col("w"), col("b"), col("log_loss"), col("n"))
  }

  /** Boolean + bitwise aggregate suite: count_if / bool_and / bool_or
    * and bit_and / bit_or / bit_xor — all partial-mergeable single-pass
    * aggregates (XOR doubles as a cheap order-independent checksum for
    * partition-movement audits at scale). */
  def flagsAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count_if(col("l_discount") > 0.05).as("n_disc"),
        bool_and(col("l_quantity") > 0).as("all_pos_qty"),
        bool_or(col("l_tax") > 0.07).as("any_hi_tax"),
        bit_and(col("l_linenumber")).as("line_mask_and"),
        bit_or(col("l_linenumber")).as("line_mask_or"),
        bit_xor(col("l_orderkey")).as("key_xor"),
        count(lit(1)).as("n_rows"))

  /** Exact decimal aggregation: money as DECIMAL(12,2)/(12,4) instead
    * of DOUBLE — sums are exact and order-independent (integer
    * arithmetic underneath), the right type for a 100 TB ledger where
    * double summation drift compounds. Result cast back to DOUBLE only
    * for the cross-engine compare. */
  def decimalSums(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("price_d"),
        col("l_discount").cast("decimal(12,4)").as("disc_d"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("price_d")).cast("double").as("sum_price"),
        sum(col("disc_d")).cast("double").as("sum_disc"),
        min(col("price_d")).cast("double").as("min_price"),
        max(col("price_d")).cast("double").as("max_price"),
        count(lit(1)).as("n_rows"))

  /** Classifier evaluation suite — AUC plus thresholded
    * precision/recall/F1/accuracy for the urgent-priority label scored
    * by the raw order total (AUC is rank-based, so this equals the AUC
    * of any monotone 1-feature model fit on that score, including
    * [[logisticGd]]'s).
    *
    * The textbook AUC needs a GLOBAL rank of every row — a full sort
    * of the corpus. This computes the binned AUC instead: scores are
    * bucketed to fixed `binWidth` cells, per-bucket (n_pos, n_neg)
    * counts aggregate in one map-side-combined shuffle, and the
    * Mann–Whitney rank-sum runs as a window sweep over the BUCKET
    * table (ndv-sized, thousands of rows at any corpus size) with
    * average-rank tie handling. Counts are exact integers, so the
    * whole statistic is bit-deterministic until the single final
    * division. Binning error is bounded by bucket occupancy; shrink
    * `binWidth` to trade sweep size for fidelity.
    *
    * The confusion-matrix threshold is the q6-quantized global mean
    * score (one scalar aggregate, broadcast) — the same quantization
    * [[logisticGd]] uses to keep cross-engine ulps out of
    * comparisons. */
  def classifierEval(s: SparkSession, dir: String,
      binWidth: Double = 1000.0): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val scored = Tables.orders(s, dir).select(
      col("o_totalprice").as("score"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1L))
        .otherwise(lit(0L)).as("y"))
    val buckets = scored
      .groupBy(floor(col("score") / lit(binWidth)).cast("long").as("bucket"))
      .agg(sum(col("y")).as("n_pos"), sum(lit(1L) - col("y")).as("n_neg"))
    // global window bounded: input is the BUCKET aggregate
    // (score-range / binWidth cells), not the order rows
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = buckets
      .withColumn("n", col("n_pos") + col("n_neg"))
      .withColumn("cum", sum(col("n")).over(w) - col("n"))
      .select((col("n_pos") * (col("cum").cast("double") +
        (col("n").cast("double") + lit(1.0)) / lit(2.0))).as("pos_rank"),
        col("n_pos"), col("n_neg"))
    val aucRow = ranked.agg(
      sum(col("pos_rank")).as("rank_sum"),
      sum(col("n_pos")).as("p"), sum(col("n_neg")).as("n"))
      .select(round4eps((col("rank_sum") -
        col("p").cast("double") * (col("p").cast("double") + lit(1.0)) / lit(2.0))
        / (col("p").cast("double") * col("n").cast("double"))).as("auc_binned"),
        col("p").as("n_pos"), col("n").as("n_neg"))
    val thr = scored.agg(q6(avg(col("score"))).as("thr"))
    val cm = scored.crossJoin(broadcast(thr))
      .agg(
        sum(when(col("score") > col("thr") && col("y") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("score") > col("thr") && col("y") === 0, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("score") <= col("thr") && col("y") === 1, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("score") <= col("thr") && col("y") === 0, 1L)
          .otherwise(0L)).as("tn"))
    aucRow.crossJoin(broadcast(cm))
      .select(col("auc_binned"), col("n_pos"), col("n_neg"),
        round4eps(col("tp").cast("double") / (col("tp") + col("fp"))).as("precision"),
        round4eps(col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"),
        round4eps(lit(2.0) * col("tp") /
          (lit(2.0) * col("tp") + col("fp") + col("fn"))).as("f1"),
        round4eps((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"))
  }

  /** k-anonymity / l-diversity privacy audit over the customer table —
    * the pre-release re-identification screen a training-data pipeline
    * runs before shipping records keyed by quasi-identifiers.
    * QI = (market segment, nation); sensitive attribute = account
    * balance bucketed to $1000 cells. A QI group is k-anonymous when
    * ≥ k individuals share it and l-diverse when its members span ≥ l
    * distinct sensitive values — groups failing either are the
    * re-identification risks to generalize or suppress.
    * One shuffle keyed by the QI pair; the distinct-sensitive count is
    * Spark's two-phase partial-distinct aggregate. At 100 TB the group
    * count is bounded by the QI-domain product, not the corpus. */
  def kAnonymityProfile(s: SparkSession, dir: String,
      k: Int = 5, l: Int = 3): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket"))
      .groupBy(col("segment"), col("nationkey"))
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col("bal_bucket")).as("l_diversity"))
      .select(col("segment"), col("nationkey"), col("group_size"),
        (col("group_size") >= k).as("k_anonymous"),
        col("l_diversity"),
        (col("l_diversity") >= l).as("l_diverse"))
      .orderBy(col("segment"), col("nationkey"))

  /** t-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymityProfile]]'s k-anonymity and l-diversity: per
    * quasi-identifier group (segment, nationkey — the same QI
    * convention), the Earth-Mover's Distance between the group's
    * distribution of the ORDERED sensitive attribute (the acctbal
    * thousand-bucket) and the global one:
    * t = Σ_j |CumP_g(j) − CumP(j)| / (m − 1) over the m global bucket
    * values. A group can be k-anonymous and l-diverse yet leak through
    * a skewed sensitive distribution — exactly what t flags.
    *
    * Scale shape: one fact collapse to the (QI, bucket) grid, then a
    * generated-axis zero-fill (groups × buckets ≤ 125 × ~11 — constant)
    * and cumulative windows on that constant grid. Counts stay exact
    * integers until the final divisions; the t ≤ threshold verdict
    * compares QUANTIZED values. */
  def tClosenessProfile(s: SparkSession, dir: String,
      threshold: Double = 0.2): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("b"))
    val cells = base.groupBy(col("segment"), col("nationkey"), col("b"))
      .agg(count(lit(1)).as("c"))
    val groups = base.groupBy(col("segment"), col("nationkey"))
      .agg(count(lit(1)).as("n_g"))
    val glob = base.groupBy(col("b")).agg(count(lit(1)).as("cg"))
    val nAll = base.agg(count(lit(1)).as("n"))
    val m = glob.agg(count(lit(1)).as("m"))
    // zero-filled grid: every group x every GLOBAL bucket value
    val grid = groups.crossJoin(glob).crossJoin(broadcast(nAll))
      .crossJoin(broadcast(m))
      .join(cells, Seq("segment", "nationkey", "b"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wCum = Window.partitionBy(col("segment"), col("nationkey"))
      .orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_g",
        sum(col("c")).over(wCum).cast("double") / col("n_g").cast("double"))
      .withColumn("cum_all",
        sum(col("cg")).over(wCum).cast("double") / col("n").cast("double"))
      .groupBy(col("segment"), col("nationkey"), col("n_g"), col("m"))
      .agg(sum(abs(col("cum_g") - col("cum_all"))).as("emd_sum"))
      .select(col("segment"), col("nationkey"),
        col("n_g").as("group_size"),
        round4eps(col("emd_sum") / (col("m") - lit(1)).cast("double"))
          .as("t_closeness"))
      .withColumn("t_close", col("t_closeness") <= threshold)
      .orderBy(col("segment"), col("nationkey"))
  }

  /** Count-Min-sketch join-cardinality estimate — the sketch a
    * cost-based optimizer consults to SIZE a join before picking its
    * strategy, verified here against the exact answer. |A ⋈_k B| =
    * Σ_v cntA(v)·cntB(v); the CM estimate replaces the per-key count
    * vectors with depth×width bucket counts and takes
    * min_seed Σ_bucket cmA[s,b]·cmB[s,b] — an upper bound that tightens
    * as width grows (Cormode & Muthukrishnan 2005, §4.2).
    *
    * Scale posture: each sketch is ONE map-side-combined aggregate to
    * depth×width cells (constant state regardless of corpus size, no
    * key shuffle), and the estimate joins two sketch tables of a few
    * thousand rows — this is what makes it usable as a PLANNING step
    * at 100 TB, where the exact Σ cntA·cntB it replaces would cost a
    * full shuffle of both inputs. The bucket hash is the repo's
    * portable 60-bit md5 (Dedup.scala simhash convention) so the
    * oracle replays every cell exactly. Size `width` to the inputs:
    * the estimate overshoots by ≤ e·|A|·|B|/width with probability
    * 1 − e^(−depth), so width must exceed |A|·|B| / (acceptable
    * absolute error) — the default suits ~1e8 cross-products.
    *
    * The exact join count (the verification anchor) IS computed here
    * too — that part is gate-only; a production caller uses the
    * estimate alone. */
  def joinSizeEstimate(s: SparkSession, dir: String,
      width: Int = 16384, depth: Int = 4): DataFrame = {
    require(depth <= 4 && width <= (1 << 15),
      "bucket seeds are 15-bit slices of one 60-bit md5: depth <= 4, width <= 2^15")
    // ONE md5 per row; the 4 seed hashes are disjoint 15-bit slices of
    // the 60-bit digest (4x less hashing than per-seed md5 — measured
    // 5.8 s -> ~2 s on the sf0.1 bench — and DuckDB replays the slices
    // with integer div/mod).
    def sketch(df: DataFrame, key: String): DataFrame = {
      val sliced = (0 until depth).map(sd =>
        struct(lit(sd).as("seed"),
          (shiftrightunsigned(col("h"), 15 * sd) % width).as("bucket")))
      df.select(conv(substring(md5(col(key).cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
        .select(explode(array(sliced: _*)).as("sb"))
        .groupBy(col("sb.seed").as("seed"), col("sb.bucket").as("bucket"))
        .agg(count(lit(1)).as("n"))
    }
    val left = Tables.lineitem(s, dir).select(col("l_orderkey"))
    val right = Tables.orders(s, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val est = sketch(left, "l_orderkey")
      .join(sketch(right, "o_orderkey")
        .withColumnRenamed("n", "n_r"), Seq("seed", "bucket"))
      .groupBy(col("seed")).agg(sum(col("n") * col("n_r")).as("est"))
      .agg(min(col("est")).as("cms_estimate"))
    val exact = left.join(right, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("exact_rows"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_rows"), col("cms_estimate"),
        round4eps((col("cms_estimate") - col("exact_rows")).cast("double")
          / col("exact_rows")).as("rel_overestimate"))
  }

  /** Pairwise Pearson correlation matrix over lineitem's numeric
    * measures — the feature-redundancy screen run before any modeling
    * pass. All C(4,2)=6 correlations compute in ONE aggregate over one
    * scan (each corr is a partial-mergeable moment accumulator), so
    * the cost at 100 TB is a single map-side-combined pass — never
    * per-pair jobs. Output long-form (col_a, col_b, corr) for stable
    * hashing. */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round4eps(corr(col(a), col(b))).as(s"${a}__$b")
    }
    val wide = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"${a}__$b").as("corr"))
    }
    wide.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** Gini concentration of order revenue within each market segment —
    * "how unequal is customer spend" (the standard inequality
    * coefficient, computed by the sorted-rank identity
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending per-customer
    * totals). The scale-relevant shape: revenue first collapses to
    * per-customer totals (one custkey-keyed shuffle, corpus-sized
    * input → customer-sized output), and the rank window then runs
    * over the CUSTOMER table partitioned by segment — the same
    * aggregate-before-window economics as the skyline sweep. */
  def giniRevenue(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(sum(col("o_totalprice")).as("spend"))
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("spend"), col("c_custkey"))
    perCust
      .withColumn("rk", row_number().over(w))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_custs"),
        round4eps(
          lit(2.0) * sum(col("rk") * col("spend")) /
            (count(lit(1)) * sum(col("spend"))) -
            (count(lit(1)) + lit(1.0)) / count(lit(1))).as("gini"))
      .orderBy(col("segment"))
  }

  /** Temporal activity heatmap — events bucketed by (day-of-week ×
    * hour-of-day), the seasonality fingerprint behind capacity
    * planning and anomaly baselines. One 168-cell aggregate; the
    * day-of-week convention is pinned to ISO (1=Monday) explicitly
    * because engines disagree on the default (Spark dayofweek is
    * 1=Sunday) — convention drift here is the classic silent
    * cross-engine bug. */
  def timeHeatmap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        dayofweek(col("ts")).as("dow_sun1"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        round4eps(avg(col("value"))).as("avg_value"))
      .select(
        // ISO re-index: Sunday-1 → Monday-1
        ((col("dow_sun1") + lit(5)) % 7 + lit(1)).as("dow_iso"),
        col("hod"), col("n_events"), col("avg_value"))
      .orderBy(col("dow_iso"), col("hod"))

  /** Ship-delay distribution: days between order placement and line
    * shipment, bucketed weekly, with per-bucket revenue — the
    * fulfillment-latency histogram. The orderdate rides the
    * orderkey-keyed fact⋈fact join (the shuffle both sides already
    * need); the derived delay dimension is pure map-side arithmetic,
    * and the final rollup is a few dozen buckets. */
  def shipDelayHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(floor(datediff(col("l_shipdate"), col("o_orderdate")) / 7)
        .cast("long").as("delay_weeks"),
        col("l_extendedprice"), col("l_discount"))
      .groupBy(col("delay_weeks"))
      .agg(count(lit(1)).as("n_lines"),
        round4eps(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
      .orderBy(col("delay_weeks"))

  /** Classical additive seasonal decomposition of the daily event
    * series: observed = trend + seasonal + remainder, with trend a
    * centered 7-day moving average, the seasonal component the mean
    * detrended value per ISO day-of-week, and the remainder what's
    * left — the anomaly-detection baseline ("is Tuesday low, or is
    * EVERY Tuesday low?"). The whole decomposition runs over the
    * DAILY aggregate (365 rows/year regardless of event volume):
    * corpus-sized work is the one groupBy; everything after is
    * windows on a trivially small frame. Endpoint days average their
    * available neighbors (both engines agree under ROWS frames). */
  def seasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("n"))
    val byDate = Window.orderBy(col("d"))
    val trend = daily.withColumn("trend",
      avg(col("n")).over(byDate.rowsBetween(-3, 3)))
    val withSeason = trend
      .withColumn("dow", ((dayofweek(col("d")) + lit(5)) % 7 + lit(1)))
      .withColumn("seasonal",
        avg(col("n") - col("trend")).over(Window.partitionBy(col("dow"))))
    withSeason.select(col("d"),
        col("n").cast("long").as("n_events"),
        round4eps(col("trend")).as("trend"),
        round4eps(col("seasonal")).as("seasonal"),
        round4eps(col("n") - col("trend") - col("seasonal")).as("remainder"))
      .orderBy(col("d"))
  }

  /** ABC / Pareto classification: parts ranked by revenue, labeled A
    * while the cumulative share is under 80%, B under 95%, C after —
    * the inventory-prioritization standard ("which 20% of parts drive
    * 80% of revenue"). Revenue first collapses to part grain (the
    * only corpus-sized pass), then the cumulative-share window runs
    * over the PART table; the global order-by-revenue is the one
    * intentionally non-partitioned window here, bounded by part
    * cardinality, not fact volume. Boundary shares are grid-quantized
    * so an engine-ulp in the running sum can't flip a class label. */
  def abcParts(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev_raw"))
    // global window over the PART-grain rollup: dimension-cardinality
    // (catalog size), not fact-scaling; the corpus-sized pass is the
    // one groupBy above. A billion-part catalog would bucket the
    // cumulative sweep like sequencePack's two-phase prefix sum.
    val w = Window.orderBy(col("rev_raw").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = perPart.agg(sum(col("rev_raw")).as("total"))
    perPart.crossJoin(broadcast(total))
      .withColumn("cum_share", q6(sum(col("rev_raw")).over(w) / col("total")))
      .select(col("l_partkey"),
        round4eps(col("rev_raw")).as("revenue"),
        round4eps(col("cum_share")).as("cum_share"),
        when(col("cum_share") <= 0.80, "A")
          .when(col("cum_share") <= 0.95, "B")
          .otherwise("C").as("abc_class"))
      .orderBy(col("cum_share"), col("l_partkey"))
  }

  /** Level-shift (changepoint) screen over the daily event series:
    * for each day, the gap between the mean of the NEXT window and
    * the mean of the PREVIOUS window, normalized by the global std —
    * the monitoring query that flags "the metric stepped on the 14th"
    * (a two-sample mean-shift scan; peaks locate CUSUM-style
    * changepoints). All windows run over the daily aggregate. */
  def levelShifts(s: SparkSession, dir: String,
      window: Int = 7, topN: Int = 5): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("n"))
    val byDate = Window.orderBy(col("d"))
    val scored = daily
      .withColumn("mean_before",
        avg(col("n")).over(byDate.rowsBetween(-window, -1)))
      .withColumn("mean_after",
        avg(col("n")).over(byDate.rowsBetween(0, window - 1)))
      .withColumn("n_before",
        count(col("n")).over(byDate.rowsBetween(-window, -1)))
      .withColumn("n_after",
        count(col("n")).over(byDate.rowsBetween(0, window - 1)))
      .filter(col("n_before") === window && col("n_after") === window)
      .crossJoin(broadcast(daily.agg(q6(stddev_pop(col("n"))).as("sigma"))))
      .select(col("d"),
        round4eps(col("mean_before")).as("mean_before"),
        round4eps(col("mean_after")).as("mean_after"),
        round4eps((col("mean_after") - col("mean_before")) / col("sigma"))
          .as("shift_sigmas"))
    scored.orderBy(abs(col("shift_sigmas")).desc, col("d")).limit(topN)
  }

  /** RFM segmentation — every CRM's first clustering: customers
    * scored 1–5 by Recency (days since last order, newer = higher),
    * Frequency (order count) and Monetary (total spend) quintiles,
    * concatenated into the segment code ("555" = best).
    *
    * Scale shape (the [[equiDepthHist]] percentile-boundary pattern,
    * replacing three global `ntile(5)` windows — each of which was a
    * single-partition sort of the full customer table): one
    * orders→customer collapse (the only corpus-sized shuffle), then
    * ONE aggregate computes all twelve exact quintile boundaries
    * (production swaps in approx_percentile, same plan), and scoring
    * is a map-side comparison against the broadcast 3×4 boundary
    * array — no corpus-scaling frame is ever sorted on one task.
    * Boundaries AND the monetary value are 1e-6-quantized so both
    * engines bin against bit-identical bounds; a value equal to a
    * boundary ties to the LOWER score (strict `>` advances). Quintile
    * semantics are boundary-binning (all ties share a score) rather
    * than ntile's forced-equal-buckets — the statistically standard
    * definition, and the only one that exists without a global sort. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(datediff(max(to_date(col("o_orderdate"))),
          lit(java.sql.Date.valueOf("1970-01-01"))).as("rec_days"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice")).as("monetary_raw"))
      .withColumn("monetary_q6", q6(col("monetary_raw")))
    val ps = "array(0.2, 0.4, 0.6, 0.8)"
    val bounds = perCust.agg(
        expr(s"percentile(rec_days, $ps)").as("rb"),
        expr(s"percentile(frequency, $ps)").as("fb"),
        expr(s"percentile(monetary_q6, $ps)").as("mb"))
    def score(v: Column, bs: Column): Column =
      size(filter(bs, b => v > b)) + 1
    perCust
      .crossJoin(broadcast(bounds))
      .select(col("o_custkey").as("custkey"),
        score(col("rec_days").cast("double"), transform(col("rb"), b => q6(b))).as("r_score"),
        score(col("frequency").cast("double"), transform(col("fb"), b => q6(b))).as("f_score"),
        score(col("monetary_q6"), transform(col("mb"), b => q6(b))).as("m_score"),
        round4eps(col("monetary_raw")).as("monetary"))
      .withColumn("rfm",
        concat(col("r_score"), col("f_score"), col("m_score")))
      .select(col("custkey"), col("r_score"), col("f_score"), col("m_score"),
        col("rfm"), col("monetary"))
      .orderBy(col("custkey"))
  }

  /** Two-sample Kolmogorov–Smirnov drift test between the first and
    * second half-month of event values — the nonparametric
    * distribution-shift gold standard next to the binned PSI gate.
    * Values are quantized to a 0.01 grid, so the ECDF sweep runs over
    * GRID CELLS (bounded, thousands) rather than a corpus-sized sort
    * — the same scale trick as the binned AUC — and the statistic is
    * computed in INTEGER cross-multiplied form
    * (D = max |cumA·N_B − cumB·N_A|, then one division), so engines
    * can't disagree on a float comparison anywhere inside the max.
    * (At 1e12-row samples the cross products outgrow a long — switch
    * the two cum columns to DECIMAL(38,0) there.) */
  def ksDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(floor(col("value") * 100).cast("long").as("cell"),
        (dayofmonth(col("ts")) <= 15).as("is_a"))
    val cells = ev.groupBy(col("cell"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
    val w = Window.orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = cells
      .withColumn("cum_a", sum(col("n_a")).over(w))
      .withColumn("cum_b", sum(col("n_b")).over(w))
    val totals = cells.agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    swept.crossJoin(broadcast(totals))
      .select(col("cell"), col("tot_a"), col("tot_b"),
        abs(col("cum_a") * col("tot_b") - col("cum_b") * col("tot_a")).as("d_int"))
      .agg(max(struct(col("d_int"), (-col("cell")).as("neg_cell"))).as("m"),
        max(col("tot_a")).as("n_a"), max(col("tot_b")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (-col("m.neg_cell")).as("argmax_cell"),
        round4eps(col("m.d_int").cast("double") /
          (col("n_a") * col("n_b"))).as("ks_stat"))
  }

  /** Per-brand price elasticity of demand: the OLS slope of
    * ln(quantity) on ln(price) over a brand's order lines — the
    * constant-elasticity model's exponent, THE pricing-analytics
    * regression. Closed-form slope Σ(x−x̄)(y−ȳ)/Σ(x−x̄)² computed as
    * one moment aggregate per brand (E[xy], E[x], E[y], E[x²] — all
    * partial-mergeable; never a per-brand fit loop). */
  def priceElasticity(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(col("p_brand"),
        log(col("l_extendedprice") / col("l_quantity")).as("x"), // unit price
        log(col("l_quantity")).as("y"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        round4eps((avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))) /
          (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))))
          .as("elasticity"))
      .orderBy(col("p_brand"))

  /** Two-proportion z-test — the A/B experimentation primitive: users
    * deterministically split into arms by id parity, success = a
    * purchase event, z = (p̂₁−p̂₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) under the
    * pooled null. Counts are exact integers (one map-side-combined
    * aggregate over the corpus), so everything up to the final
    * formula is bit-deterministic; on an id-parity split of uniform
    * synthetic traffic the z-score SHOULD hover near 0 — the gate
    * checks the machinery, the spec checks the null behaves. */
  def abTest(s: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(s, dir)
      .select((col("user_id") % 2 === 0).as("arm_a"),
        (col("event_type") === "purchase").as("success"))
      .groupBy(col("arm_a"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("success"), 1L).otherwise(0L)).as("k"))
    val a = arms.filter(col("arm_a")).select(col("n").as("n1"), col("k").as("k1"))
    val b = arms.filter(!col("arm_a")).select(col("n").as("n2"), col("k").as("k2"))
    a.crossJoin(b)
      .withColumn("p1", col("k1").cast("double") / col("n1"))
      .withColumn("p2", col("k2").cast("double") / col("n2"))
      .withColumn("p_pool",
        (col("k1") + col("k2")).cast("double") / (col("n1") + col("n2")))
      .select(col("n1"), col("k1"), col("n2"), col("k2"),
        round4eps(col("p1")).as("p_a"),
        round4eps(col("p2")).as("p_b"),
        round4eps((col("p1") - col("p2")) /
          sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / col("n1") + lit(1.0) / col("n2")))).as("z_score"))
  }

  /** Kaplan–Meier survival curve over SESSION durations — "how long
    * does a session live", with the estimator's defining feature:
    * sessions still open near the corpus end are RIGHT-CENSORED
    * (their true duration is only known to exceed the observation),
    * entering the at-risk denominator but never the death count —
    * what a naive duration ECDF gets wrong. Sessions use the
    * registry's 30-min-gap convention; duration is whole minutes.
    * S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ), computed as exp(Σ ln(1−dᵢ/nᵢ)) so
    * the cumulative product is one running-sum window over the
    * DISTINCT-duration frame (minutes-bounded, never
    * session-bounded). The sessionization window is the one
    * corpus-sized pass. */
  def kaplanMeier(s: SparkSession, dir: String,
      gapSec: Long = 1800L, censorSec: Long = 3600L): DataFrame = {
    val ev = Tables.events(s, dir)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec,
        1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val corpusEnd = ev.agg(max(col("ts")).as("max_ts"))
    val durations = sess.crossJoin(broadcast(corpusEnd))
      .select(floor((unix_timestamp(col("s_end")) -
        unix_timestamp(col("s_start"))) / 60).cast("long").as("t"),
        (unix_timestamp(col("max_ts")) - unix_timestamp(col("s_end")) <
          censorSec).as("censored"))
    val total = durations.agg(count(lit(1)).as("n_sessions"))
    val byT = durations.groupBy(col("t"))
      .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("ended"))
    // global window bounded: input is the per-DURATION aggregate
    // (ndv of observed second-grain durations, censor-capped)
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(total))
      .withColumn("n_at_risk",
        col("n_sessions") - (sum(col("ended")).over(w) - col("ended")))
      .filter(col("d") > 0)
      // the final death time can have d = n (everyone remaining dies):
      // factor 0 ends the curve at exactly S=0, which exp-of-log-sum
      // can't express — carry zero factors as a separate running flag
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n_at_risk"))
      .withColumn("hit_zero",
        sum(when(col("factor") <= 0, 1L).otherwise(0L)).over(w))
      .withColumn("surv", when(col("hit_zero") > 0, lit(0.0)).otherwise(
        exp(sum(when(col("factor") > 0, log(col("factor")))
          .otherwise(lit(0.0))).over(w))))
      .select(col("t").as("duration_min"), col("d").as("n_ended"),
        col("n_at_risk"),
        round4eps(col("surv")).as("survival"))
      .orderBy(col("duration_min"))
  }

  /** Rolling 7-day correlation between purchase and error daily
    * volumes — the co-movement monitor ("do failures track load?").
    * Daily counts pivot to two aligned series (one corpus-sized
    * groupBy), then `corr` runs AS A WINDOW AGGREGATE over the
    * trailing week of the daily frame — Pearson is scale-free, so the
    * sample/population convention cancels and both engines agree up
    * to ulps, absorbed by the grid rounding. Full windows only
    * (partial-week correlations are noise). */
  def rollingCorr(s: SparkSession, dir: String,
      windowDays: Int = 7): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("double").as("purchases"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .cast("double").as("errors"))
    // global window bounded: DAILY grain (365 rows/year)
    val w = Window.orderBy(col("d")).rowsBetween(-(windowDays - 1), 0)
    daily
      .withColumn("n_days", count(lit(1)).over(w))
      .withColumn("r", corr(col("purchases"), col("errors")).over(w))
      .filter(col("n_days") === windowDays)
      .select(col("d"), col("purchases").cast("long").as("purchases"),
        col("errors").cast("long").as("errors"),
        round4eps(col("r")).as("rolling_corr"))
      .orderBy(col("d"))
  }

  /** Leakage-safe K-fold target encoding — the standard categorical
    * feature for tabular/LLM-adjacent training data (encode a category
    * by its target mean) done WITHOUT label leakage: each fold's
    * encoding is computed from the OTHER folds only
    * (out-of-fold mean), with additive smoothing toward the
    * out-of-fold GLOBAL mean so rare categories shrink to the prior
    * (Micci-Barreca, SIGKDD Explorations 2001):
    *   enc(c, f) = (Σ_{g≠f} sum_cg + m · prior_oof(f))
    *             / (Σ_{g≠f} n_cg + m).
    * Folds are deterministic (custkey mod K) so the gate replays.
    *
    * Scale shape: ONE corpus-sized shuffle collapses orders to the
    * (category × fold) grid (#categories·K cells — KB at any corpus);
    * category totals, fold totals and the global total all derive from
    * that grid, and every join after the collapse is a broadcast of a
    * ≤K·#categories-row frame. The leakage-safe subtraction
    * (total − own fold) avoids ever materializing K copies of the
    * corpus — the naive "re-aggregate excluding each fold" plan is K
    * scans; this is one. */
  def targetEncode(s: SparkSession, dir: String, folds: Int = 5,
      smoothing: Double = 10.0): DataFrame = {
    val cf = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("category"),
        (col("o_custkey") % folds).cast("int").as("fold"),
        col("o_totalprice").as("y"))
      .groupBy(col("category"), col("fold"))
      .agg(sum(col("y")).as("s"), count(lit(1)).as("n"))
      .persistMemDisk
    val cat = cf.groupBy(col("category"))
      .agg(sum(col("s")).as("cs"), sum(col("n")).as("cn"))
    val perFold = cf.groupBy(col("fold"))
      .agg(sum(col("s")).as("fs"), sum(col("n")).as("fn"))
    val tot = cf.agg(sum(col("s")).as("ts"), sum(col("n")).as("tn"))
    cf.join(broadcast(cat), "category")
      .join(broadcast(perFold), "fold")
      .crossJoin(broadcast(tot))
      .select(col("category"), col("fold"),
        (col("cn") - col("n")).as("n_oof"),
        round4eps(((col("cs") - col("s")) +
            lit(smoothing) * ((col("ts") - col("fs")) / (col("tn") - col("fn")))) /
          ((col("cn") - col("n")) + lit(smoothing))).as("encoded"))
      .orderBy(col("category"), col("fold"))
  }

  /** Order-independent table fingerprints — "did the 100 TB copy
    * arrive intact" without sorting either side: each row hashes to a
    * 60-bit portable value (same first-15-hex-of-md5 mapping as the
    * KMV sketch) and a table's fingerprint is the BIT_XOR of its row
    * hashes — commutative and associative, so the aggregate is
    * partition-order- and merge-order-independent by construction and
    * two engines/warehouses can compare fingerprints without any
    * global ordering. XOR self-cancels rows duplicated an EVEN number
    * of times, so the row count rides along (count + xor differing ⇒
    * content differs; the classic replication-audit pairing). Columns
    * in the canonical string are restricted to types with one textual
    * form in every engine (ints, strings, dates) — float formatting is
    * engine-specific and has no place in a portability fingerprint.
    * One map-side-combined aggregate per table: partials are a single
    * long each. */
  private[graft] def fingerprint(df: DataFrame, table: String,
      canon: Column): DataFrame =
    df.select(conv(substring(md5(canon), 1, 15), 16, 10)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_fp"))
      .select(lit(table).as("tbl"), col("n_rows"), col("xor_fp"))

  def tableFingerprints(s: SparkSession, dir: String): DataFrame = {
    def fp(df: DataFrame, table: String, canon: Column): DataFrame =
      fingerprint(df, table, canon)
    fp(Tables.customer(s, dir), "customer",
        concat_ws("|", col("c_custkey"), col("c_name")))
      .unionByName(fp(Tables.orders(s, dir), "orders",
        concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority"))))
      .unionByName(fp(Tables.lineitem(s, dir), "lineitem",
        concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"))))
      .orderBy(col("tbl"))
  }

  /** Weighted median unit price per brand — percentile with a
    * FREQUENCY argument (each row counts `weight` times), the
    * quantity-weighted location every pricing report wants where the
    * unweighted median over-counts small orders. Spark's
    * `percentile(v, p, freq)` computes the exact interpolated quantile
    * of the replicated multiset WITHOUT materializing copies — the
    * oracle proves the semantics by actually replicating each row
    * `weight` times in DuckDB and taking quantile_cont. Values are
    * 1e-6-quantized BEFORE the percentile so both engines interpolate
    * over bit-identical multisets; the unweighted median rides along
    * to show the weighting bias. */
  def weightedMedian(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    // r15: examined for a value-collapse pre-aggregation (guide §2.3 —
    // aggregate before you shuffle); MEASURED and REJECTED: this
    // corpus's unit price is near-unique per line (598 437 distinct v
    // over 600 000 rows at sf0.1), so a (brand, v) pre-aggregate
    // collapses nothing and just adds an exchange (2.40 → 2.52 s).
    // The exact Percentile maps are the honest cost of an exact
    // weighted median; left as is.
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        q6(col("l_extendedprice") / col("l_quantity")).as("v"),
        col("l_quantity").cast("int").as("w"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        round4eps(expr("percentile(v, 0.5, w)")).as("weighted_median"),
        round4eps(expr("percentile(v, 0.5)")).as("plain_median"))
      .orderBy(col("p_brand"))
  }

  /** Inter-arrival statistics per event type — mean gap and its
    * coefficient of variation over each user's consecutive same-type
    * events: cv ≈ 1 is Poisson (memoryless traffic), cv >> 1 is bursty
    * sessions, cv << 1 is a scheduler's heartbeat — the traffic-shape
    * screen capacity planning reads first. Gaps come from one
    * user+type-keyed lag window (integer seconds, engines agree
    * exactly); moments collapse per type. */
  def interArrival(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("t"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"), col("event_id"))
      .withColumn("gap", col("t") - lag(col("t"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round4eps(avg(col("gap"))).as("mean_gap_sec"),
        round4eps(stddev_pop(col("gap")) / avg(col("gap"))).as("cv"))
      .orderBy(col("event_type"))
  }

  /** Trimmed mean per event type — the robust-location sibling of
    * [[winsorized stats]]: rows OUTSIDE the exact [p05, p95] value
    * band are DROPPED (winsorizing clamps them) before averaging, the
    * estimator metrics dashboards quote when a handful of instrumented
    * outliers would drag a plain mean. Two passes: one per-type exact-
    * percentile aggregate (bounds 1e-6-quantized, broadcast back) and
    * one filtered mean — never a per-type sort. Boundary rows tie
    * INSIDE the band (>=, <=) in both engines. */
  def trimmedMean(s: SparkSession, dir: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(q6(expr(s"percentile(value, $lo)")).as("lo_v"),
        q6(expr(s"percentile(value, $hi)")).as("hi_v"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("kept", col("value") >= col("lo_v") &&
        col("value") <= col("hi_v"))
      .groupBy(col("event_type"), col("lo_v"), col("hi_v"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        round4eps(avg(when(col("kept"), col("value")))).as("trimmed_mean"),
        round4eps(avg(col("value"))).as("plain_mean"))
      .orderBy(col("event_type"))
  }

  /** Referential-integrity audit — orphan rates for the schema's
    * foreign keys: child rows whose FK value has no parent (the data-
    * quality receipt behind [[graft.plans.Constraints.declareForeignKey]]
    * — declare only what this reports clean). Each dependency is one
    * LEFT ANTI join counting orphans; the parent key set broadcasts
    * (dimension- or orderkey-grain), the child is streamed once —
    * never a full outer join materializing matches. */
  def riAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(child: DataFrame, childName: String, fk: String,
        parent: DataFrame, parentName: String, pk: String): DataFrame = {
      val total = child.agg(count(lit(1)).as("n_child"))
      child.join(broadcast(parent.select(col(pk))),
          col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .crossJoin(broadcast(total))
        .select(lit(childName).as("child"), lit(fk).as("fk"),
          lit(parentName).as("parent"), col("n_child"), col("n_orphans"),
          round4eps(col("n_orphans").cast("double") / col("n_child"))
            .as("orphan_share"))
    }
    audit(Tables.lineitem(s, dir), "lineitem", "l_orderkey",
        Tables.orders(s, dir), "orders", "o_orderkey")
      .unionByName(audit(Tables.lineitem(s, dir), "lineitem", "l_partkey",
        Tables.part(s, dir), "part", "p_partkey"))
      .unionByName(audit(Tables.orders(s, dir), "orders", "o_custkey",
        Tables.customer(s, dir), "customer", "c_custkey"))
      .orderBy(col("child"), col("fk"))
  }

  /** Join-key skew profile — the pre-shuffle diagnostic behind "will
    * this key straggle": per candidate shuffle key, cardinality, the
    * hottest key's row count, the p99 per-key count, and the skew
    * ratio max/mean (the multiple of the average reducer the hottest
    * reducer would carry under hash partitioning). >10 says salt or
    * rely on AQE skew-join; ~1 says the shuffle balances itself. One
    * key-grained aggregate per profiled column, partials map-side —
    * the profile never costs more than the shuffle it predicts. */
  def skewProfile(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    def prof(df: DataFrame, table: String, key: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("ndv"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_rows"),
          q6(expr("percentile(c, 0.99)")).as("p99_rows"))
        .select(lit(table).as("tbl"), lit(key).as("key"),
          col("n_rows"), col("ndv"), col("max_rows"), col("p99_rows"),
          round4eps(col("max_rows") /
            (col("n_rows").cast("double") / col("ndv"))).as("skew_ratio"))
    prof(Tables.lineitem(s, dir), "lineitem", "l_orderkey")
      .unionByName(prof(Tables.lineitem(s, dir), "lineitem", "l_partkey"))
      .unionByName(prof(Tables.lineitem(s, dir), "lineitem", "l_suppkey"))
      .unionByName(prof(Tables.orders(s, dir), "orders", "o_custkey"))
      .unionByName(prof(Tables.events(s, dir), "events", "user_id"))
      .orderBy(col("tbl"), col("key"))
  }

  /** Functional-dependency audit — does lhs → rhs hold, and how badly
    * not: for each candidate dependency, the share of lhs keys mapping
    * to MORE than one rhs value. The data-profiling primitive behind
    * key discovery, denormalization checks ("is nation really
    * determined by customer?") and the audit side of
    * [[graft.plans.Constraints]] declarations. One countDistinct
    * aggregate per dependency — each is a single (lhs)-keyed shuffle
    * with map-side partials; no pair of rows is ever compared. */
  def fdProfile(s: SparkSession, dir: String): DataFrame = {
    def fd(df: DataFrame, table: String, lhs: String, rhs: String): DataFrame =
      df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("ndv"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(table).as("tbl"), lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_keys"), col("n_violating"),
          round4eps(col("n_violating").cast("double") / col("n_keys"))
            .as("violation_share"))
    fd(Tables.orders(s, dir), "orders", "o_orderkey", "o_custkey")
      .unionByName(fd(Tables.orders(s, dir), "orders",
        "o_custkey", "o_orderpriority"))
      .unionByName(fd(Tables.lineitem(s, dir), "lineitem",
        "l_orderkey", "l_suppkey"))
      .unionByName(fd(Tables.customer(s, dir), "customer",
        "c_custkey", "c_mktsegment"))
      .orderBy(col("tbl"), col("lhs"), col("rhs"))
  }

  /** Theil–Sen robust trend per event type — the median-of-pairwise-
    * slopes estimator (Theil 1950, Sen 1968): immune to the outlier
    * days that wreck OLS (one traffic spike tilts a least-squares
    * trend; it moves one slope out of hundreds here). Intercept is the
    * companion median of (y − slope·d).
    *
    * Scale shape: the corpus collapses to the DAILY grain first (one
    * shuffle); pair enumeration is a self-join of that ≤days-sized
    * frame per type — C(31,2) pairs per month-type, bounded by the
    * calendar, not the corpus. Slopes are exact rationals of integer
    * counts over integer day gaps; only the final medians are
    * float-interpolated, 1e-6-quantized for the oracle. */
  def theilSenTrend(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("1970-01-01")))
          .as("d"))
      .agg(count(lit(1)).as("y"))
      .persistMemDisk
    val a = daily.select(col("event_type"), col("d").as("di"), col("y").as("yi"))
    val b = daily.select(col("event_type"), col("d").as("dj"), col("y").as("yj"))
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("di") < col("dj"))
      .select(col("event_type"),
        ((col("yj") - col("yi")).cast("double") /
          (col("dj") - col("di"))).as("slope"))
    val sen = slopes.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        q6(expr("percentile(slope, 0.5)")).as("sen_slope"))
    daily.join(broadcast(sen), "event_type")
      .groupBy(col("event_type"), col("n_pairs"), col("sen_slope"))
      .agg(count(lit(1)).as("n_days"),
        round4eps(expr("percentile(y - sen_slope * d, 0.5)"))
          .as("intercept"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        round4eps(col("sen_slope")).as("sen_slope"), col("intercept"))
      .orderBy(col("event_type"))
  }

  /** CDC compaction — collapse a change stream to final state by
    * last-writer-wins, the merge-on-read collapse every CDC-fed lake
    * table runs (Delta CDF apply / Hudi compaction): the event stream
    * read as a per-user change feed ('signup'/'view'/'click'/
    * 'purchase' upsert the value, 'error' deletes the key), ordered by
    * (ts, event_id). Keys whose LAST op is a delete are absent from
    * the output — tombstone semantics.
    *
    * Scale shape: ONE key-partitioned aggregate — the argmax is
    * max(struct(ts, event_id, …)), partial-merged map-side, so the
    * shuffle carries one candidate record per key per map task
    * regardless of change volume; never a window, never a sort. The
    * row-at-a-time MERGE formulation of the same collapse costs one
    * join per batch — this is the set-based form that amortizes a
    * whole feed in one pass. */
  def cdcCompact(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          col("event_type").as("op"), col("value")).as("rec"))
      .groupBy(col("user_id"))
      .agg(max(col("rec")).as("last"), count(lit(1)).as("n_ops"))
      .filter(col("last.op") =!= "error") // tombstoned keys drop out
      .select(col("user_id"),
        round4eps(col("last.value")).as("last_value"),
        unix_timestamp(col("last.ts")).as("last_ts"),
        col("last.event_id").as("last_event"),
        col("n_ops"))
      .orderBy(col("user_id"))

  /** Autocorrelation function of daily order revenue at lags 1..7 —
    * the seasonality screen run before fitting any forecast (a weekly
    * cycle shows as a lag-7 spike). acf(k) = Σ(x_t−x̄)(x_{t−k}−x̄) /
    * Σ(x_t−x̄)² with the full-series mean.
    *
    * Scale shape: the corpus collapses to the DAILY grain in one
    * shuffle; the lag window orders that calendar-bounded frame
    * (≤ a few thousand rows at ANY corpus size — the date range, not
    * the row count, is the bound), and all seven lags come from ONE
    * window sort. Daily sums are 4-decimal-quantized before the
    * moments so cross-engine summation order can't leak into the
    * ratio. */
  def revenueAcf(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    // calendar-bounded frame: one row per day
    val w = Window.orderBy(col("d"))
    val lagged = (1 to maxLag).foldLeft(daily) { (df, k) =>
      df.withColumn(s"l$k", lag(col("rev"), k).over(w))
    }.persistMemDisk
    val mu = lagged.agg(avg(col("rev")).as("mu"))
    val withMu = lagged.crossJoin(broadcast(mu))
    val aggs =
      sum((col("rev") - col("mu")) * (col("rev") - col("mu"))).as("denom") +:
      (1 to maxLag).map { k =>
        sum(when(col(s"l$k").isNotNull,
          (col("rev") - col("mu")) * (col(s"l$k") - col("mu")))).as(s"n$k")
      }
    val moments = withMu.agg(aggs.head, aggs.tail: _*)
    val stacked = (1 to maxLag).map(k =>
      s"$k, n$k / denom").mkString(", ")
    moments.selectExpr(s"stack($maxLag, $stacked) as (lag, acfraw)")
      .select(col("lag"), round4eps(col("acfraw")).as("acf"))
      .orderBy(col("lag"))
  }

  /** Weight-of-evidence / information-value screen for a candidate
    * feature against a binary target (quantity buckets vs the return
    * flag) — the credit-scoring-era feature triage that still runs
    * before any model build: per-bucket WoE = ln((gᵢ/G)/(bᵢ/B)) and
    * total IV = Σ(gᵢ/G − bᵢ/B)·WoEᵢ (< 0.02 ⇒ the feature carries no
    * signal). One bucket-keyed count, then arithmetic on the
    * buckets-bounded frame; ratios come from exact integer counts. */
  def woeIv(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.lineitem(s, dir)
      .select(least(floor((col("l_quantity") - 1) / 10), lit(4))
        .cast("long").as("bucket"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("bad"))
      .groupBy(col("bucket"))
      .agg(sum(lit(1L) - col("bad")).as("ng"), sum(col("bad")).as("nb"))
      .persistMemDisk
    val t = b.agg(sum(col("ng")).as("tg"), sum(col("nb")).as("tb"))
    val share = (col("ng") / col("tg")) - (col("nb") / col("tb"))
    val woe = log((col("ng") / col("tg")) / (col("nb") / col("tb")))
    val iv = b.crossJoin(broadcast(t))
      .agg(round4eps(sum(share * woe)).as("iv_total"))
    b.crossJoin(broadcast(t)).crossJoin(broadcast(iv))
      .select(col("bucket"), col("ng").as("n_good"), col("nb").as("n_bad"),
        round4eps(woe).as("woe"), col("iv_total"))
      .orderBy(col("bucket"))
  }

  /** ML feature table at (customer, month) grain: revenue with lag-1,
    * lag-3 and trailing-3-month-mean features plus a tenure index —
    * the leakage-safe feature-engineering shape (every feature uses
    * strictly PRIOR or current rows; nothing reaches forward). All
    * windows are customer-keyed; the gate restricts to a fixed key
    * range so the oracle output stays reviewable. */
  def featureTable(s: SparkSession, dir: String, maxCust: Long = 30L):
      DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cm = Tables.orders(s, dir)
      .filter(col("o_custkey") <= maxCust)
      .groupBy(col("o_custkey").as("custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"),
        count(lit(1)).as("n_orders"))
    val w = Window.partitionBy(col("custkey")).orderBy(col("month"))
    cm.select(col("custkey"), col("month"), col("rev"), col("n_orders"),
      lag(col("rev"), 1).over(w).as("rev_lag1"),
      lag(col("rev"), 3).over(w).as("rev_lag3"),
      round4eps(avg(col("rev"))
        .over(w.rowsBetween(-2, 0))).as("rev_ma3"),
      row_number().over(w).cast("long").as("month_idx"))
      .orderBy(col("custkey"), col("month"))
  }

  /** Pareto concentration of customer revenue WITHOUT the global
    * ordered cumsum the naive 80/20 query needs (a corpus-scaling
    * single-partition sort): exact percentile BOUNDARIES of the
    * customer-revenue distribution (p90, p99) come from one aggregate;
    * the shares above each boundary are map-side compares — the
    * [[equiDepthHist]] discipline applied to concentration reporting.
    * (The exact-percentile aggregate buffers the customer-grain values
    * in its single group; at billions of customers the boundaries come
    * from approx_percentile or [[hashSampleQuantiles]]'s reservoir —
    * the share arithmetic downstream is unchanged.) */
  def paretoShare(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
      .persistMemDisk
    val bounds = cust.agg(
      expr("percentile(rev, 0.9)").as("p90"),
      expr("percentile(rev, 0.99)").as("p99"))
    cust.crossJoin(broadcast(bounds))
      .agg(count(lit(1)).as("n_customers"),
        round4eps(max(col("p90"))).as("p90_rev"),
        round4eps(max(col("p99"))).as("p99_rev"),
        round4eps(sum(when(col("rev") > col("p90"), col("rev")).otherwise(0.0))
          / sum(col("rev"))).as("top10_share"),
        round4eps(sum(when(col("rev") > col("p99"), col("rev")).otherwise(0.0))
          / sum(col("rev"))).as("top1_share"))
  }

  /** Lines-per-order histogram — the basket-width distribution (the
    * companion to [[Joins.orderCountDistribution]]'s orders-per-
    * customer): one orderkey-keyed count, then a histogram bounded by
    * the max basket width. The shape every join-cost estimate over
    * order-grain data starts from. */
  def linesPerOrder(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
      .groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_lines"))

  /** New-vs-repeat revenue split per month — the acquisition/retention
    * decomposition of the top line (a flat total can hide collapsing
    * acquisition propped up by repeat spend). A customer's FIRST order
    * is a user-keyed min broadcast back; the month rollup is
    * calendar-bounded. */
  def newVsRepeat(s: SparkSession, dir: String): DataFrame = {
    val first = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("fd"))
    Tables.orders(s, dir)
      .join(first, "o_custkey")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(
        sum(when(col("o_orderdate") === col("fd"), 1L).otherwise(0L))
          .as("n_first_orders"),
        count(lit(1)).as("n_orders"),
        round4eps(sum(when(col("o_orderdate") === col("fd"),
          col("o_totalprice")).otherwise(0.0))).as("new_revenue"),
        round4eps(sum(when(col("o_orderdate") =!= col("fd"),
          col("o_totalprice")).otherwise(0.0))).as("repeat_revenue"))
      .orderBy(col("month"))
  }

  /** Durbin–Watson statistic on mean-centered daily revenue — the
    * serial-correlation screen for regression residuals (DW ≈ 2 means
    * uncorrelated; < 1 says successive days co-move and OLS standard
    * errors lie). One daily collapse; the lag runs over the
    * calendar-bounded series. */
  def durbinWatson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
    val mu = daily.agg(avg(col("rev")).as("mu"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    daily.crossJoin(broadcast(mu))
      .select(col("d"), (col("rev") - col("mu")).as("e"))
      .withColumn("pe", lag(col("e"), 1).over(w))
      .agg(round4eps(
        sum(when(col("pe").isNotNull,
          (col("e") - col("pe")) * (col("e") - col("pe")))) /
          sum(col("e") * col("e"))).as("dw"),
        count(lit(1)).as("n_days"))
  }

  /** Partial correlation of quantity↔price CONTROLLING for discount —
    * r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)): does the raw
    * association survive removing the confounder, the one-step
    * multivariate upgrade over [[corrMatrix]]-style pairwise reads.
    * Three single-pass moment correlations, closed-form combine. */
  def partialCorr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("rxy"),
        corr(col("l_quantity"), col("l_discount")).as("rxz"),
        corr(col("l_extendedprice"), col("l_discount")).as("ryz"),
        count(lit(1)).as("n"))
      .select(round4eps(col("rxy")).as("r_xy"),
        round4eps((col("rxy") - col("rxz") * col("ryz")) /
          sqrt((lit(1.0) - col("rxz") * col("rxz")) *
            (lit(1.0) - col("ryz") * col("ryz")))).as("r_xy_given_z"),
        col("n"))

  /** Spearman rank correlation of quantity↔discount WITHOUT ranking
    * any rows: both columns collapse to their value distributions
    * first (NDV-bounded — 50 and 11 distinct values here), average
    * ranks come from cumulative counts over those bounded frames, and
    * ρ is a count-WEIGHTED Pearson over the ≤ NDVₓ·NDV_y joint
    * histogram. The [[mannWhitney]] discipline applied to correlation:
    * at 100 TB the only corpus-touching steps are three keyed counts. */
  def spearmanCorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranks(c: String, alias: String) = {
      val w = Window.orderBy(col(alias)) // NDV-bounded frame
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.lineitem(s, dir)
        .groupBy(col(c).as(alias)).agg(count(lit(1)).as(s"n_$alias"))
        .withColumn(s"r_$alias",
          coalesce(sum(col(s"n_$alias")).over(w), lit(0L)) +
            (col(s"n_$alias") + 1) / lit(2.0))
    }
    val j = Tables.lineitem(s, dir)
      .groupBy(col("l_quantity").as("xv"), col("l_discount").as("yv"))
      .agg(count(lit(1)).as("n"))
    val w = j.join(broadcast(ranks("l_quantity", "xv")), "xv")
      .join(broadcast(ranks("l_discount", "yv")), "yv")
      .select(col("n"), col("r_xv"), col("r_yv"))
      .persistMemDisk
    val m = w.agg(sum(col("n")).as("tn"),
      (sum(col("n") * col("r_xv")) / sum(col("n"))).as("mx"),
      (sum(col("n") * col("r_yv")) / sum(col("n"))).as("my"))
    w.crossJoin(broadcast(m))
      .agg(round4eps(
        sum(col("n") * (col("r_xv") - col("mx")) * (col("r_yv") - col("my"))) /
          sqrt(sum(col("n") * (col("r_xv") - col("mx")) *
            (col("r_xv") - col("mx"))) *
            sum(col("n") * (col("r_yv") - col("my")) *
              (col("r_yv") - col("my"))))).as("spearman_rho"),
        max(col("tn")).as("n"))
  }

  /** Kendall τ-b of quantity↔discount from the JOINT HISTOGRAM — the
    * O(n²) pair enumeration the textbook formula implies never touches
    * rows: concordant/discordant weights are cell-count products over
    * the ≤ NDVₓ·NDV_y cell pairs (≈150k comparisons here regardless of
    * corpus size), and the tie terms come from the marginal group
    * sizes. Counts stay exact longs at any tested scale; at extreme
    * row counts (cell products beyond 2⁶³) swap the weights to
    * DECIMAL — τ is a ratio, the structure is unchanged. */
  def kendallTau(s: SparkSession, dir: String): DataFrame = {
    val j = Tables.lineitem(s, dir)
      .groupBy(col("l_quantity").as("xv"), col("l_discount").as("yv"))
      .agg(count(lit(1)).as("n"))
      .persistMemDisk
    val tot = j.agg(sum(col("n")).as("tn"))
    val n1 = j.groupBy(col("xv")).agg(sum(col("n")).as("g"))
      .agg(sum(col("g") * (col("g") - 1) / 2).as("n1"))
    val n2 = j.groupBy(col("yv")).agg(sum(col("n")).as("g"))
      .agg(sum(col("g") * (col("g") - 1) / 2).as("n2"))
    val a = j.select(col("xv").as("ax"), col("yv").as("ay"), col("n").as("an"))
    val b = j.select(col("xv").as("bx"), col("yv").as("by"), col("n").as("bn"))
    val pairs = a.join(b,
        col("ax") < col("bx") ||
          (col("ax") === col("bx") && col("ay") < col("by")))
      .select((col("an") * col("bn")).as("w"),
        when((col("ax") < col("bx") && col("ay") < col("by")) ||
          (col("ax") > col("bx") && col("ay") > col("by")), 1)
          .when((col("ax") < col("bx") && col("ay") > col("by")) ||
            (col("ax") > col("bx") && col("ay") < col("by")), -1)
          .otherwise(0).as("sgn"))
    pairs.agg(
        sum(when(col("sgn") === 1, col("w")).otherwise(0L)).as("nc"),
        sum(when(col("sgn") === -1, col("w")).otherwise(0L)).as("nd"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(n1))
      .crossJoin(broadcast(n2))
      .select(round4eps((col("nc") - col("nd")).cast("double") /
          sqrt((col("tn") * (col("tn") - 1) / lit(2.0) - col("n1")) *
            (col("tn") * (col("tn") - 1) / lit(2.0) - col("n2"))))
          .as("kendall_tau_b"),
        col("nc").as("n_concordant"), col("nd").as("n_discordant"))
  }

  /** Tukey IQR fences per event type: [q1 − 1.5·IQR, q3 + 1.5·IQR]
    * outlier counts — the box-plot screen next to the z-score
    * ([[zscoreOutliers]]) and MAD variants (each flags a different
    * contamination shape). Quantiles come from one grouped aggregate;
    * the fence compare is a broadcast join back — both engines
    * interpolate identical sorted inputs, so the fences are
    * bit-identical before any compare. (Exact per-type quantiles
    * buffer each type's values; the 100 TB fence source is
    * approx_percentile / the [[graft.functions.HashReservoir]]
    * sketch — fences are thresholds, not exact statistics.) */
  def iqrFences(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.25)").as("q1raw"),
        expr("percentile(value, 0.75)").as("q3raw"))
    Tables.events(s, dir)
      .join(broadcast(q), "event_type")
      .groupBy(col("event_type"), col("q1raw"), col("q3raw"))
      .agg(
        sum(when(col("value") <
          col("q1raw") - (col("q3raw") - col("q1raw")) * 1.5, 1L)
          .otherwise(0L)).as("n_low"),
        sum(when(col("value") >
          col("q3raw") + (col("q3raw") - col("q1raw")) * 1.5, 1L)
          .otherwise(0L)).as("n_high"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        round4eps(col("q1raw")).as("q1"), round4eps(col("q3raw")).as("q3"),
        col("n_low"), col("n_high"), col("n"))
      .orderBy(col("event_type"))
  }

  /** Simpson's-paradox audit: the sign of the overall
    * quantity↔unit-price correlation vs its sign WITHIN each brand —
    * the classic aggregation trap (a relationship that reverses once a
    * confounder is conditioned on must never be read off the pooled
    * number). One fact pass computes the pooled moment aggregate; the
    * per-brand correlations are a single keyed aggregate; the flip
    * count compares signs on a brand-bounded frame (group |corr|
    * measured ≥ 0.45 here — sign compare is far from any float
    * boundary). */
  def simpsonAudit(s: SparkSession, dir: String): DataFrame = {
    val j = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").as("q"),
        (col("l_extendedprice") / col("l_quantity")).as("unit"))
      .persistMemDisk
    val overall = j.agg(corr(col("q"), col("unit")).as("oc"))
    j.groupBy(col("p_brand")).agg(corr(col("q"), col("unit")).as("c"))
      .crossJoin(broadcast(overall))
      .agg(round4eps(max(col("oc"))).as("overall_corr"),
        count(lit(1)).as("n_groups"),
        sum(when(signum(col("c")) =!= signum(col("oc")), 1L).otherwise(0L))
          .as("n_flipped"))
  }

  /** Deterministic negative sampling for recommender/contrastive
    * training: per customer, `keep` parts they never bought, drawn by
    * a hash-indexed pseudo-random sequence — membership is a pure
    * function of (custkey, draw index), so the "random" negatives are
    * reproducible run-to-run and engine-to-engine (the property that
    * makes training data auditable; cf. the [[hashSampleQuantiles]]
    * reservoir). Draw 12 candidates, anti-join the positives, keep the
    * first 3 by draw order. All joins are keyed on (customer, part);
    * candidate volume is customers × draws — a constant fan-out. */
  def negativeSample(s: SparkSession, dir: String, maxCust: Long = 20L,
      draws: Int = 12, keep: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bought = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("p"))
      .distinct()
    val mx = Tables.part(s, dir).agg(max(col("p_partkey")).as("mp"))
    val cand = Tables.customer(s, dir)
      .filter(col("c_custkey") <= maxCust)
      .select(col("c_custkey").as("custkey"),
        explode(sequence(lit(1), lit(draws))).as("draw"))
      .crossJoin(broadcast(mx))
      .select(col("custkey"), col("draw"),
        (conv(substring(md5(concat(col("custkey").cast("string"), lit("#"),
          col("draw").cast("string"))), 1, 15), 16, 10).cast("long")
          % col("mp") + 1).as("p"))
    cand.join(bought, Seq("custkey", "p"), "left_anti")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("custkey")).orderBy(col("draw"))))
      .filter(col("rk") <= keep)
      .select(col("custkey"), col("draw").cast("long").as("draw"),
        col("p").as("neg_partkey"))
      .orderBy(col("custkey"), col("draw"))
  }

  /** Hash-bucket (delete-one-group) jackknife standard error for the
    * mean order price — the distributed answer to "what's the
    * uncertainty on this aggregate" when a closed form isn't at hand:
    * rows land in 32 deterministic hash buckets, the leave-one-out
    * means come from ONE grouped pass plus the global sums, and the
    * SE is the classic (k−1)/k-scaled spread of the LOO estimates.
    * No resampling pass over the data, no RNG state — the replicate
    * structure is a pure function of the keys. */
  def jackknifeSE(s: SparkSession, dir: String, buckets: Int = 32): DataFrame = {
    val b = Tables.orders(s, dir).select(col("o_totalprice").as("v"),
      (conv(substring(md5(col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long") % buckets).as("g"))
    val grp = b.groupBy(col("g"))
      .agg(sum(col("v")).as("sg"), count(lit(1)).as("ng"))
      .persistMemDisk
    val tot = grp.agg(sum(col("sg")).as("sv"), sum(col("ng")).as("n"))
    val loo = grp.crossJoin(broadcast(tot))
      .select(col("sv"), col("n"),
        ((col("sv") - col("sg")) / (col("n") - col("ng"))).as("mu_i"))
    val mbar = loo.agg(avg(col("mu_i")).as("mbar"))
    loo.crossJoin(broadcast(mbar))
      .agg(
        round4eps(max(col("sv") / col("n"))).as("mean_price"),
        round4eps(sqrt((count(lit(1)) - lit(1.0)) / count(lit(1)) *
          sum((col("mu_i") - col("mbar")) * (col("mu_i") - col("mbar")))))
          .as("jackknife_se"),
        count(lit(1)).as("n_buckets"))
  }

  /** Wald–Wolfowitz runs test on daily revenue vs its median — the
    * randomness screen (too FEW runs = sticky regimes/trend, too MANY
    * = oscillation; |z| < 2 ⇒ consistent with independence). Days
    * equal to the median are excluded (standard two-sample coding).
    * The daily collapse is the only corpus-scan; the run count is one
    * lag over the calendar-bounded series; the z is closed-form in
    * exact integer counts. */
  def runsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
      .persistMemDisk
    val med = daily.agg(expr("percentile(rev, 0.5)").as("m"))
    val signed = daily.crossJoin(broadcast(med))
      .filter(col("rev") =!= col("m"))
      .select(col("d"), when(col("rev") > col("m"), 1L).otherwise(0L).as("sgn"))
    val w = Window.orderBy(col("d")) // calendar-bounded frame
    val agg = signed
      .withColumn("nr", when(lag(col("sgn"), 1).over(w).isNull ||
        col("sgn") =!= lag(col("sgn"), 1).over(w), 1L).otherwise(0L))
      .agg(sum(col("nr")).as("runs"), sum(col("sgn")).as("n1"),
        (count(lit(1)) - sum(col("sgn"))).as("n2"))
    val (r, n1, n2) = (col("runs").cast("double"),
      col("n1").cast("double"), col("n2").cast("double"))
    agg.select(col("runs").as("n_runs"), col("n1").as("n_above"),
      col("n2").as("n_below"),
      round4eps((r - (n1 * n2 * 2 / (n1 + n2) + 1)) /
        sqrt(n1 * n2 * 2 * (n1 * n2 * 2 - n1 - n2) /
          ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))).as("z_score"))
  }

  /** Schema-on-read profiling of the `props` JSON payload column: one
    * typed parse per row (from_json with an explicit schema — N
    * JSONPath extractions would re-parse N times), then a per-type
    * profile of the extracted field (null share, ndv, bounds, mean).
    * The pattern every semi-structured event pipeline starts with:
    * pin the payload's actual shape before trusting it. */
  def propsProfile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("j", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("j.k").isNull.cast("long")).as("n_null_k"),
        countDistinct(col("j.k")).as("ndv_k"),
        min(col("j.k")).as("min_k"),
        max(col("j.k")).as("max_k"),
        round4eps(avg(col("j.k"))).as("avg_k"))
      .orderBy(col("event_type"))

  /** Dense calendar × type grid with zero-filled counts — the report
    * shape dashboards need (a day with no errors must PLOT as 0, not
    * vanish; gaps silently disappear from a plain GROUP BY). The spine
    * is generated (sequence + explode from one 2-value scalar row ×
    * the bounded type dim), never scanned; the fact side collapses to
    * the daily grain before the left join. */
  def calendarFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val bounds = ev.agg(to_date(min(col("ts"))).as("d0"),
      to_date(max(col("ts"))).as("d1"))
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val daily = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    days.crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Recency-weighted popularity: per event type, Σ decay^(days before
    * the corpus max day) — yesterday counts 0.9×, last week ~0.48×.
    * The freshness-aware ranking signal (trending vs merely big). One
    * scalar for the anchor day, then a single map-side weight per row
    * into a type-keyed aggregate; the decayed sum partials combine
    * map-side like any sum. */
  def recencyPopularity(s: SparkSession, dir: String,
      decay: Double = 0.9): DataFrame = {
    val ev = Tables.events(s, dir)
    val maxDay = ev.agg(to_date(max(col("ts"))).as("dmax"))
    ev.crossJoin(broadcast(maxDay))
      .select(col("event_type"),
        pow(lit(decay), datediff(col("dmax"), to_date(col("ts"))))
          .as("w"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round4eps(sum(col("w"))).as("decay_score"))
      .orderBy(col("decay_score").desc, col("event_type"))
  }

  /** Per-type quantiles from the [[graft.functions.HashReservoir]]
    * sketch, with the exact quantiles as the error anchor. The sketch
    * is the 100 TB path — exact per-group percentiles buffer every row
    * of the group, while the reservoir carries k (value, hash) pairs
    * per partial and merges like any aggregate; membership is a pure
    * function of the input set (k smallest md5-hashes), so the sample
    * quantiles are exactly reproducible and the DuckDB oracle replays
    * them verbatim with ORDER BY hash LIMIT k. The exact side here is
    * the gate's comparison anchor, not the production plan. */
  def hashSampleQuantiles(s: SparkSession, dir: String,
      k: Int = 128): DataFrame = {
    val h = conv(substring(md5(col("event_id").cast("string")), 1, 15),
      16, 10).cast("long")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(graft.functions.FreqSketchFunctions
          .hashReservoir(h, col("value"), k).as("sample"),
        round4eps(expr("percentile(value, 0.5)")).as("p50_exact"),
        round4eps(expr("percentile(value, 0.95)")).as("p95_exact"))
      .select(col("event_type"), col("p50_exact"), col("p95_exact"),
        explode(col("sample")).as("v"))
      .groupBy(col("event_type"), col("p50_exact"), col("p95_exact"))
      .agg(count(lit(1)).as("n_sample"),
        round4eps(expr("percentile(v, 0.5)")).as("p50_sample"),
        round4eps(expr("percentile(v, 0.95)")).as("p95_sample"))
      .select(col("event_type"), col("n_sample"),
        col("p50_sample"), col("p95_sample"),
        col("p50_exact"), col("p95_exact"))
      .orderBy(col("event_type"))
  }

  /** Holt's linear (double) exponential smoothing over daily revenue
    * with a 7-day-ahead forecast — the workhorse short-horizon
    * forecaster between naive-last-value and a full seasonal model:
    *   l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}),
    *   b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1},  ŷ(T+h) = l_T + h·b_T.
    *
    * Scale split (same contract as the Markov gate): the corpus
    * collapses to the daily grain DISTRIBUTED; the recurrence is
    * inherently sequential and calendar-bounded, so it runs on the
    * driver over the collected series (guarded — a series that scales
    * with rows rather than the calendar aborts loudly). Inputs are
    * 4-decimal-quantized and every level/trend 1e-6-quantized, so a
    * DuckDB recursive CTE reproduces the identical trajectory. */
  def holtForecast(s: SparkSession, dir: String, alpha: Double = 0.5,
      beta: Double = 0.3, horizon: Int = 7): DataFrame = {
    def q6(v: Double): Double = math.floor(v * 1e6 + 0.5 + 1e-6) / 1e6
    def q4(v: Double): Double = math.floor(v * 1e4 + 0.5 + 1e-6) / 1e4
    val xs = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("x"))
      .orderBy(col("d"))
      .collect().map(_.getDouble(1))
    require(xs.length >= 2 && xs.length <= 100000,
      s"holtForecast: ${xs.length} daily points — expected a " +
        "calendar-bounded series")
    var l = xs(0); var b = q6(xs(1) - xs(0))
    var t = 1
    while (t < xs.length) {
      val nl = q6(alpha * xs(t) + (1 - alpha) * (l + b))
      b = q6(beta * (nl - l) + (1 - beta) * b)
      l = nl
      t += 1
    }
    import s.implicits._
    (1 to horizon).map(h => (h, q4(l + h * b))).toDF("h", "forecast")
  }

  /** Rolling 7-day EXACT median of daily order revenue — the robust
    * smoother (a single spike day moves a 7-day mean by 1/7 of the
    * spike; it moves the median not at all). The window is CALENDAR
    * based — each day joins the days in [d−6, d] — so data gaps
    * shorten the window honestly instead of silently reaching further
    * back the way a ROWS frame would.
    *
    * Scale shape: the corpus collapses to the daily grain first; the
    * range self-join and percentile run on the calendar-bounded frame
    * (≤ days × 7 rows at ANY corpus size). Daily sums are quantized
    * before the median so both engines interpolate identical inputs. */
  def rollingMedianRevenue(s: SparkSession, dir: String,
      windowDays: Int = 7): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round4eps(sum(col("o_totalprice"))).as("rev"))
      .persistMemDisk
    val win = daily.select(col("d").as("wd"), col("rev").as("wrev"))
    daily.join(win,
        datediff(col("d"), col("wd")).between(0, windowDays - 1))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_days"),
        round4eps(expr("percentile(wrev, 0.5)")).as("rolling_median"))
      .orderBy(col("d"))
  }

  /** Leakage-safe TEMPORAL split with an embargo gap — train strictly
    * before `trainEnd`, test strictly from `testStart`, and the days
    * between quarantined (the purged/embargoed split of financial-ML
    * practice: rows whose information window straddles the boundary
    * belong to neither side). Output is the audit summary a training
    * job logs: per split × event type, row/user counts and the actual
    * time bounds — the user overlap between train and test is NOT
    * forced to zero (users persist; time, not identity, is the leakage
    * axis here — [[TextAnalysis.leakageSafeSplit]] covers the
    * group-disjoint axis). One scan, one keyed aggregate. */
  def temporalSplit(s: SparkSession, dir: String,
      trainEnd: String = "2024-01-20", testStart: String = "2024-01-23"):
      DataFrame = {
    val split = when(col("ts") < lit(trainEnd).cast("timestamp"), "train")
      .when(col("ts") >= lit(testStart).cast("timestamp"), "test")
      .otherwise("embargo")
    Tables.events(s, dir)
      .withColumn("split", split)
      .groupBy(col("split"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(to_date(col("ts"))).as("first_day"),
        max(to_date(col("ts"))).as("last_day"))
      .orderBy(col("split"), col("event_type"))
  }

  /** Ad-hoc SQL entry point (entry point C in SURVEY §3.3): same engine,
    * SQL text in. Used by tests; the driver oracle exercises the
    * DataFrame forms above. */
  def sql(s: SparkSession, dir: String, query: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(query)
  }

  /** Lorenz-curve knee: the part rank where the cumulative revenue
    * share is farthest ABOVE the uniform diagonal — the point the
    * "vital few" actually end (Kneedle applied to concentration; ABC's
    * 80/95 cuts are convention, this is the data's own bend). Reports
    * the knee rank, its population and revenue shares, and the max
    * gap (= twice the area-under-gap bound on Gini's side).
    *
    * Scale shape: the corpus-sized pass is the part-grain rollup; the
    * cumulative window runs over the PART table (dimension
    * cardinality, the same documented bound as abcParts), and the
    * knee is a quantized argmax via min(struct) — no second pass. */
  def lorenzKnee(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
    val tot = perPart.agg(sum(col("rev")).as("tr"),
      count(lit(1)).cast("double").as("np"))
    // part-cardinality-bounded window (see abcParts note)
    val w = Window.orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = perPart.crossJoin(broadcast(tot))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rev").desc, col("l_partkey"))))
      .withColumn("cum_share", q6(sum(col("rev")).over(w) / col("tr")))
      .withColumn("pop_share", q6(col("rk") / col("np")))
      .withColumn("gap", q6(col("cum_share") - col("pop_share")))
    scored.agg(min(struct((-col("gap")).as("ng"), col("rk").as("rk"),
        col("cum_share").as("cs"), col("pop_share").as("ps"))).as("w"))
      .select(col("w.rk").cast("long").as("knee_rank"),
        round4eps(col("w.ps")).as("pop_share"),
        round4eps(col("w.cs")).as("rev_share"),
        round4eps(-col("w.ng")).as("max_gap"))
  }

  /** Atkinson inequality index (aversion ε = 0.5) of part revenue:
    * A = 1 − (mean √x)²/mean x — the inequality measure with an
    * explicit welfare stance (how much total revenue society would
    * give up for perfect equality), decomposable sibling of the Gini
    * and Theil gates. ONE moment pass (Σ√x, Σx, n); revenue is
    * pre-scaled so the square root's argument stays O(1). */
  def atkinsonIndex(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg((sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) /
        lit(1e6)).as("x"))
    perPart.agg(count(lit(1)).cast("double").as("n"),
        sum(sqrt(col("x"))).as("ssq"), sum(col("x")).as("sx"))
      .select(col("n").cast("long").as("n_parts"),
        round4eps((col("ssq") / col("n")) * (col("ssq") / col("n")) /
          (col("sx") / col("n"))).as("ede_ratio_base"),
        round4eps(lit(1.0) -
          (col("ssq") / col("n")) * (col("ssq") / col("n")) /
          (col("sx") / col("n"))).as("atkinson"))
  }

  /** ABC × XYZ planning matrix: the 9-cell cross of value classes
    * (cumulative-revenue ABC) and variability classes (monthly-CV
    * XYZ) with part counts and revenue share per cell — the
    * inventory-policy grid (AX = automate, CZ = make-to-order). Both
    * classifications are the SAME quantized-boundary logic their
    * standalone gates pin; this gate checks their join. */
  /** ABC class migration between eras — the assortment-health
    * transition matrix: each part classified by [[abcParts]]'s exact
    * cumulative-revenue rule WITHIN each era (early < 1998-01-01,
    * late ≥), then the 4×4 (A/B/C/absent) from→to counts. A heavy
    * A→C diagonal-off drift is a dying catalog; N→A is a launch
    * pipeline working. Two fact collapses + part-grain windows (the
    * abcParts scale shape per era) + one part-keyed outer join. */
  def abcMigration(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    def classify(early: Boolean): DataFrame = {
      val li = Tables.lineitem(s, dir).filter(
        if (early) col("l_shipdate") < lit(java.sql.Date.valueOf("1998-01-01"))
        else col("l_shipdate") >= lit(java.sql.Date.valueOf("1998-01-01")))
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("rev_raw"))
      val w = Window.orderBy(col("rev_raw").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = perPart.agg(sum(col("rev_raw")).as("total"))
      perPart.crossJoin(broadcast(total))
        .withColumn("cum_share",
          q6(sum(col("rev_raw")).over(w) / col("total")))
        .select(col("l_partkey"),
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B")
            .otherwise("C").as("cls"))
    }
    classify(early = true).select(col("l_partkey"), col("cls").as("from_cls"))
      .join(classify(early = false)
        .select(col("l_partkey"), col("cls").as("to_cls")),
        Seq("l_partkey"), "full_outer")
      .select(coalesce(col("from_cls"), lit("N")).as("from_class"),
        coalesce(col("to_cls"), lit("N")).as("to_class"))
      .groupBy(col("from_class"), col("to_class"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("from_class"), col("to_class"))
  }

  def abcXyzMatrix(s: SparkSession, dir: String): DataFrame = {
    def q6(c: Column): Column =
      floor(c * lit(1000000) + lit(0.5) + lit(1e-6)) / lit(1000000)
    val perPart = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
    val tot = perPart.agg(sum(col("rev")).as("tr"))
    val w = Window.orderBy(col("rev").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val abc = perPart.crossJoin(broadcast(tot))
      .withColumn("cum_share", q6(sum(col("rev")).over(w) / col("tr")))
      .select(col("l_partkey"), col("rev"),
        when(col("cum_share") <= 0.8, "A")
          .when(col("cum_share") <= 0.95, "B").otherwise("C")
          .as("abc_class"))
    val pm = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey").as("pk"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(col("l_quantity")).as("q"))
    val xyz = pm.groupBy(col("pk"))
      .agg(count(lit(1)).cast("double").as("nm"),
        avg(col("q")).as("mu"), sum(col("q") * col("q")).as("s2"))
      .select(col("pk"),
        when(col("nm") <= 1, "Z")
          .when(round4eps(sqrt((col("s2") - col("nm") * col("mu") *
            col("mu")) / (col("nm") - 1)) / col("mu")) < 0.5, "X")
          .when(round4eps(sqrt((col("s2") - col("nm") * col("mu") *
            col("mu")) / (col("nm") - 1)) / col("mu")) < 1.0, "Y")
          .otherwise("Z").as("xyz_class"))
    val cells = abc.join(xyz, col("l_partkey") === col("pk"))
      .groupBy(col("abc_class"), col("xyz_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("cell_rev"))
    cells.crossJoin(broadcast(tot))
      .select(col("abc_class"), col("xyz_class"), col("n_parts"),
        round4eps(col("cell_rev") / col("tr")).as("rev_share"))
      .orderBy(col("abc_class"), col("xyz_class"))
  }

  /** Compound monthly growth rate of revenue: (last/first)^(1/(n−1))
    * − 1 over the monthly series, plus the arithmetic-mean growth for
    * contrast (CMGR ≤ mean growth by AM-GM; quoting the wrong one
    * flatters every deck). Endpoints are quantized before the power
    * so both engines exponentiate identical arguments. */
  def cmgr(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("m"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val w = Window.orderBy(col("m")) // calendar-bounded frame
    val g = monthly
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("growth", when(col("prev").isNotNull,
        col("rev") / col("prev") - 1))
    val ends = monthly.agg(count(lit(1)).cast("double").as("n"),
      min(struct(col("m"), col("rev"))).as("f"),
      max(struct(col("m"), col("rev"))).as("l"))
    val cm = pow(col("l.rev") / col("f.rev"),
      lit(1.0) / (col("n") - 1)) - 1
    g.agg(round4eps(avg(col("growth"))).as("mean_growth"))
      .crossJoin(broadcast(ends.select(col("n"), cm.as("cmgr_raw"))))
      .select(col("n").cast("long").as("n_months"),
        round4eps(col("cmgr_raw")).as("cmgr"),
        col("mean_growth"))
  }

  /** Multiplicative growth decomposition between the first and last
    * FULL order years: ln(R₁/R₀) split into customer-count growth,
    * orders-per-customer growth, and order-value growth — and the
    * log identity holds EXACTLY (spec-pinned), so every point of
    * revenue growth is attributed to exactly one lever. One
    * conditional aggregate per year; all ratios come from quantized
    * year totals. */
  def growthDecomposition(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("y"), col("o_custkey"),
        col("o_totalprice"))
    val yr = o.agg((min(col("y")) + 1).as("y0"))
    val cells = o.crossJoin(broadcast(yr))
      .filter(col("y") === col("y0") || col("y") === col("y0") + 4)
      .groupBy((col("y") === col("y0")).as("base"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("r"),
        countDistinct(col("o_custkey")).cast("double").as("c"),
        count(lit(1)).cast("double").as("o"))
    val b = cells.filter(col("base"))
      .select(col("r").as("r0"), col("c").as("c0"), col("o").as("o0"))
    val t = cells.filter(!col("base"))
      .select(col("r").as("r1"), col("c").as("c1"), col("o").as("o1"))
    b.crossJoin(t).select(
      round4eps(log(col("r1") / col("r0"))).as("log_revenue_growth"),
      round4eps(log(col("c1") / col("c0"))).as("customer_term"),
      round4eps(log((col("o1") / col("c1")) / (col("o0") / col("c0"))))
        .as("frequency_term"),
      round4eps(log((col("r1") / col("o1")) / (col("r0") / col("o0"))))
        .as("value_term"))
  }

  /** Seasonal / trend strength (Hyndman's F_S, F_T) of daily event
    * volume from the same decomposition [[seasonalDecompose]] gates:
    * F_T = max(0, 1 − Var(R)/Var(T+R)), F_S = max(0, 1 −
    * Var(R)/Var(S+R)) — the one-number "is there even a cycle worth
    * modeling" screen that decides whether Holt-Winters earns its
    * seasonal term. Components are 4-decimal-quantized before the
    * variance moments, and both variances come from ONE aggregate
    * over the calendar-bounded daily frame. */
  def seasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("n"))
    val byDate = Window.orderBy(col("d")) // calendar-bounded frame
    val trend = daily.withColumn("trend",
      avg(col("n")).over(byDate.rowsBetween(-3, 3)))
    val comp = trend
      .withColumn("dow", ((dayofweek(col("d")) + lit(5)) % 7 + lit(1)))
      .withColumn("seasonal",
        avg(col("n") - col("trend")).over(Window.partitionBy(col("dow"))))
      .select(
        round4eps(col("n") - col("trend") - col("seasonal")).as("r"),
        round4eps(col("n") - col("seasonal")).as("tr"),
        round4eps(col("n") - col("trend")).as("sr"))
    def vr(c: String) = avg(col(c) * col(c)) - avg(col(c)) * avg(col(c))
    comp.agg(count(lit(1)).as("n_days"),
        vr("r").as("vres"), vr("tr").as("vtr"), vr("sr").as("vsr"))
      .select(col("n_days"),
        round4eps(greatest(lit(0.0),
          lit(1.0) - col("vres") / col("vtr"))).as("trend_strength"),
        round4eps(greatest(lit(0.0),
          lit(1.0) - col("vres") / col("vsr"))).as("seasonal_strength"))
  }

  /** XYZ demand-variability classes per part (the planning twin of
    * [[abcParts]]'s value classes): CV of monthly order quantities —
    * X under 0.5 (steady, forecastable), Y under 1.0, Z above
    * (erratic, safety-stock territory). The class cut compares the
    * QUANTIZED CV so an engine-ulp can't flip a label; parts with a
    * single active month are Z by definition (sd undefined → max
    * variability).
    *
    * Scale shape: one (part, month) rollup, one part-grain moment
    * pass, then a 3-row class re-aggregate. */
  def xyzClasses(s: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(col("l_quantity")).as("q"))
    val perPart = pm.groupBy(col("l_partkey"))
      .agg(count(lit(1)).cast("double").as("nm"),
        avg(col("q")).as("mu"), sum(col("q") * col("q")).as("s2"))
      .select(col("l_partkey"), col("nm"),
        when(col("nm") > 1, round4eps(
          sqrt((col("s2") - col("nm") * col("mu") * col("mu")) /
            (col("nm") - 1)) / col("mu"))).as("cv"))
    perPart
      .select(when(col("cv").isNull, "Z")
          .when(col("cv") < 0.5, "X")
          .when(col("cv") < 1.0, "Y").otherwise("Z").as("xyz_class"),
        col("cv"))
      .groupBy(col("xyz_class"))
      .agg(count(lit(1)).as("n_parts"),
        round4eps(avg(col("cv"))).as("avg_cv"))
      .orderBy(col("xyz_class"))
  }

  /** Theta-sketch set operations from two KMV sketches: estimated
    * union, intersection and Jaccard of the part sets shipped in the
    * first vs second half of the calendar — "how much do the eras'
    * catalogs overlap" WITHOUT ever joining the two id sets. The
    * θ-intersection rule: keep each sketch's k min hashes, θ = the
    * union sketch's kth min; matching hashes below θ, divided by θ,
    * estimate the intersection. Exact counts ride along as the
    * verification columns (the same contract as [[kmvDistinct]]).
    *
    * Scale shape: TWO k-long mergeable sketch aggregates over one
    * scan (partials are k longs per map task regardless of corpus or
    * NDV); every set operation afterwards is array algebra on 2k
    * values. The sketch is md5-derived, so the estimate is
    * DETERMINISTIC and bit-identical cross-engine — the oracle
    * replays the same k-min selection in SQL. */
  def kmvOverlap(s: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val bounds = li.agg(min(col("l_shipdate").cast("date")).as("d0"),
      max(col("l_shipdate").cast("date")).as("d1"))
    val h = li.crossJoin(broadcast(bounds)).select(
      (col("l_shipdate").cast("date") <= date_add(col("d0"),
        floor(datediff(col("d1"), col("d0")) / lit(2.0)).cast("int")))
        .as("era_a"),
      conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .persistMemDisk
    val a = h.filter(col("era_a")).agg(
      graft.functions.FreqSketchFunctions.kmvMins(col("h"), k).as("ma"),
      countDistinct(col("h")).as("exact_a"))
    val b = h.filter(!col("era_a")).agg(
      graft.functions.FreqSketchFunctions.kmvMins(col("h"), k).as("mb"),
      countDistinct(col("h")).as("exact_b"))
    val u = h.agg(countDistinct(col("h")).as("exact_union"))
    val j = a.crossJoin(b).crossJoin(u)
    val uni = slice(array_sort(array_distinct(
      concat(col("ma"), col("mb")))), 1, k)
    val thetaL = element_at(uni, size(uni)) // kth (or last) union min
    val thetaF = thetaL.cast("double") / lit(math.pow(2.0, 60))
    val full = size(uni) >= k
    val interAll = array_intersect(col("ma"), col("mb"))
    val estUnion = when(!full, size(uni).cast("double"))
      .otherwise(lit((k - 1).toDouble) / thetaF)
    val estInter = when(!full, size(interAll).cast("double"))
      .otherwise(size(filter(interAll, x => x < thetaL)) / thetaF)
    j.select(lit(k.toLong).as("k"),
      round4eps(estUnion).as("est_union"),
      round4eps(estInter).as("est_inter"),
      round4eps(estInter / estUnion).as("est_jaccard"),
      col("exact_a"), col("exact_b"), col("exact_union"),
      (col("exact_a") + col("exact_b") - col("exact_union"))
        .as("exact_inter"))
  }

  /** Herfindahl-Hirschman concentration index of supplier revenue per
    * region: HHI = Σ shareᵢ² over each region's suppliers (1/n =
    * perfectly even, 1 = monopoly), with supplier count and the top
    * supplier's share — the supply-risk readout next to
    * [[giniRevenue]]'s inequality one.
    *
    * Scale shape: lineitem rolls up to the supplier grain in one
    * keyed shuffle (map-side combined); the HHI re-aggregates that
    * supplier-bounded frame per region. Supplier revenues are
    * 4-decimal-quantized before the shares so summation order can't
    * leak into the squared ratios. */
  def hhiConcentration(s: SparkSession, dir: String): DataFrame = {
    val supRev = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("s_suppkey"))
      .agg(round4eps(sum(col("l_extendedprice") *
        (lit(1.0) - col("l_discount")))).as("rev"))
    supRev.groupBy(col("region"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev")).as("tot"),
        sum(col("rev") * col("rev")).as("ssq"),
        max(col("rev")).as("top"))
      .select(col("region"), col("n_suppliers"),
        round4eps(col("ssq") / (col("tot") * col("tot"))).as("hhi"),
        round4eps(col("top") / col("tot")).as("top_share"))
      .orderBy(col("region"))
  }

  /** Chained quarterly index via a RECURSIVE CTE (Spark 4's UnionLoop):
    * index₀ = 100, indexₘ = q6(indexₘ₋₁ · revₘ / revₘ₋₁) — the
    * per-step 1e-6 quantization makes the chain genuinely
    * path-dependent (a closed-form 100·revₘ/rev₀ would NOT reproduce
    * it), so the recursion is semantically necessary, not syntax
    * demonstration: this is exactly how a chain-linked price index
    * (Laspeyres-style) is defined. Exercises the engine's recursive
    * SQL surface end-to-end (analyzer ResolveWithCTE → UnionLoop
    * execution) against DuckDB's recursive CTE.
    *
    * Scale shape: ONE fact-scan aggregation to the ~28-row quarterly
    * frame, MATERIALIZED to a local relation before the recursion
    * (UnionLoop re-executes the seed plan every iteration — leaving
    * the fact aggregation inside the view would rescan the corpus
    * once per step). The remaining cost is the engine's fixed
    * ~0.3 s/iteration UnionLoop scheduling overhead, which is why the
    * chain is QUARTERLY (28 steps), not monthly (84): recursion depth,
    * not data volume, prices this operator — at 100× the data the
    * step count is identical. The collect is calendar-bounded
    * (quarters, loud require). */
  def recursiveIndex(s: SparkSession, dir: String): DataFrame = {
    val quarterly = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")))
        .as("mi"))
      .agg(round4eps(sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    // 0-based quarter ordinal; the rank window runs over the ~28-row
    // calendar frame, never the fact table
    val rows = quarterly.select(
        (dense_rank().over(Window.orderBy(col("mi"))) - 1).as("rn"),
        col("rev"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    require(rows.length <= 500,
      s"recursiveIndex: calendar-bounded quarter frame expected, " +
        s"got ${rows.length} quarters")
    import s.implicits._
    // r15: the chained index is a strictly sequential scalar recursion
    // over the ALREADY-COLLECTED calendar frame — executing it as a
    // Spark `WITH RECURSIVE` paid one UnionLoop micro-job per quarter
    // (~28 sequential jobs, 3.2 s of pure scheduling at sf0.1) to do
    // nanoseconds of arithmetic. The chain now runs driver-side with
    // BIT-IDENTICAL double arithmetic (same multiply-then-divide order,
    // same floor quantizers as the SQL it replaces; Round15Spec asserts
    // driver chain ≡ the original recursive-CTE formulation on the
    // engine, which remains spec-covered there). Guide §1.2 step 1 /
    // §5: the driver already held the data; zero extra distribution.
    val sorted = rows.sortBy(_._1)
    val level = new Array[Double](sorted.length)
    if (sorted.nonEmpty) level(0) = 100.0
    for (i <- 1 until sorted.length)
      level(i) = math.floor(level(i - 1) * sorted(i)._2 / sorted(i - 1)._2
        * 1000000 + 0.5 + 0.000001) / 1000000
    val out = sorted.zipWithIndex.map { case ((rn, rev), i) =>
      (rn.toLong, rev,
        math.floor(level(i) * 10000 + 0.5 + 0.000001) / 10000)
    }
    s.createDataset(out).toDF("quarter_index", "rev", "chained_index")
      .orderBy(col("quarter_index"))
  }

  /** The original Spark-side recursive-CTE formulation of
    * [[recursiveIndex]]'s chain — kept as the engine-capability
    * receipt (Round15Spec drives it and asserts equality with the
    * driver chain). */
  private[graft] def recursiveIndexViaCte(s: SparkSession,
      rows: Seq[(Int, Double)]): DataFrame = {
    import s.implicits._
    s.createDataset(rows).toDF("rn", "rev")
      .createOrReplaceTempView("graft_rcte_months")
    s.sql("""
      WITH RECURSIVE idx(rn, rev, level) AS (
        SELECT rn, rev, CAST(100.0 AS DOUBLE)
        FROM graft_rcte_months WHERE rn = 0
        UNION ALL
        SELECT m.rn, m.rev,
          CAST(floor(i.level * m.rev / i.rev * 1000000 + 0.5
            + 0.000001) / 1000000 AS DOUBLE)
        FROM idx i JOIN graft_rcte_months m ON m.rn = i.rn + 1)
      SELECT CAST(rn AS BIGINT) AS quarter_index, rev,
        floor(level * 10000 + 0.5 + 0.000001) / 10000 AS chained_index
      FROM idx ORDER BY quarter_index""")
  }

  /** Window-frame semantics suite: the same cumulative revenue under
    * ROWS (physical rows up to the current one — deterministic ONLY
    * with the unique orderkey tie-break) vs RANGE (all PEERS of the
    * current sort value aggregate together) vs a calendar RANGE
    * (INTERVAL 7 DAYS PRECEDING) — the three frame kinds whose
    * tie/peer semantics silently diverge across engines if either
    * gets them wrong. Exact-cents sums, so every frame value is an
    * exact long.
    *
    * Scale shape: priority-keyed windows (5 partitions) over one
    * sorted pass of the orders scan — the standard windowed-fact
    * plan, linear at any SF. */
  def windowFrames(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .selectExpr(
        "o_orderkey", "prio", "d",
        """sum(cents) OVER (PARTITION BY prio ORDER BY d, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_rows""",
        """sum(cents) OVER (PARTITION BY prio ORDER BY d
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_range""",
        """sum(cents) OVER (PARTITION BY prio ORDER BY d
           RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
           AS trail7d""")
  /** SQL:2023 ordered-set aggregates — `listagg(DISTINCT …, ',')
    * WITHIN GROUP (ORDER BY …)` and deterministic `mode()` (both new
    * engine surface in Spark 4): per return flag, the ordered status
    * roster and the tie-deterministic modal quantity. listagg's
    * WITHIN GROUP makes string aggregation order-stable across
    * engines (the nondeterministic collect_list+concat idiom it
    * replaces); mode's deterministic flag pins tie-breaks to the
    * lowest value, which is what makes it oracle-able at all. One
    * flag-keyed aggregation, partial-combined map-side. */
  def orderedAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("listagg(DISTINCT l_linestatus, ',') " +
          "WITHIN GROUP (ORDER BY l_linestatus)").as("statuses"),
        expr("mode(l_quantity, true)").as("qty_mode"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag"))
}
