package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Scalar-function surface: string, date/time and math expression
  * suites over the testdata tables, each oracle-checked against DuckDB.
  *
  * The reference's own scalar surface is tiny (COALESCE, DATE(), FX
  * arithmetic — SURVEY §2.3/§2.8); a complete engine needs the whole
  * built-in family. Everything here is `org.apache.spark.sql.functions`
  * — codegen'd expressions inside whole-stage codegen, never UDFs, so
  * the projections fuse into the scan at any scale.
  *
  * Cross-engine parity notes baked in:
  *  - transcendentals (ln/exp) are NOT bit-identical across libm
  *    implementations → round4eps on both sides absorbs the ulp;
  *  - sqrt/pow(x,2)/abs/sign are IEEE-exact → plain round is safe;
  *  - day-of-week numbering differs (Spark 1=Sunday; DuckDB dow
  *    0=Sunday) → oracle shifts;
  *  - string positions are 1-based in both (instr ↔ strpos).
  */
object ScalarSuites {

  /** String-function suite over customer names/segments. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      upper(col("c_name")).as("u_name"),
      lower(col("c_mktsegment")).as("l_segment"),
      length(col("c_name")).as("name_len"),
      substring(col("c_name"), 1, 9).as("name_prefix"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
      lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
      reverse(col("c_name")).as("rev_name"),
      instr(col("c_name"), "#").as("hash_pos"),
      element_at(split(col("c_name"), "#"), 1).as("name_stem"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
      trim(col("c_name")).as("trimmed"))

  /** Second string/null-function suite: slicing (left/right/split_part),
    * predicates (starts_with/ends_with/contains), char codes, repeat/
    * replace, and the NULL algebra (nullif/ifnull) — the remainder of
    * the portable string surface after stringFuncs. */
  def stringFuncs2(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      expr("left(c_name, 8)").as("name_left8"),
      expr("right(c_name, 3)").as("name_right3"),
      expr("repeat(substring(c_mktsegment, 1, 2), 2)").as("seg_rep"),
      expr("replace(c_name, 'Customer', 'Cust')").as("name_replaced"),
      expr("startswith(c_name, 'Customer')").as("is_customer"),
      expr("endswith(c_name, '0')").as("ends_zero"),
      expr("contains(c_name, '#')").as("has_hash"),
      ascii(col("c_mktsegment")).as("seg_ascii"),
      expr("char(65 + c_custkey % 26)").as("key_chr"),
      expr("split_part(c_name, '#', 2)").as("name_num"),
      expr("nullif(c_mktsegment, 'BUILDING')").as("seg_nb"),
      expr("ifnull(nullif(c_mktsegment, 'BUILDING'), 'n/a')").as("seg_or_na"),
      col("c_name").like("%00%").as("like_00"),
      col("c_mktsegment").ilike("bui%").as("ilike_bui"))

  /** Date/time-function suite over order dates. */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      quarter(col("o_orderdate")).as("o_quarter"),
      dayofweek(col("o_orderdate")).as("o_dow"),          // 1 = Sunday
      date_trunc("month", col("o_orderdate")).as("month_start"),
      date_add(to_date(col("o_orderdate")), 30).as("plus_30d"),
      last_day(to_date(col("o_orderdate"))).as("month_end"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
        .as("days_since_95"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"))

  /** JSON-function suite: build a JSON document per event with plain
    * string concat (byte-identical in any engine — to_json key order /
    * whitespace is NOT portable, and neither is double→string
    * formatting, so the numeric payload is an integer cent value),
    * then extract typed fields back out with JSONPath. Exercises
    * get_json_object string/number extraction and null-for-missing-path
    * semantics. */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        concat(lit("{\"user\": "), col("user_id"),
          lit(", \"type\": \""), col("event_type"),
          lit("\", \"cents\": "),
          floor(coalesce(col("value"), lit(-1.0)) * 100).cast("long"),
          lit("}")).as("js"))
      // ONE parse per row: from_json with an explicit schema feeds all
      // typed fields (N get_json_object calls would re-parse the
      // document N times — Catalyst only fuses from_json, not JSONPath
      // extraction). get_json_object kept for the path-miss semantics
      // it is the API for.
      .withColumn("j", from_json(col("js"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "user BIGINT, type STRING, cents BIGINT")))
      .select(
        col("event_id"),
        col("j.user").as("j_user"),
        col("j.type").as("j_type"),
        col("j.cents").as("j_cents"),
        get_json_object(col("js"), "$.missing").as("j_missing"),
        length(col("js")).as("js_len"))

  /** Array-function suite over the documents word lists: slicing,
    * sorting, distinct, membership, min/max, joining back to a string —
    * the array algebra a list-typed column needs (DuckDB list_* mirror
    * on the oracle side; string comparisons are binary in both). */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    Tables.documents(s, dir).select(
      col("doc_id"),
      size(w).as("n_words"),
      size(array_distinct(w)).as("n_distinct"),
      concat_ws("-", slice(w, 1, 3)).as("first3"),
      array_contains(w, "the").as("has_the"),
      array_min(w).as("min_word"),
      array_max(w).as("max_word"),
      element_at(sort_array(w), 1).as("sorted_first"),
      element_at(reverse(sort_array(w)), 1).as("sorted_last"),
      concat_ws(" ", array_sort(array_distinct(slice(w, 1, 5)))).as("norm5"))
  }

  /** Math-function suite over lineitem measures. sqrt/power/abs/sign
    * are IEEE-exact; ln/exp go through round4eps for libm parity. */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).select(
      col("l_orderkey"),
      col("l_linenumber"),
      round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
      round4eps(log(col("l_extendedprice"))).as("ln_price"),
      round4eps(exp(col("l_discount"))).as("exp_disc"),
      round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
      round(abs(col("l_discount") - 0.05), 4).as("abs_disc_delta"),
      ceil(col("l_tax") * 100).as("tax_pct_ceil"),
      floor(col("l_extendedprice") / 1000).as("price_k_floor"),
      (col("l_orderkey") % 7).as("key_mod7"),
      signum(col("l_discount") - 0.05).as("disc_sign"),
      round(greatest(col("l_quantity"), col("l_tax") * 100), 4).as("g_val"),
      round(least(col("l_quantity"), col("l_tax") * 100), 4).as("l_val"))

  /** Map-function suite: per region, a priority→order-count MAP built
    * with map_from_entries, then interrogated through the map HOF
    * surface — map_keys, map_values + aggregate (fold), map_filter
    * with an outer-column reference, transform_values. Output is
    * canonicalized to sorted strings / exact longs so the oracle can
    * recompute from the flat cells (DuckDB's map type never needs to
    * cross the parquet boundary).
    *
    * Scale shape: one (region × priority)-keyed count over the fact
    * scan (25 cells), then map algebra on a 5-row frame. collect_list
    * order is nondeterministic, but every output is order-insensitive
    * (sorted keys, sums of exact longs). */
  /** Null-semantics suite over the nullable events columns: IS NULL,
    * COALESCE fill, NULLIF sentinel-to-null, CASE presence, null-safe
    * equality (`<=>` ↔ IS NOT DISTINCT FROM), and a COALESCE∘NULLIF
    * chain — the null-handling surface every engine must get
    * identically right (three-valued logic is where SQL ports
    * silently diverge). Pure row-level projections, no arithmetic —
    * values pass through exactly. */
  def nullFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"),
      col("value").isNull.as("value_missing"),
      coalesce(col("value"), lit(-1.0)).as("v_filled"),
      nullif(col("value"), lit(0.0)).as("v_nullif_zero"),
      when(col("value").isNull, "missing").otherwise("present")
        .as("presence"),
      (col("value") <=> lit(0.0)).as("ns_eq_zero"),
      coalesce(nullif(col("event_type"), lit("view")), lit("filtered"))
        .as("type_or_filtered"))

  def mapFuncs(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("rk"), col("o_orderpriority").as("p"))
      .agg(count(lit(1)).as("cnt"))
    val m = cells.groupBy(col("rk"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("cnt"))))
        .as("m"))
      .withColumn("total",
        aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v))
    m.select(
        col("rk").cast("long").as("region_key"),
        size(col("m")).cast("long").as("n_prios"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("keys_str"),
        col("total").as("total_orders"),
        aggregate(map_values(transform_values(col("m"),
          (_, v) => v * 2)), lit(0L), (acc, v) => acc + v)
          .as("doubled_total"),
        // priorities holding ≥ 20% of the region's orders — the
        // lambda references the OUTER total column
        concat_ws(",", array_sort(map_keys(map_filter(col("m"),
          (_, v) => v * 5 >= col("total"))))).as("big_keys"))
      .orderBy(col("region_key"))
  }
}
