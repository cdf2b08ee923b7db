package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality checks — the queryable form of the reference's `dbt
  * test` stage (dag.py:38-41, SURVEY §2.11 C4 / §5). The reference
  * ships no schema.yml, so its test stage runs zero tests; this makes
  * the implied checks (not-null, unique grain, accepted values, range)
  * explicit, composable, and cheap: ALL row-level checks and the
  * uniqueness check evaluate in ONE aggregation pass over the table
  * (each check is a conditional-sum aggregate — map-side combined, no
  * per-check scans), then unpivot to one row per check.
  *
  * At 100 TB this is the only affordable shape: a dbt-style
  * one-query-per-test harness scans the table once per check; this
  * scans once, total.
  */
object Checks {

  /** A named row-level predicate: rows violating `valid` count against
    * the check. */
  final case class RowCheck(name: String, valid: Column)

  def notNull(c: String): RowCheck =
    RowCheck(s"not_null_$c", col(c).isNotNull)

  def acceptedValues(c: String, values: Seq[String]): RowCheck =
    RowCheck(s"accepted_values_$c", col(c).isNull || col(c).isin(values: _*))

  def nonNegative(c: String): RowCheck =
    RowCheck(s"non_negative_$c", col(c).isNull || col(c) >= 0)

  /** One row per check: (check_name, n_violations, passed). Row checks
    * count violating rows; each `uniqueCols` entry adds a uniqueness
    * check counting surplus rows (count - distinct count; approximate
    * distinct is the 100 TB variant, exact kept here for the oracle). */
  def report(df: DataFrame, rowChecks: Seq[RowCheck],
             uniqueCols: Seq[String] = Nil): DataFrame = {
    // coalesce: sum() over an EMPTY table is NULL in Spark — an empty
    // table has zero violations, not unknown ones (and the DuckDB
    // oracle's COUNT(*) FILTER returns 0 there)
    val rowAggs = rowChecks.map(c =>
      coalesce(sum(when(!c.valid, 1L).otherwise(0L)), lit(0L)).as(c.name))
    val uniqAggs = uniqueCols.map(c =>
      (count(lit(1)) - countDistinct(col(c))).as(s"unique_$c"))
    val aggs = rowAggs ++ uniqAggs
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val names = rowChecks.map(_.name) ++ uniqueCols.map(c => s"unique_$c")
    val stackExpr = names.map(n => s"'$n', `$n`").mkString(", ")
    wide.select(expr(
        s"stack(${names.size}, $stackExpr) AS (check_name, n_violations)"))
      .withColumn("passed", col("n_violations") === 0L)
  }

  /** Zero-extra-pass variant: the same row checks attached to the
    * frame via `Dataset.observe`, so the violation counters are
    * computed BY THE WRITE JOB ITSELF (accumulator-backed aggregates
    * evaluated as rows stream through) instead of [[report]]'s second
    * aggregation pass over the table. At 100 TB that second pass is a
    * second 100 TB scan; observation is free. Retrieve the counts
    * from the returned frame's QueryExecutionListener /
    * StreamingQueryProgress under metric group `name`, or use
    * [[observedMetrics]] for the batch-collect convenience.
    * Uniqueness checks are NOT expressible here (countDistinct is not
    * an accumulator-style observation) — run those through [[report]]
    * or a WAP audit. */
  def observed(df: DataFrame, rowChecks: Seq[RowCheck],
               name: String = "graft_dq"): DataFrame = {
    require(rowChecks.nonEmpty, "observed needs at least one row check")
    val aggs = rowChecks.map(c =>
      coalesce(sum(when(!c.valid, 1L).otherwise(0L)), lit(0L)).as(c.name))
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Batch convenience around [[observed]]: registers a listener, runs
    * `action` on the observed frame, and returns the per-check
    * violation counts that the action's OWN job computed. */
  def observedMetrics(s: SparkSession, observedDf: DataFrame,
      name: String = "graft_dq")(action: DataFrame => Unit): Map[String, Long] = {
    @volatile var captured: Map[String, Long] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val row = qe.observedMetrics.get(name)
        row.foreach { r =>
          captured = r.schema.fieldNames.map(f =>
            f -> r.getAs[Long](f)).toMap
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    try {
      action(observedDf)
      // listener delivery is asynchronous; wait for the metrics row
      val deadline = System.nanoTime() + 10000000000L
      while (captured.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      captured
    } finally s.listenerManager.unregister(listener)
  }

  /** The demo report over the events table (the checks a schema.yml for
    * it would declare). */
  def eventsReport(s: SparkSession, dir: String): DataFrame =
    report(graft.Tables.events(s, dir),
      Seq(
        notNull("event_id"),
        notNull("user_id"),
        acceptedValues("event_type",
          graft.operators.Relational.EventTypes),
        nonNegative("value")),
      uniqueCols = Seq("event_id"))
}
