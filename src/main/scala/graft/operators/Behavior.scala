package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Rounding.round4eps

/** Behavioral / product-analytics operators over `events`: funnel
  * conversion and cohort retention — the two aggregate shapes every
  * event warehouse serves, absent from the reference (whose mart is a
  * single-table rollup, SURVEY §2.4).
  *
  * Scale posture: both operators reduce to user-keyed aggregates and
  * user-keyed joins — ONE shuffle partitioning (user_id) serves every
  * stage, and each stage's output is strictly smaller than its input
  * (min-per-user, distinct-per-user-day), so partials combine map-side
  * and nothing reshuffles on a second key until the final tiny rollup.
  */
object Behavior {

  /** Ordered funnel: view → click → purchase, strictly increasing
    * event time per user. Stage N counts users whose earliest stage-N
    * event follows their earliest stage-(N-1) event — the standard
    * "earliest-path" funnel (conversion measured against the first
    * opportunity, immune to event duplication). Output: one row per
    * stage with the user count and conversion from stage 1. */
  def funnelStages(s: SparkSession, dir: String,
                   stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    val events = Tables.events(s, dir)
    // earliest qualifying ts per user per stage, chained; each stage
    // frame feeds BOTH the next stage and its own count, so persist
    // (lifecycle: cleared by the caller / bench harness)
    val first = events.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts0"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chained = stages.tail.zipWithIndex.foldLeft(Seq(first)) {
      case (acc, (stage, i)) =>
        val prev = acc.last
        acc :+ events.filter(col("event_type") === stage)
          .join(prev.select(col("user_id"), col(s"ts$i").as("prev_ts")), "user_id")
          .filter(col("ts") > col("prev_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as(s"ts${i + 1}"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    val counts = chained.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(stage).as("event_type"), col("n_users"))
    }.reduce(_.unionByName(_))
    // conversion against stage 1, computed in-plan (no driver action)
    val base = counts.filter(col("stage") === 1)
      .select(col("n_users").cast("double").as("base"))
    counts.crossJoin(broadcast(base))
      .select(col("stage"), col("event_type"), col("n_users"),
        round4eps(col("n_users") / col("base")).as("conversion"))
  }

  /** Cohort retention: users bucketed by first-activity date, then
    * counted per (cohort_date, day_offset) of later activity. The
    * (user, day) de-dup happens before the join, so the join input is
    * already collapsed to at most users × days rows. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val cohort = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val active = events.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_date"), datediff(col("d"), col("cohort_date")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
