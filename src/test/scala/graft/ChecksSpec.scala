package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Checks

/** Data-quality report semantics on a fixture with planted violations. */
class ChecksSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("report counts each violation class in one pass") {
    val ns = 1700000000L * 1000000000L
    val dir = TestSpark.eventsFixture(Seq(
      (1L, 10L, "click", java.lang.Double.valueOf(5.0), ns),
      (2L, 11L, "zap", java.lang.Double.valueOf(1.0), ns),      // bad type
      (3L, 12L, "view", java.lang.Double.valueOf(-2.0), ns),    // negative
      (3L, 13L, "click", null, ns),                             // dup event_id
      (4L, 14L, "error", java.lang.Double.valueOf(0.0), ns)))
    val rep = Checks.eventsReport(spark, dir).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))).toMap
    assert(rep("not_null_event_id") === ((0L, true)))
    assert(rep("not_null_user_id") === ((0L, true)))
    assert(rep("accepted_values_event_type") === ((1L, false)))
    assert(rep("non_negative_value") === ((1L, false)))
    assert(rep("unique_event_id") === ((1L, false)))
    assert(rep.size === 5)
  }

  test("report is a single aggregation job (no per-check scans)") {
    val ns = 1700000000L * 1000000000L
    val dir = TestSpark.eventsFixture(Seq(
      (1L, 10L, "click", java.lang.Double.valueOf(5.0), ns)))
    val plan = Checks.eventsReport(spark, dir).queryExecution.optimizedPlan
    val scans = plan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if r.getClass.getSimpleName.contains("DataSourceV2") => r
    }
    assert(scans.size === 1, s"expected one table scan, plan:\n$plan")
  }

  test("observed checks ride the write job itself and match report()") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (-2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "name")
    val checks = Seq(Checks.notNull("name"), Checks.nonNegative("id"))
    val out = TestSpark.tempDir("graft-observe")
    val observedDf = Checks.observed(df, checks)
    val metrics = Checks.observedMetrics(spark, observedDf) { odf =>
      odf.write.mode("overwrite").parquet(out) // the ONLY job that runs
    }
    assert(metrics === Map("not_null_name" -> 1L, "non_negative_id" -> 1L))
    // agreement with the second-pass report on the same frame
    val reported = Checks.report(df, checks).collect()
      .map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(metrics === reported)
    // and the write actually happened (observation is not a blocker)
    assert(spark.read.parquet(out).count() === 3L)
  }
}
