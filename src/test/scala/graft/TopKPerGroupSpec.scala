package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerGroup, TopKPerGroupExec}

/** Custom top-k-per-group operator: set-equality with the window
  * row_number formulation, two-phase physical shape, no sort/window in
  * the plan. */
class TopKPerGroupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def windowTopK(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").desc_nulls_last, col("event_id"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  private def customTopK(k: Int) =
    TopKPerGroup(Tables.events(spark, dir),
      Seq(col("user_id")), Seq(col("value").desc_nulls_last, col("event_id")), k)

  test("matches the window row_number formulation for k = 3") {
    val expected = windowTopK(3).collect().map(_.getAs[Long]("event_id")).toSet
    val got = customTopK(3).collect().map(_.getAs[Long]("event_id")).toSet
    assert(got === expected)
  }

  test("returns whole groups when k exceeds the group size") {
    val total = Tables.events(spark, dir).count()
    assert(customTopK(1000000).count() === total)
  }

  test("plans as partial + final exec, no window, no sort") {
    // AQE wraps the plan until execution; disable it to inspect shape
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = customTopK(3).queryExecution.executedPlan
      val topks = plan.collect { case e: TopKPerGroupExec => e }
      assert(topks.map(_.partial).sorted === Seq(false, true))
      val s = plan.toString
      assert(!s.contains("WindowExec") && !s.contains("Sort "), s)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("schema is unchanged (same columns as the input)") {
    assert(customTopK(2).columns.toSeq === Tables.events(spark, dir).columns.toSeq)
  }
}
