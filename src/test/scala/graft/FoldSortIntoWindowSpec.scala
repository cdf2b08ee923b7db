package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SimpleMode

/** Plan + semantics checks for the FoldSortIntoWindow optimizer rule:
  * the decorrelated LATERAL top-k must lose its whole-table global
  * range sort, gain a proper window orderSpec, and (as a consequence)
  * pick up WindowGroupLimit map-side pruning — while returning exactly
  * the rows the un-optimized plan returns. */
class FoldSortIntoWindowSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def lateralPlan = {
    val df = graft.operators.Relational.lateralTopOrders(s, dir)
    (df, df.queryExecution.executedPlan.toString)
  }

  test("global range sort is folded into the window orderSpec") {
    val (_, plan) = lateralPlan
    assert(!plan.contains("rangepartitioning"),
      s"decorrelated LATERAL still plans a global range sort:\n$plan")
    // the fold exposes the rn<=2 filter to WindowGroupLimit: top-k
    // pruning runs map-side BEFORE the exchange
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("Partial"), s"no partial (map-side) group limit in:\n$plan")
  }

  test("folded plan returns the same rows as the window-form equivalent") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val (df, _) = lateralPlan
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_total"))
    assert(df.count() === expect.count())
    assert(df.exceptAll(expect).isEmpty && expect.exceptAll(df).isEmpty)
  }

  test("rule leaves explicitly-ordered windows untouched") {
    // a window that already has an orderSpec must not be rewritten
    // (fingerprint requires EMPTY orderSpec row_number)
    val df = operators.Windows.topEventPerUser(s, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition"))
  }
}
