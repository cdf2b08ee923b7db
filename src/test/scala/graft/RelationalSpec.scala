package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Relational operators whose contract is not a DuckDB hash-match:
  * approximate distinct (error-bounded vs exact) and salted
  * aggregation (exactly equal to the direct groupBy). */
class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("approxDistinct is within rsd bounds of the exact counts") {
    val approx = Relational.approxDistinct(spark, dir).collect().head
    val exact = Relational.distinctCounts(spark, dir).collect().head
    val (au, eu) = (approx.getAs[Long]("n_users_approx"), exact.getAs[Long]("n_users"))
    assert(math.abs(au - eu).toDouble / eu < 0.05, s"approx $au vs exact $eu")
    assert(approx.getAs[Long]("n_types_approx") === exact.getAs[Long]("n_types"))
    assert(approx.getAs[Long]("n_events") === exact.getAs[Long]("n_events"))
  }

  test("hllUnionGate: union of per-group sketches equals the direct sketch") {
    val r = Relational.hllUnionGate(spark, dir).collect().head
    assert(r.getAs[Boolean]("union_eq_direct"),
      "per-type HLL sketches unioned must estimate identically to one direct sketch")
    assert(r.getAs[Boolean]("est_err_ok"))
    assert(r.getAs[Long]("n_users_exact") > 0)
  }

  test("salted aggregation equals the direct groupBy exactly") {
    val salted = Relational.saltedTypeTotals(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("total_value"), r.getAs[Long]("records")))).toMap
    val direct = Tables.events(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("event_type"))
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum("value"), 4).as("tv"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("tv"), r.getAs[Long]("n")))).toMap
    assert(salted === direct)
  }

  test("approxQuantiles: per-type sketch percentiles ordered, counts positive") {
    // the user-facing summary twin of approxQuantilesGate (which
    // asserts the bounded-rank-error contract oracle-side); found
    // gate-less by the r11 orphan-operator close check
    val rows = graft.operators.Relational.approxQuantiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("ap50") <= r.getAs[Double]("ap90") + 1e-9)
      assert(r.getAs[Double]("ap90") <= r.getAs[Double]("ap99") + 1e-9)
      assert(r.getAs[Long]("n_valued") > 0L)
    }
  }
}
