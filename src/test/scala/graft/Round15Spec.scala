package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-15 (optimization round 1) equivalence receipts: every
  * restructured operator is asserted against its original formulation
  * on the engine itself, so "same results" is a replayed fact, not a
  * claim. */
class Round15Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("recursiveIndex driver chain ≡ the Spark WITH RECURSIVE " +
      "formulation (capability receipt + bit-identity)") {
    val rnd = new scala.util.Random(15)
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val rows = (0 until n).map(i => (i, 1.0 + rnd.nextDouble() * 99.0))
      val viaCte = graft.operators.Relational
        .recursiveIndexViaCte(spark, rows).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      // replicate the production driver chain on the same rows
      val sorted = rows.sortBy(_._1)
      val level = new Array[Double](n)
      level(0) = 100.0
      for (i <- 1 until n)
        level(i) = math.floor(level(i - 1) * sorted(i)._2 / sorted(i - 1)._2
          * 1000000 + 0.5 + 0.000001) / 1000000
      val chain = sorted.zipWithIndex.map { case ((rn, rev), i) =>
        (rn.toLong, rev,
          math.floor(level(i) * 10000 + 0.5 + 0.000001) / 10000)
      }
      assert(viaCte === chain,
        s"driver chain diverged from the recursive CTE at n=$n")
    }
  }

  test("recursiveIndex: production output matches the CTE formulation " +
      "on the sf0.001 quarter frame end to end") {
    val got = graft.operators.Relational
      .recursiveIndex(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // rebuild the quarter frame exactly as recursiveIndex does, then
    // push it through the original recursive-CTE path
    val quarterly = Tables.orders(spark, TestSpark.sfDir)
      .groupBy((year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")))
        .as("mi"))
      .agg(graft.functions.Rounding.round4eps(
        sum(col("o_totalprice")) / lit(1e6)).as("rev"))
    val rows = quarterly.select(
        (dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("mi"))) - 1).as("rn"), col("rev"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val expect = graft.operators.Relational
      .recursiveIndexViaCte(spark, rows).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got === expect)
  }
}
